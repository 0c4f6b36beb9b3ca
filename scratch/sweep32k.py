"""32k headline config sweep: giveback x J, through the production
run_async driver (identical to bench.py protocol)."""
import itertools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
masses = np.full(n, 58.693)
state0 = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, masses, cell, dtype=jnp.float32),
    300.0,
)

n_steps = 200
cases = [(gb, j) for gb in (False, True) for j in (56, 64)]
if len(sys.argv) > 1:
    k = int(sys.argv[1])
    cases = cases[k : k + 1]

for gb, j in cases:
    sim = Simulation(
        model, max_neighbors=j, skin=0.6, steps_per_rebuild=30,
        compute_virial=False, giveback=gb,
    )
    eq = Simulation(
        model, max_neighbors=j, skin=0.6, steps_per_rebuild=10,
        compute_virial=False, giveback=gb,
    )
    state, _, fl = eq.run_async(state0, 60, ensemble="nve", dt=0.001)
    float(jnp.sum(state.positions))
    assert not bool(fl), f"eq flags {gb} {j}"
    state, _, fl = sim.run_async(state, n_steps, ensemble="nve", dt=0.001)
    float(jnp.sum(state.positions))
    assert not bool(fl)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, _, fl = sim.run_async(state, n_steps, ensemble="nve", dt=0.001)
        float(jnp.sum(state.positions))
        dt_s = time.perf_counter() - t0
        best = max(best, n * n_steps / dt_s)
        assert not bool(fl)
    print(f"giveback={gb} J={j}: {best:,.0f} atom-steps/s", flush=True)
