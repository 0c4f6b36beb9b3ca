"""Standalone 1M-atom bench (bench_suite config 6), best-of-2, to measure
the spill-repair win without re-running the whole suite."""
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

model16 = MTPModel.from_data(make_mtp(16, species_count=1, seed=0),
                             dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (63, 63, 63))  # 1,000,188
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(4),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
eq = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, giveback=True)
state, _, ovf = eq.run_async(state, 60, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)
sim = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, giveback=True)
state, _, ovf = sim.run_async(state, 30, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    state, _, ovf = sim.run_async(state, 90, ensemble="nve", dt=0.001)
    float(jnp.sum(state.positions))
    v = n * 90 / (time.perf_counter() - t0)
    print(f"1M NVE: {v:,.0f} atom-steps/s (overflow={bool(ovf)})")
    assert not bool(ovf)
    best = max(best, v)
print(f"BEST: {best:,.0f}")
