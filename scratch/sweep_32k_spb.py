"""32k headline spb sweep (round 4): with the exact top-2 staleness bound,
how far can steps_per_rebuild stretch at skin=0.6 before the flag trips?
In a solid the max displacement SATURATES (bounded thermal oscillation),
so rebuild amortization is nearly free margin — if the flag holds.

Protocol identical to bench.py: steady-state window = 7*spb steps,
best-of-2, flags checked every window.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/sweep_32k_spb.py
"""
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

model = MTPModel.from_data(make_mtp(16, species_count=1, seed=0), dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
eq = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, giveback=True)
state, _, fl = eq.run_async(state, 60, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions))
print("eq flags:", bool(fl), flush=True)

for spb in (30, 40, 50, 60):
    sim = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=spb,
                     compute_virial=False, giveback=True)
    n_steps = 7 * spb
    s, _, fl = sim.run_async(state, n_steps, ensemble="nve", dt=0.001)
    float(jnp.sum(s.positions))
    print(f"spb={spb} warm ovf={bool(fl.overflow)} stale={bool(fl.stale)}",
          flush=True)
    best, stale_trips = 0.0, 0
    for rep in range(3):
        t0 = time.perf_counter()
        s, _, fl = sim.run_async(s, n_steps, ensemble="nve", dt=0.001)
        float(jnp.sum(s.positions))
        dt_s = time.perf_counter() - t0
        ovf, stale = bool(fl.overflow), bool(fl.stale)
        stale_trips += stale
        if not (ovf or stale):
            best = max(best, n * n_steps / dt_s)
        print(f"  spb={spb} rep={rep} {n*n_steps/dt_s/1e6:.3f}M ovf={ovf} "
              f"stale={stale}", flush=True)
    print(f"spb={spb}: best {best/1e6:.3f}M atom-steps/s, stale {stale_trips}/3",
          flush=True)
