"""Production-path 1M NPT quench through Simulation.run() with recovery.

run_async flags capacity exhaustion during an aggressive quench (the
minted potential starts ~-90 kbar, ~2.5%/100-step compression at 1M);
run() is the production driver: per-block bin-grid re-derivation, J growth
on overflow, spb halving on staleness. This exercises that loop at the
scale where it matters and prints the recovery events.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize, temperature_of
from mtp_tpu.models.mtp import MTPModel

model16 = MTPModel.from_data(make_mtp(16, species_count=1, seed=0),
                             dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (63, 63, 63))
n = len(pos)
v0 = float(np.linalg.det(np.asarray(cell, np.float64)))
state = thermalize(
    jax.random.PRNGKey(4),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
sim = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=True, giveback=True)

t_start = time.time()
events = []


def obs(s):
    vol = float(jnp.linalg.det(s.cell.astype(jnp.float64)))
    print(f"  step {int(s.step):4d}: T={float(temperature_of(s)):6.1f} K  "
          f"V/V0={vol / v0:.4f}  J={sim.max_neighbors} spb={sim.steps_per_rebuild}",
          flush=True)


state, aux = sim.run(state, 240, ensemble="npt", dt=0.001, temperature=300.0,
                     pressure=0.0, tdamp=0.1, pdamp=1.0, observer=obs)
vol = float(jnp.linalg.det(state.cell.astype(jnp.float64)))
print(f"1M NPT quench via run(): 240 steps in {time.time() - t_start:.0f} s wall "
      f"(incl. recompiles), final V/V0={vol / v0:.4f}, "
      f"T={float(temperature_of(state)):.1f} K, final J={sim.max_neighbors}, "
      f"spb={sim.steps_per_rebuild} — recovery loop survived the quench")
