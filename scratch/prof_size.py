"""rebuild/steps split at 160k and 1M (window path, giveback auto)."""
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
from mtp_tpu.ops.neighbors import grid_shape

reps = {"32k": (20, 20, 20), "160k": (20, 20, 100), "1m": (63, 63, 63)}[sys.argv[1]]
J = 64 if sys.argv[1] != "32k" else 56

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, reps)
n = len(pos)
print(f"N = {n}")
state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)
grid = grid_shape(cell, model.cutoff + 0.6)

sim = Simulation(model, max_neighbors=J, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, window=True)
eq = Simulation(model, max_neighbors=J, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, window=True)
state, _, fl = eq.run_async(state, 60, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(fl)

nl = sim.rebuild(state, grid=grid, max_neighbors=J)
state = sim.refresh_forces(state, nl)
st, _, _ = sim.steps(state, 0, nl, n_steps=30)
float(jnp.sum(st.positions))

R = 6
t0 = time.perf_counter()
for _ in range(R):
    nl = sim.rebuild(state, grid=grid, max_neighbors=J)
jax.block_until_ready(nl.idx)
t_reb = (time.perf_counter() - t0) / R
cur = state
t0 = time.perf_counter()
for _ in range(R):
    cur, _, _ = sim.steps(cur, 0, nl, n_steps=30)
float(jnp.sum(cur.positions))
t_steps = (time.perf_counter() - t0) / R
tot = n * 30 / (t_reb + t_steps)
print(f"{sys.argv[1]}: rebuild {t_reb*1e3:.1f} ms ({t_reb/30*1e3:.2f} ms/step), "
      f"steps(30) {t_steps*1e3:.1f} ms ({t_steps/30*1e3:.2f} ms/step) -> {tot:,.0f} atom-steps/s")
