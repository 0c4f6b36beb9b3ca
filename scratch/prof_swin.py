"""Split timing: sharded-window rebuild/steps dispatches vs single-chip."""
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
from mtp_tpu.parallel.domain import partition_slabs
from mtp_tpu.parallel.sharded_md import ShardedState, make_mesh
from mtp_tpu.parallel.sharded_window import ShardedSimulation

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
masses = np.full(n, 58.693)
state = thermalize(jax.random.PRNGKey(0), init_state(pos, types, masses, cell, dtype=jnp.float32), 300.0)
skin = 0.6
grid = grid_shape(cell, model.cutoff + skin)

# ---- single chip ----
sim1 = Simulation(model, max_neighbors=56, skin=skin, steps_per_rebuild=30,
                  compute_virial=False, giveback=False)
state, _, fl = sim1.run_async(state, 60, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(fl)

nl1 = sim1.rebuild(state, grid=grid, max_neighbors=56)
st1 = sim1.refresh_forces(state, nl1)
aux = 0
# warm
st_w, _, _ = sim1.steps(st1, aux, nl1, n_steps=30)
float(jnp.sum(st_w.positions))

R = 10
t0 = time.perf_counter()
for _ in range(R):
    nl1 = sim1.rebuild(state, grid=grid, max_neighbors=56)
jax.block_until_ready(nl1.idx); float(jnp.sum(nl1.reference_positions))
t_reb1 = (time.perf_counter() - t0) / R
t0 = time.perf_counter()
cur = st1
for _ in range(R):
    cur, _, _ = sim1.steps(cur, aux, nl1, n_steps=30)
float(jnp.sum(cur.positions))
t_steps1 = (time.perf_counter() - t0) / R
print(f"single-chip: rebuild {t_reb1*1e3:.1f} ms, steps(30) {t_steps1*1e3:.1f} ms "
      f"-> {n*30/(t_reb1+t_steps1):,.0f} atom-steps/s")

# ---- sharded, 1-device mesh ----
mesh = make_mesh(1)
part = partition_slabs(pos, np.asarray(state.velocities), types, masses, cell, 1,
                       cutoff=model.cutoff + skin, capacity=n)
sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float32)
ssim = ShardedSimulation(model, mesh, capacity=n, max_neighbors=56, grid=grid,
                         skin=skin, steps_per_rebuild=30, giveback=False,
                         compute_virial=False)
# warm both dispatches
sstate2, ctx, f4 = ssim.rebuild(sstate)
sstate3, stale = ssim.steps(sstate2, ctx, 30, refresh=True)
sstate3, stale = ssim.steps(sstate2, ctx, 30, refresh=False)
float(jnp.sum(sstate3.positions))

t0 = time.perf_counter()
for _ in range(R):
    sstate2, ctx, f4 = ssim.rebuild(sstate)
jax.block_until_ready(ctx["idx"]); float(jnp.sum(sstate2.positions))
t_reb2 = (time.perf_counter() - t0) / R
t0 = time.perf_counter()
cur = sstate2
for _ in range(R):
    cur, stale = ssim.steps(cur, ctx, 30, refresh=False)
float(jnp.sum(cur.positions))
t_steps2 = (time.perf_counter() - t0) / R
print(f"sharded(1):  rebuild {t_reb2*1e3:.1f} ms, steps(30) {t_steps2*1e3:.1f} ms "
      f"-> {n*30/(t_reb2+t_steps2):,.0f} atom-steps/s")
