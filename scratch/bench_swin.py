"""TPU bench: sharded window path on a 1-device mesh at the headline config
(32k atoms, level-16, fp32, NVE). Done-criterion: within ~10% of bench.py's
single-chip number (the sharded engine must not tax the kernel pipeline)."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.neighbors import grid_shape
from mtp_tpu.parallel.domain import partition_slabs
from mtp_tpu.parallel.sharded_md import ShardedState, make_mesh
from mtp_tpu.parallel.sharded_window import ShardedSimulation

print("backend:", jax.default_backend())

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
masses = np.full(n, 58.693)
state = thermalize(jax.random.PRNGKey(0), init_state(pos, types, masses, cell, dtype=jnp.float32), 300.0)

skin = 0.6
grid = grid_shape(cell, model.cutoff + skin)
mesh = make_mesh(1)
part = partition_slabs(
    pos, np.asarray(state.velocities), types, masses, cell, 1,
    cutoff=model.cutoff + skin, capacity=n,
)
sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float32)

sim = ShardedSimulation(
    model, mesh, capacity=n, max_neighbors=56, grid=grid, skin=skin,
    steps_per_rebuild=30, giveback=False, compute_virial=False,
)
eq = ShardedSimulation(
    model, mesh, capacity=n, max_neighbors=56, grid=grid, skin=skin,
    steps_per_rebuild=10, giveback=False, compute_virial=False,
)

t0 = time.perf_counter()
sstate, fl = eq.run_async(sstate, 60, ensemble="nve", dt=0.001)
float(jnp.sum(sstate.positions))
print("equilibrate+compile:", time.perf_counter() - t0, "flags:", bool(fl.any()))

n_steps = 200
best = None
for it in range(4):
    t0 = time.perf_counter()
    # run_async: the timed loop must not pay run()'s per-block flag sync
    sstate, fl = sim.run_async(sstate, n_steps, ensemble="nve", dt=0.001, refresh=(it == 0))
    float(jnp.sum(sstate.positions))
    dt_s = time.perf_counter() - t0
    assert not bool(fl.any()), fl
    rate = n * n_steps / dt_s
    best = rate if best is None else max(best, rate)
    print(f"iter {it}: {rate:,.0f} atom-steps/s ({dt_s:.3f}s)")
print(f"BEST: {best:,.0f} atom-steps/s")
