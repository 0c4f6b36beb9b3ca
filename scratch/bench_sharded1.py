"""Sharded window engine on the REAL chip, 1-device mesh: per-chip
throughput of the distributed code path vs bench.py's single-chip number
(VERDICT r2 item 1's done-criterion)."""
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

SKIN = 0.6
m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
masses = np.full(n, 58.693)
state = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, masses, cell, dtype=jnp.float32), 300.0)

mesh = make_mesh(1)
part = partition_slabs(
    np.asarray(state.positions), np.asarray(state.velocities),
    types, masses, cell, 1, cutoff=model.cutoff + SKIN,
    capacity=int(np.ceil((n * 1.05 + 16) / 256) * 256),
)
sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float32)
grid = grid_shape(cell, model.cutoff + SKIN)
sim = ShardedSimulation(
    model, mesh, capacity=part.capacity, max_neighbors=64,
    skin=SKIN, steps_per_rebuild=30, grid=grid,
)
print("gb_on:", sim.gb_on, "NE:", sim.NE, "n_pad:", sim.n_pad, flush=True)

# equilibrate
eq = ShardedSimulation(
    model, mesh, capacity=part.capacity, max_neighbors=64,
    skin=SKIN, steps_per_rebuild=10, grid=grid,
)
sstate, flags = eq.run_async(sstate, 60, ensemble="nve", dt=0.001)
float(jnp.sum(sstate.positions))
assert not bool(flags.any()), flags

n_steps = 200
sstate, flags = sim.run_async(sstate, n_steps, ensemble="nve", dt=0.001)
float(jnp.sum(sstate.positions))
assert not bool(flags.any()), flags
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    sstate, flags = sim.run_async(sstate, n_steps, ensemble="nve", dt=0.001)
    float(jnp.sum(sstate.positions))
    best = max(best, n * n_steps / (time.perf_counter() - t0))
    assert not bool(flags.any()), flags
print(f"sharded 1-device mesh, 32k NVE: {best:,.0f} atom-steps/s", flush=True)
