"""32k rebuild cost today (post compaction/spill-repair), and its share of
the headline budget at spb=30."""
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

model16 = MTPModel.from_data(make_mtp(16, species_count=1, seed=0),
                             dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
sim = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, giveback=True)
state, _, ovf = sim.run_async(state, 60, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)
grid = grid_shape(np.asarray(jax.device_get(state.cell)), model16.cutoff + 0.6)

best = 1e30
for _ in range(6):
    t0 = time.perf_counter()
    nl = sim.rebuild(state, grid=grid, max_neighbors=64)
    jax.block_until_ready(nl.idx); float(jnp.sum(nl.idx[:8]))
    best = min(best, time.perf_counter() - t0)
print(f"32k rebuild: {best * 1e3:.1f} ms  -> {best / 30 * 1e3:.2f} ms/step amortized at spb=30")

from mtp_tpu.md.simulation import _default_aux
aux = _default_aux("nve", state)
st = sim.refresh_forces(state, nl)
best_s = 1e30
for _ in range(3):
    t0 = time.perf_counter()
    st2, aux2, stale = sim.steps(st, aux, nl, n_steps=30, dt=0.001, ensemble="nve")
    float(jnp.sum(st2.positions))
    best_s = min(best_s, (time.perf_counter() - t0) / 30)
print(f"32k steps-scan: {best_s * 1e3:.2f} ms/step; total {best_s * 1e3 + best / 30 * 1e3:.2f} "
      f"-> {n / (best_s + best / 30) / 1e6:.2f}M atom-steps/s implied")
