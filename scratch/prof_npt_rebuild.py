"""Why was 1M NPT run_async 5x slower than its steps+rebuild sum?

Times rebuild and steps dispatches separately on the COMPRESSED state an
NPT quench produces (V/V0 ~ 0.95), vs the fresh state.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice, _default_aux
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.neighbors import grid_shape

model16 = MTPModel.from_data(make_mtp(16, species_count=1, seed=0),
                             dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (63, 63, 63))
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(4),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
eq = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, giveback=True)
state, _, ovf = eq.run_async(state, 30, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)

sim = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=True, giveback=True)
grid = grid_shape(np.asarray(jax.device_get(state.cell)), model16.cutoff + 0.6)


def time_rebuild(tag, st):
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        nl = sim.rebuild(st, grid=grid, max_neighbors=64)
        jax.block_until_ready(nl.idx); float(jnp.sum(nl.idx[:8]))
        best = min(best, time.perf_counter() - t0)
    print(f"rebuild @ {tag}: {best * 1e3:.0f} ms (overflow={bool(nl.overflow)})",
          flush=True)
    return nl


nl0 = time_rebuild("fresh state", state)

# quench for 60 NPT steps
aux = _default_aux("npt", state)
st = sim.refresh_forces(state, nl0, ensemble="npt")
kw = dict(ensemble="npt", dt=0.001, temperature=300.0, tdamp=0.1,
          pressure=0.0, pdamp=1.0)
for b in range(2):
    nl = sim.rebuild(st, grid=grid, max_neighbors=64)
    st, aux, stale = sim.steps(st, aux, nl, n_steps=30, **kw)
t0 = time.perf_counter()
float(jnp.sum(st.positions))
print(f"(sync of 2 quench blocks: {time.perf_counter() - t0:.1f} s)", flush=True)
vol = float(jnp.linalg.det(st.cell.astype(jnp.float64)))
print(f"V/V0 after 60 NPT steps: {vol / (4.0 ** 3 * 63 ** 3):.4f}", flush=True)

nl1 = time_rebuild("compressed state", st)

# steps dispatch on the compressed state
best = 1e30
for _ in range(2):
    t0 = time.perf_counter()
    st2, aux2, stale = sim.steps(st, aux, nl1, n_steps=30, **kw)
    float(jnp.sum(st2.positions))
    best = min(best, (time.perf_counter() - t0) / 30)
print(f"steps @ compressed: {best * 1e3:.1f} ms/step (stale={bool(stale)})",
      flush=True)
