"""Decompose the 1M NPT step cost: NVE vs +virial vs full NPT.

probe_1m_npt measured 802k atom-steps/s for NPT at 1M vs 3.81M NVE — a
4.75x ratio where 32k shows ~2x (at J=96!). Isolate: (a) NVE no-virial,
(b) NVE with per-step virial tally, (c) NPT iso. All in one process, same
state, steps() scans timed over one rebuild block (spb=30), best-of-2.
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

from mtp_tpu.md.simulation import _default_aux


def timed(tag, cv, ensemble):
    sim = Simulation(model16, max_neighbors=64, skin=0.6,
                     steps_per_rebuild=30, compute_virial=cv, giveback=True)
    grid = grid_shape(np.asarray(jax.device_get(state.cell)),
                      model16.cutoff + 0.6)
    nl = sim.rebuild(state, grid=grid, max_neighbors=64)
    st = sim.refresh_forces(state, nl, ensemble=ensemble)
    aux = _default_aux(ensemble, st)
    kw = dict(ensemble=ensemble, dt=0.001, temperature=300.0, tdamp=0.1)
    if ensemble == "npt":
        kw.update(pressure=0.0, pdamp=1.0)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        st2, aux2, stale = sim.steps(st, aux, nl, n_steps=30, **kw)
        float(jnp.sum(st2.positions))
        best = min(best, (time.perf_counter() - t0) / 30)
    print(f"{tag}: {best * 1e3:.1f} ms/step  ({n / best / 1e6:.2f}M atom-steps/s, steps-scan only)")


timed("NVE  cv=False", False, "nve")
timed("NVE  cv=True ", True, "nve")
timed("NVT  cv=False", False, "nvt")
timed("NPT  cv=True ", True, "npt")
