"""1M-atom NPT on the single chip: end-to-end production sanity.

NPT at 1M was never exercised on device (bench config 3 runs NPT at 32k;
the 1M configs run NVE). This drives the full barostat path — per-step
virial tally, iso-MTK cell scaling, NPT-aware staleness (non-affine
displacement + shrink term), grid re-derivation on shrink — at the scale
where every capacity/overflow edge is tightest, and reports throughput,
flags, T and P over a short run.
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
pos, types, cell = make_lattice("fcc", 4.0, (63, 63, 63))  # 1,000,188
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(4),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
# short NVE settle
eq = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=10,
                compute_virial=False, giveback=True)
state, _, ovf = eq.run_async(state, 30, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)

sim = Simulation(model16, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=True, giveback=True)
kw = dict(ensemble="npt", dt=0.001, temperature=300.0, pressure=0.0,
          tdamp=0.1, pdamp=1.0)
state, aux, ovf = sim.run_async(state, 30, **kw)
float(jnp.sum(state.positions)); assert not bool(ovf), "flags tripped in warmup"
for it in range(3):
    t0 = time.perf_counter()
    state, aux, ovf = sim.run_async(state, 90, aux=aux, **kw)
    float(jnp.sum(state.positions))
    dt_wall = time.perf_counter() - t0
    assert not bool(ovf), f"flags tripped in timed window {it}"
    vol = float(jnp.linalg.det(state.cell.astype(jnp.float64)))
    print(f"1M NPT[{it}]: {n * 90 / dt_wall:,.0f} atom-steps/s  T={float(temperature_of(state)):.1f} K  "
          f"V/V0={vol / (4.0 ** 3 * 63 ** 3):.5f}  flags clean", flush=True)
