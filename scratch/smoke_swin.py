import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.neighbors import grid_shape
from mtp_tpu.parallel.domain import partition_slabs
from mtp_tpu.parallel.sharded_md import ShardedState, make_mesh
from mtp_tpu.parallel.sharded_window import ShardedSimulation

m = make_mtp(8, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float64)
pos, types, cell = make_lattice("fcc", 4.0, (8, 4, 4))
n = len(pos)
masses = np.full(n, 58.693)
state0 = thermalize(
    jax.random.PRNGKey(0), init_state(pos, types, masses, cell, dtype=jnp.float64), 300.0
)
print("n atoms:", n, "cutoff:", model.cutoff)
skin = 0.3
grid = grid_shape(cell, model.cutoff + skin)
print("grid:", grid)

# single-chip reference (XLA path)
sim = Simulation(model, max_neighbors=64, skin=skin, steps_per_rebuild=10,
                 backend="xla", window=False)
s_ref, _ = sim.run(state0, 20, ensemble="nve", dt=0.001)

for nd in (2, 4):
    for gb in (False, True):
        mesh = make_mesh(nd)
        part = partition_slabs(
            pos, np.asarray(state0.velocities), types, masses, cell, nd,
            cutoff=model.cutoff + skin,
            capacity=int(np.ceil((n / nd * 1.4 + 16) / 8) * 8),
        )
        sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float64)
        ssim = ShardedSimulation(
            model, mesh, capacity=part.capacity, max_neighbors=64,
            grid=grid, skin=skin, steps_per_rebuild=10, giveback=gb,
        )
        out, flags = ssim.run(sstate, 20, ensemble="nve", dt=0.001)
        print(f"nd={nd} gb={gb} flags:", {k: bool(v) for k, v in flags._asdict().items()})
        pos_g = out.gather(np.asarray(out.positions), n)
        f_g = out.gather(np.asarray(out.forces), n)
        perr = np.abs(pos_g - np.asarray(s_ref.positions)).max()
        ferr = np.abs(f_g - np.asarray(s_ref.forces)).max()
        eerr = abs(float(out.potential_energy) - float(s_ref.potential_energy))
        print(f"  pos err {perr:.3e}  force err {ferr:.3e}  pe err {eerr:.3e}")
        assert perr < 1e-9 and ferr < 1e-9 and eerr < 1e-8, "PARITY FAIL"

# --- NVT + NPT trajectory parity on 2 shards ---
import mtp_tpu.md.integrators as itg

pos2, types2, cell2 = make_lattice("fcc", 4.0, (8, 5, 5))
n2 = len(pos2)
masses2 = np.full(n2, 58.693)
state2 = thermalize(
    jax.random.PRNGKey(1), init_state(pos2, types2, masses2, cell2, dtype=jnp.float64), 280.0
)
grid2 = grid_shape(cell2, (model.cutoff + skin) * 1.08)
print("npt/nvt grid:", grid2)
sim2 = Simulation(model, max_neighbors=64, skin=skin, steps_per_rebuild=10,
                  backend="xla", window=False, grid_margin=1.08)
for ens, kw in (
    ("nvt", dict(temperature=280.0, tdamp=0.1)),
    ("npt", dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5)),
):
    s_ref, aux_ref = sim2.run(state2, 20, ensemble=ens, dt=0.001, **kw)
    mesh = make_mesh(2)
    part = partition_slabs(
        pos2, np.asarray(state2.velocities), types2, masses2, cell2, 2,
        cutoff=model.cutoff + skin,
        capacity=int(np.ceil((n2 / 2 * 1.4 + 16) / 8) * 8),
    )
    sstate = ShardedState.from_partition(part, cell2, mesh, dtype=jnp.float64)
    ssim = ShardedSimulation(
        model, mesh, capacity=part.capacity, max_neighbors=64,
        grid=grid2, skin=skin, steps_per_rebuild=10, giveback=False,
        compute_virial=True,
    )
    out, flags = ssim.run(sstate, 20, ensemble=ens, dt=0.001, **kw)
    assert not bool(flags.any()), flags
    pos_g = out.gather(np.asarray(out.positions), n2)
    perr = np.abs(pos_g - np.asarray(s_ref.positions)).max()
    cerr = np.abs(np.asarray(out.cell) - np.asarray(s_ref.cell)).max()
    eerr = abs(float(out.potential_energy) - float(s_ref.potential_energy))
    # thermostat chain parity
    th = np.asarray(out.thermo)
    if ens == "nvt":
        aux_err = np.abs(np.concatenate([aux_ref.xi, aux_ref.eta]) - th[:4]).max()
    else:
        ref_vec = np.concatenate([
            np.asarray(aux_ref.thermo.xi), np.asarray(aux_ref.thermo.eta),
            np.asarray(aux_ref.baro_thermo.xi), np.asarray(aux_ref.baro_thermo.eta),
            np.asarray(aux_ref.baro_v)[None],
        ])
        aux_err = np.abs(ref_vec - th).max()
    print(f"{ens}: pos err {perr:.3e} cell err {cerr:.3e} pe err {eerr:.3e} aux err {aux_err:.3e}")
    assert perr < 1e-9 and cerr < 1e-11 and aux_err < 1e-10, "ENSEMBLE PARITY FAIL"
print("OK")
