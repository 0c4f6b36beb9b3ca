import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape
from mtp_tpu.ops.window_disp import band_bases, num_tiles, pad_window_lists, TN
from mtp_tpu.ops import neighbors as nb

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
masses = np.full(n, 58.693)
state = init_state(pos, types, masses, cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)

grid = grid_shape(cell, model.cutoff + 0.5)
print("grid", grid, "backend", jax.default_backend())

swl = nb.build_sorted_neighbor_list(
    state.positions, state.cell, model.cutoff + 0.5, max_neighbors=56, grid=grid
)
print("swl.overflow:", bool(swl.overflow))
nl = build_neighbor_list(
    state.positions[swl.order], state.cell, model.cutoff + 0.5,
    max_neighbors=56, grid=grid,
)
print("inner overflow:", bool(nl.overflow))
bands, covered = band_bases(swl.window_idx, num_tiles(swl.idx.shape[0]))
print("covered:", bool(covered))

# run one block of 30 steps and check flags again
sim = Simulation(model, max_neighbors=56, skin=0.5, steps_per_rebuild=30,
                 compute_virial=False)
st, aux, stale = sim.steps(state, 0, swl, n_steps=30)
print("stale after 30:", bool(stale))
swl2 = nb.build_sorted_neighbor_list(
    st.positions, st.cell, model.cutoff + 0.5, max_neighbors=56, grid=grid
)
print("rebuild-2 overflow:", bool(swl2.overflow))
