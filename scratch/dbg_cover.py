import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, build_neighbor_list, grid_shape
from mtp_tpu.ops.window_disp import band_bases, num_tiles, TN

pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state_pos = jnp.asarray(pos, jnp.float32) + jax.random.normal(jax.random.PRNGKey(1), (n,3), jnp.float32)*0.08
cell_j = jnp.asarray(cell, jnp.float32)
grid = grid_shape(cell, 5.5)
swl = build_sorted_neighbor_list(state_pos, cell_j, 5.5, max_neighbors=56, grid=grid)
print("overflow:", bool(swl.overflow))
nl = build_neighbor_list(state_pos[swl.order], cell_j, 5.5, max_neighbors=56, grid=grid)
print("inner nl overflow:", bool(nl.overflow))
bands, covered = band_bases(swl.window_idx, num_tiles(swl.idx.shape[0]))
print("covered:", bool(covered))
vals = np.asarray(swl.window_idx).reshape(-1, TN, 7, 8)
vals = np.moveaxis(vals, 1, 2).reshape(128, 7, TN*8)
span = 1024
bad = 0
worst = None
for t in range(vals.shape[0]):
    for g in range(7):
        v = np.sort(np.unique(vals[t, g]))
        rem = v
        for b in range(6):
            if len(rem) == 0:
                break
            base = (rem[0]//128)*128
            rem = rem[rem >= base + span]
        if len(rem):
            bad += 1
            if worst is None:
                worst = (t, g, v)
print("uncovered (tile,jjg):", bad, "of", vals.shape[0]*7)
if worst:
    t, g, v = worst
    gaps = np.diff(v)
    cl = np.split(v, np.where(gaps > 300)[0] + 1)
    print("tile", t, "g", g, "clusters:", len(cl),
          "widths:", [int(c[-1]-c[0]) for c in cl])
