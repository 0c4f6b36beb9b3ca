"""Does a Morton (Z-order) bin sort cut the window-kernel worklist items?

Both window kernels (disp + giveback) cost ~ items = sum of per-(tile, half)
worklist lengths; the sort order sets how many distinct 128-atom source
chunks a 128-atom destination half touches. Row-major bin order makes the
neighbor shell span ~9 (x,y) row-runs; Morton order should cluster it.

CPU-only statistics (no kernels run).
"""
import time

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape
from mtp_tpu.ops.window_disp import SENTINEL, TN, num_tiles, pad_window_lists, worklists


def part1by2(v):
    v &= 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton(b3):
    return part1by2(b3[:, 0]) | (part1by2(b3[:, 1]) << 1) | (part1by2(b3[:, 2]) << 2)


def stats(positions, cell, cutoff, grid, max_neighbors, key_kind):
    gx, gy, gz = grid
    inv_cell = np.linalg.inv(cell)
    frac = positions @ inv_cell
    frac = frac - np.floor(frac)
    dims = np.asarray(grid)
    bin3 = np.clip((frac * dims).astype(np.int32), 0, dims - 1)
    if key_kind == "rowmajor":
        key = (bin3[:, 0] * gy + bin3[:, 1]) * gz + bin3[:, 2]
    elif key_kind == "morton":
        key = morton(bin3.astype(np.int64)).astype(np.int64)
    elif key_kind == "blocked2":  # one-level 2x2x2 blocking, row-major inside
        blk = (bin3 // 2, bin3 % 2)
        key = (
            ((blk[0][:, 0] * gy + blk[0][:, 1] * 2) * gz + blk[0][:, 2] * 2) * 8
            + blk[1][:, 0] * 4 + blk[1][:, 1] * 2 + blk[1][:, 2]
        )
    order = np.argsort(key, kind="stable").astype(np.int32)
    spos = positions[order]
    n = len(positions)
    nl = build_neighbor_list(
        jnp.asarray(spos), jnp.asarray(cell), cutoff,
        max_neighbors=max_neighbors, grid=grid, with_reverse=False,
    )
    assert not bool(nl.overflow), "overflow"
    n_pad = -(-n // TN) * TN
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    idx_pad = jnp.broadcast_to(rows[:, None], (n_pad, max_neighbors))
    idx_pad = idx_pad.at[:n].set(nl.idx)
    idx_pad = jnp.sort(idx_pad, axis=1)
    window_idx = pad_window_lists(idx_pad, n_pad)
    wl, wl_counts, covered = worklists(window_idx, num_tiles(n_pad))
    wc = np.asarray(wl_counts)
    # band stats as giveback_metadata computes them (distinct superchunks, BC=4)
    wl_np = np.asarray(wl)
    sct = wl_np // 4
    sct = np.where(sct >= SENTINEL // 4, -1, sct)
    nb = []
    for t in range(sct.shape[0]):
        u = np.unique(sct[t])
        nb.append(len(u[u >= 0]))
    print(
        f"  {key_kind:9s}: items/block mean {wc.mean():6.2f} max {wc.max():3d} "
        f"| bands/tile mean {np.mean(nb):5.2f} max {max(nb):3d} "
        f"| covered={bool(covered)} MAXW={wl.shape[-1]}"
    )
    return wc.mean()


rng = np.random.default_rng(0)
for reps, label in [((20, 20, 20), "32k"), ((63, 63, 63), "1M")]:
    pos, types, cell = make_lattice("fcc", 4.0, reps)
    pos = pos + rng.normal(0, 0.1, pos.shape)
    n = len(pos)
    cutoff = 5.5  # cutoff + skin (production: 5.0 + 0.5)
    grid = grid_shape(cell, cutoff)
    print(f"{label}: n={n} grid={grid}")
    t0 = time.time()
    base = stats(pos, np.asarray(cell), cutoff, grid, 64, "rowmajor")
    m = stats(pos, np.asarray(cell), cutoff, grid, 64, "morton")
    b2 = stats(pos, np.asarray(cell), cutoff, grid, 64, "blocked2")
    print(f"  morton/rowmajor items ratio: {m / base:.3f}  blocked2: {b2 / base:.3f}"
          f"  ({time.time() - t0:.0f}s)")
