"""32k rebuild decomposition (scan-amortized: stages are ~1-10 ms,
well under the ~30 ms tunnel dispatch floor, so each prefix runs K=20
iterations inside one lax.scan with the anti-hoist input perturbation).

Adapted from the 1M profiler below.

Cumulative-prefix protocol (like scratch/prof_cellbuild_fat.py): stage k's
cost = t(prefix through k) - t(prefix through k-1). Each prefix is one jit'd
function; best-of-3 one-shot timings (stages are 100s of ms >> the ~30 ms
dispatch floor).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/prof_rebuild_r5.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.ops import neighbors as nb
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape
from mtp_tpu.ops.window_disp import TN, num_tiles, pad_window_lists, worklists

CUTOFF = 5.5  # cutoff + skin at the bench config

pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(4),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
    300.0,
)
positions = state.positions
cell = state.cell
grid = grid_shape(np.asarray(cell), CUTOFF)
print(f"n={n} grid={grid}")
J = 64


def _prefix(stage):
    @jax.jit
    def f(positions, cell):
        inv_cell = jnp.linalg.inv(cell)
        frac = nb._frac_unrolled(positions, inv_cell)
        frac = frac - jnp.floor(frac)
        gx, gy, gz = grid
        dims = jnp.asarray(grid)
        bin3 = jnp.clip((frac * dims).astype(jnp.int32), 0, dims - 1)
        bin_id = (bin3[:, 0] * gy + bin3[:, 1]) * gz + bin3[:, 2]
        order = jnp.argsort(bin_id).astype(jnp.int32)
        spos = positions[order]
        if stage == 0:
            return spos
        nl = build_neighbor_list(
            spos, cell, CUTOFF, max_neighbors=J, grid=grid, with_reverse=False
        )
        if stage == 1:
            return nl.idx
        n_pad = -(-n // TN) * TN
        rows = jnp.arange(n_pad, dtype=jnp.int32)
        idx_pad = jnp.broadcast_to(rows[:, None], (n_pad, J))
        idx_pad = idx_pad.at[:n].set(nl.idx)
        idx_pad = jnp.sort(idx_pad, axis=1)
        if stage == 2:
            return idx_pad
        window_idx = pad_window_lists(idx_pad, n_pad)
        wl, wl_counts, covered = worklists(window_idx, num_tiles(n_pad))
        if stage == 3:
            return wl, wl_counts, window_idx
        from mtp_tpu.ops.slot_assign import (
            assign_slots_apply,
            octant_classes_T,
            reverse_slots,
        )
        from mtp_tpu.ops.window_disp import window_disp

        pos_pad = jnp.zeros((n_pad, 3), spos.dtype).at[:n].set(spos)
        dispT = window_disp(pos_pad, window_idx, wl, wl_counts, cell)
        cls = octant_classes_T(dispT, idx_pad)
        if stage == 4:
            return cls
        idx_pad, window_idx, aligned = assign_slots_apply(
            idx_pad, window_idx, cls
        )
        if stage == 5:
            return idx_pad
        mirror, rev = reverse_slots(idx_pad)
        if stage == 6:
            return rev
        from mtp_tpu.ops.slot_repair import repair_spills

        idx_pad, window_idx, rev, mirror = repair_spills(
            idx_pad, window_idx, rev, n
        )
        if stage == 7:
            return rev
        from mtp_tpu.ops.window_giveback import giveback_metadata

        gb = giveback_metadata(
            idx_pad, window_idx, rev, num_tiles(n_pad), wl,
            k_spill=n_pad // 8,
        )
        return gb

    return f


NAMES = [
    "bin+argsort+perm",
    "+cell build",
    "+pad/sort idx",
    "+worklists",
    "+disp kernel+octant cls",
    "+assign_slots_apply",
    "+reverse_slots",
    "+repair_spills",
    "+giveback_metadata",
]

K = 20
prev = 0.0
for k, name in enumerate(NAMES):
    f = _prefix(k)

    @jax.jit
    def rep(positions, cell):
        def one(c, i):
            out = f(positions + i * jnp.float32(1e-30), cell)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c, jnp.sum(leaf[:4].astype(jnp.float32))
        _, ys = jax.lax.scan(one, 0, jnp.arange(K, dtype=jnp.float32))
        return ys.sum()

    float(rep(positions, cell))  # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(rep(positions, cell))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:28s} cum {best*1e3:8.2f} ms   stage {(best-prev)*1e3:8.2f} ms", flush=True)
    prev = best
