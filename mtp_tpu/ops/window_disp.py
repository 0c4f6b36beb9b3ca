"""In-kernel windowed displacement gather (TPU).

Replaces the XLA per-pair position gather (the single most expensive op of
the force evaluation: ~4.5 ms/step at 32k x 56 on v5e, pure gather-row-count
cost) with a Pallas kernel that exploits spatial sorting:

* Atoms are sorted by cell-list bin (x-major). The neighbors of any
  (256-atom tile, 128-lane half) then touch only a handful of 128-atom
  chunks of the sorted order (measured: ~17 distinct chunks, max 23 at
  32k/160k/1M) because sorted tiles have spatially local neighborhoods.
* At rebuild time :func:`worklists` enumerates those chunks exactly — a
  per-(tile, half) ascending list, SENTINEL-padded, with a count for the
  kernel's dynamic fori bound. No geometric assumption about the bin grid
  (anisotropic boxes spread each stencil x-layer over several disjoint
  index runs); capacity overflow is flagged, never assumed away.
* The kernel holds the whole component-major position table in VMEM
  (3*N_pad*4 B: 384 kB at 32k, 12 MB at 1M) and resolves each item with a
  single broadcast + per-sublane lane gather over the full (J, 128) block
  (`jnp.take_along_axis(axis=1)`, a native VPU shuffle), select-merged by
  range masks. Item granularity matters: per-(tile, group, half) items
  measured ~6x more fori iterations at ~100 cycles scalar latency each
  for the same vector work.

The reference has no analog — LAMMPS hands the pair style a finished
neighbor list and pays the gather as cache misses (pair_mtp_kokkos.cpp:
287-361); on TPU the same random access must be engineered around.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 256  # atoms per tile (must match the megakernel tile for shared padding)
GROUP = 8  # slot-group width (alignment unit shared with the giveback path)
MAXW = 40  # worklist capacity: distinct 128-chunks per (tile, half)
SENTINEL = 2**24  # marks an unused worklist slot


def num_tiles(n_pad: int) -> int:
    return n_pad // TN


def worklists(idx_pad, n_tiles: int, maxw: int = MAXW, row_cap: int = 24):
    """Active source chunks per (tile, 128-lane half).

    Args:
      idx_pad: (N_pad, J) int32 sorted-space neighbor indices; padding
        entries must already point inside their tile (see
        :func:`pad_window_lists`).
      n_tiles: N_pad // TN.
      maxw: static worklist capacity.
      row_cap: per-row distinct-chunk capacity for the two-level dedup
        (measured ~8-12 at 32k-1M; overflow folds into `covered`).

    Returns (wl, counts, covered):
      wl: (n_tiles, 2, maxw) int32 sorted ascending chunk ids,
        SENTINEL-padded.
      counts: (n_tiles, 2) int32 number of real items per block (the
        kernel's dynamic loop bound — sentinel slots are never visited).
      covered: () bool — False if any block has more than `maxw` distinct
        chunks, or any row more than `row_cap` (treat like neighbor
        overflow).

    Two-level dedup: rows dedup first (J-wide sort, ~9 ms at 1M), then the
    block pass sorts (128*row_cap)-wide slices instead of (128*J) — the
    single-level form was 553 ms at 1M x 64 on v5e.
    """
    n_pad, j = idx_pad.shape
    rc = min(row_cap, j)
    chunks = (idx_pad // 128).astype(jnp.int32)
    cs = jnp.sort(chunks, axis=1)
    rfirst = jnp.concatenate(
        [jnp.ones((n_pad, 1), bool), cs[:, 1:] != cs[:, :-1]], axis=1
    )
    row_distinct = jnp.sum(rfirst, axis=1)
    rows_c = jnp.sort(jnp.where(rfirst, cs, SENTINEL), axis=1)[:, :rc]
    row_ok = jnp.max(row_distinct) <= rc

    blocks = rows_c.reshape(n_tiles, 2, 128, rc)
    blocks = jnp.moveaxis(blocks, 3, 2).reshape(n_tiles, 2, rc * 128)
    xs = jnp.sort(blocks, axis=-1)
    first = (
        jnp.concatenate(
            [
                jnp.ones(xs.shape[:-1] + (1,), bool),
                xs[..., 1:] != xs[..., :-1],
            ],
            axis=-1,
        )
        & (xs < SENTINEL)
    )
    keys = jnp.where(first, xs, SENTINEL)
    wl = jnp.sort(keys, axis=-1)[..., :maxw]
    counts = jnp.sum(first, axis=-1).astype(jnp.int32)
    return (
        wl,
        jnp.minimum(counts, maxw),
        (jnp.max(counts) <= maxw) & row_ok,
    )


def pad_window_lists(idx, n_pad: int):
    """Pad a sorted-space (N, J) list to (N_pad, J) and retarget every
    padding/self entry at its tile's first atom, so padding never adds
    chunks to a worklist outside the tile. The retargeted entries are
    masked by `pair_valid` downstream exactly like self-pairs."""
    n, j = idx.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    idx_p = jnp.full((n_pad, j), 0, jnp.int32)
    idx_p = idx_p.at[:n].set(idx)
    self_or_pad = (idx_p == rows[:, None]) | (rows[:, None] >= n)
    tile_first = (rows // TN) * TN
    return jnp.where(self_or_pad, jnp.minimum(tile_first, n - 1)[:, None], idx_p)


def _disp_kernel(cell_ref, wl_ref, cnt_ref, ext_ref, own_ref, idx_ref, o_ref, acc_ref, *, j):
    """One tile: per half, gather neighbor positions chunk by worklist
    chunk over the full (J, 128) block, subtract own, minimum-image, write
    dispT (3, J, TN)."""
    dtype = o_ref.dtype

    # cell rows / inverse-cell rows as SMEM scalars (row-vector convention)
    c = [[cell_ref[3 * r + k] for k in range(3)] for r in range(3)]
    ic = [[cell_ref[9 + 3 * r + k] for k in range(3)] for r in range(3)]

    for h in range(TN // 128):
        il = idx_ref[:, h * 128 : (h + 1) * 128]  # (J, 128)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(w, _, h=h, il=il):
            ck = wl_ref[0, h, w]
            lane = il - ck * 128
            m = (lane >= 0) & (lane < 128)
            lane_c = jnp.where(m, lane, 0)
            for cc in range(3):
                src = ext_ref[cc, pl.ds(ck, 1), :]  # (1, 128)
                gat = jnp.take_along_axis(
                    jnp.broadcast_to(src, (j, 128)), lane_c, axis=1
                )
                sl = slice(cc * j, (cc + 1) * j)
                acc_ref[sl, :] = jnp.where(m, gat, acc_ref[sl, :])
            return 0

        jax.lax.fori_loop(0, cnt_ref[0, 0, h], body, 0)

        own = [
            own_ref[cc, pl.ds(h * 128, 128)][None, :] for cc in range(3)
        ]  # (1, 128) each
        d = [acc_ref[cc * j : (cc + 1) * j, :] - own[cc] for cc in range(3)]
        # minimum image, unrolled (see models/mtp.py minimum_image)
        f = [
            d[0] * ic[0][a] + d[1] * ic[1][a] + d[2] * ic[2][a]
            for a in range(3)
        ]
        f = [fa - jnp.round(fa) for fa in f]
        for cc in range(3):
            out = f[0] * c[0][cc] + f[1] * c[1][cc] + f[2] * c[2][cc]
            o_ref[cc, :, pl.ds(h * 128, 128)] = out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def window_disp(positions_sorted, idx_pad, wl, wl_counts, cell):
    """dispT (3, J, N_pad) = minimum-imaged x[idx] - x[own], via the
    worklist window kernel. positions_sorted: (N_pad, 3) bin-sorted
    (padding rows zero); idx_pad: (N_pad, J) from :func:`pad_window_lists`;
    wl, wl_counts from :func:`worklists`."""
    n_pad, _ = positions_sorted.shape
    j = idx_pad.shape[1]
    dtype = positions_sorted.dtype
    n_tiles = n_pad // TN
    maxw = wl.shape[-1]

    # component-major table, rows of 128 lanes (N_pad is a multiple of 256)
    rows = n_pad // 128
    ext = positions_sorted.T.reshape(3, rows, 128)

    own = positions_sorted.T  # (3, N_pad)
    own = jnp.pad(own, ((0, 5), (0, 0)))  # (8, N_pad) sublane-aligned

    inv_cell = jnp.linalg.inv(cell)
    cell18 = jnp.concatenate(
        [cell.astype(dtype).reshape(-1), inv_cell.astype(dtype).reshape(-1)]
    )

    idxT = idx_pad.T.astype(jnp.int32)  # (J, N_pad)

    out = pl.pallas_call(
        functools.partial(_disp_kernel, j=j),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, maxw),
                    lambda i, c: (i, 0, 0),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 2),
                    lambda i, c: (i, 0, 0),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec((3, rows, 128), lambda i, c: (0, 0, 0)),
                pl.BlockSpec((8, TN), lambda i, c: (0, i)),
                pl.BlockSpec((j, TN), lambda i, c: (0, i)),
            ],
            out_specs=pl.BlockSpec((3, j, TN), lambda i, c: (0, 0, i)),
            scratch_shapes=[pltpu.VMEM((3 * j, 128), dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, j, n_pad), dtype),
        interpret=_interpret(),
    )(cell18, wl, wl_counts.reshape(n_tiles, 1, 2), ext, own, idxT)
    return out
