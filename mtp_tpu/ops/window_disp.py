"""In-kernel windowed displacement gather (TPU).

Replaces the XLA per-pair position gather (the single most expensive op of
the force evaluation: ~4.5 ms/step at 32k x 56 on v5e, pure gather-row-count
cost) with a Pallas kernel that exploits spatial sorting:

* Atoms are sorted by cell-list bin (x-major). A tile of TN consecutive
  sorted atoms then has all its neighbors inside THREE narrow index bands
  (the three x-layers of the stencil), each spanning only a few hundred
  atoms (measured: ~9.6 active 128-lane chunks per (tile, slot-group) vs
  77 for a naive tile-wide window).
* At rebuild time, :func:`band_bases` finds, per (tile, 8-slot group), three
  128-aligned band bases guaranteed to cover every neighbor index (coverage
  is flagged, never assumed).
* The kernel holds the whole component-major position table in VMEM
  (32 kB/8k atoms) and resolves each pair by a per-sublane lane gather
  (`jnp.take_along_axis(axis=1)`, a native VPU shuffle) within the 8 chunks
  of each band, select-merged by range masks.

The reference has no analog — LAMMPS hands the pair style a finished
neighbor list and pays the gather as cache misses (pair_mtp_kokkos.cpp:
287-361); on TPU the same random access must be engineered around.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 256  # atoms per tile (must match the megakernel tile for shared padding)
# 6 bands: 3 stencil x-layers, each possibly split in two by the periodic
# y-wrap (boundary pencils neighbor both ends of the adjacent layers). Most
# (tile, group)s use ~3; empty bands carry SENTINEL and are skipped in-kernel.
NBANDS = 6
BAND_CHUNKS = 8  # 128-lane chunks per band -> band covers 1024 atoms
GROUP = 8  # neighbor slots per band group
SENTINEL = 2**24  # marks an unused band (guaranteed past any atom index)


def num_tiles(n_pad: int) -> int:
    return n_pad // TN


def band_bases(idx_pad, n_tiles: int):
    """Per-(tile, slot-group) band bases covering all neighbor indices.

    Args:
      idx_pad: (N_pad, J) int32 sorted-space neighbor indices, J a multiple
        of 8; padding entries must already point inside their tile (see
        :func:`pad_window_lists`).
      n_tiles: N_pad // TN.

    Returns (bases, covered):
      bases: (n_tiles, J//8, NBANDS) int32, 128-aligned atom offsets.
      covered: () bool — False if any index escapes all bands (caller must
        treat like neighbor overflow: the band geometry assumption broke).
    """
    n_pad, j = idx_pad.shape
    ng = j // GROUP
    vals = idx_pad.reshape(n_tiles, TN, ng, GROUP)
    vals = jnp.moveaxis(vals, 1, 2).reshape(n_tiles, ng, TN * GROUP)
    span = 128 * BAND_CHUNKS
    big = jnp.int32(2**30)

    bases = []
    remaining = vals
    covered_mask = jnp.zeros(vals.shape, bool)
    for _ in range(NBANDS):
        lo = jnp.min(
            jnp.where(covered_mask, big, remaining), axis=-1
        )  # (n_tiles, ng)
        base = (lo // 128) * 128
        base = jnp.where(lo == big, SENTINEL, base)
        inb = (vals >= base[..., None]) & (vals < base[..., None] + span)
        covered_mask = covered_mask | inb
        bases.append(base)
    covered = jnp.all(covered_mask)
    return jnp.stack(bases, axis=-1).astype(jnp.int32), covered


def pad_window_lists(idx, n_pad: int):
    """Pad a sorted-space (N, J) list to (N_pad, J) and retarget every
    padding/self entry at its tile's first atom, so each (tile, group)
    stays inside <= NBANDS index bands. The retargeted entries are masked
    by `pair_valid` downstream exactly like self-pairs."""
    n, j = idx.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    idx_p = jnp.full((n_pad, j), 0, jnp.int32)
    idx_p = idx_p.at[:n].set(idx)
    self_or_pad = (idx_p == rows[:, None]) | (rows[:, None] >= n)
    tile_first = (rows // TN) * TN
    return jnp.where(self_or_pad, jnp.minimum(tile_first, n - 1)[:, None], idx_p)


def _disp_kernel(
    bands_ref, cell_ref, ext_ref, own_ref, idx_ref, o_ref, acc_ref, *, j
):
    """One tile: gather neighbor positions by band/chunk, subtract own,
    minimum-image, write dispT (3, J, TN). Empty bands (SENTINEL base) are
    skipped at run time — typical (tile, group)s touch ~3 of the 6 bands."""
    t = pl.program_id(0)
    ng = j // GROUP
    dtype = o_ref.dtype

    # cell rows / inverse-cell rows as SMEM scalars (row-vector convention)
    c = [[cell_ref[3 * r + k] for k in range(3)] for r in range(3)]
    ic = [[cell_ref[9 + 3 * r + k] for k in range(3)] for r in range(3)]

    comps = [[], [], []]
    for g in range(ng):
        ig = idx_ref[g * GROUP : (g + 1) * GROUP, :]  # (8, TN)
        halves = [[], [], []]
        for h in range(TN // 128):
            il = ig[:, h * 128 : (h + 1) * 128]
            acc_ref[...] = jnp.zeros((3 * GROUP, 128), dtype)
            for b in range(NBANDS):
                base = bands_ref[(t * ng + g) * NBANDS + b]

                @pl.when(base < SENTINEL)
                def _(base=base, il=il):
                    row0 = base // 128
                    for k in range(BAND_CHUNKS):
                        lane = il - (base + 128 * k)
                        m = (lane >= 0) & (lane < 128)
                        lane_c = jnp.where(m, lane, 0)
                        for cc in range(3):
                            src = ext_ref[cc, pl.ds(row0 + k, 1), :]  # (1,128)
                            gat = jnp.take_along_axis(
                                jnp.broadcast_to(src, (GROUP, 128)),
                                lane_c,
                                axis=1,
                            )
                            sl = slice(cc * GROUP, (cc + 1) * GROUP)
                            acc_ref[sl, :] = jnp.where(m, gat, acc_ref[sl, :])

            for cc in range(3):
                halves[cc].append(acc_ref[cc * GROUP : (cc + 1) * GROUP, :])
        for cc in range(3):
            comps[cc].append(jnp.concatenate(halves[cc], axis=1))  # (8, TN)

    nbr = [jnp.concatenate(comps[cc], axis=0) for cc in range(3)]  # (J, TN)
    own = [own_ref[cc, :][None, :] for cc in range(3)]  # (1, TN) each
    d = [nbr[cc] - own[cc] for cc in range(3)]
    # minimum image, unrolled (see models/mtp.py minimum_image)
    f = [
        d[0] * ic[0][a] + d[1] * ic[1][a] + d[2] * ic[2][a] for a in range(3)
    ]
    f = [fa - jnp.round(fa) for fa in f]
    out = [
        f[0] * c[0][a] + f[1] * c[1][a] + f[2] * c[2][a] for a in range(3)
    ]
    for cc in range(3):
        o_ref[cc] = out[cc]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=())
def window_disp(positions_sorted, idx_pad, bands, cell):
    """dispT (3, J, N_pad) = minimum-imaged x[idx] - x[own], via the banded
    window kernel. positions_sorted: (N_pad, 3) bin-sorted (padding rows
    zero); idx_pad: (N_pad, J) from :func:`pad_window_lists`; bands from
    :func:`band_bases`."""
    n_pad, _ = positions_sorted.shape
    j = idx_pad.shape[1]
    dtype = positions_sorted.dtype
    n_tiles = n_pad // TN

    # component-major table, rows of 128 lanes, padded so any 128-aligned
    # band start has BAND_CHUNKS full rows
    rows = n_pad // 128 + BAND_CHUNKS
    ext = jnp.zeros((3, rows * 128), dtype)
    ext = ext.at[:, :n_pad].set(positions_sorted.T)
    ext = ext.reshape(3, rows, 128)

    own = positions_sorted.T  # (3, N_pad)
    own = jnp.pad(own, ((0, 5), (0, 0)))  # (8, N_pad) sublane-aligned

    inv_cell = jnp.linalg.inv(cell)
    cell18 = jnp.concatenate(
        [cell.astype(dtype).reshape(-1), inv_cell.astype(dtype).reshape(-1)]
    )

    idxT = idx_pad.T.astype(jnp.int32)  # (J, N_pad)
    bands_flat = bands.reshape(-1)

    out = pl.pallas_call(
        functools.partial(_disp_kernel, j=j),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((3, rows, 128), lambda i, b, c: (0, 0, 0)),
                pl.BlockSpec((8, TN), lambda i, b, c: (0, i)),
                pl.BlockSpec((j, TN), lambda i, b, c: (0, i)),
            ],
            out_specs=pl.BlockSpec((3, j, TN), lambda i, b, c: (0, 0, i)),
            scratch_shapes=[pltpu.VMEM((3 * GROUP, 128), dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, j, n_pad), dtype),
        interpret=_interpret(),
    )(bands_flat, cell18, ext, own, idxT)
    return out
