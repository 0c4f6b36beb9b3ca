"""In-kernel Newton give-back (TPU).

Computes `F_give[i] = sum_s pair_T[:, r(i,s), j(i,s)]` — the "other end"
half of the pair-force redistribution — without the flat mirror gather
(N*J row picks, ~7.5 ms at 32k and ~90 ms at 160k on v5e; XLA row gathers
are row-count bound and get worse per row at large tables).

Design (measured alternatives in scratch/gbperf.py, scratch/proto_gb2.py):

* Octant-aligned slots (ops/slot_assign.py) at J=64 (class capacity 8)
  make `r % 8 == 7 - s % 8` hold for ~99% of real directions. Iterating
  destination slots in within-octile-flipped order (a free rebuild-time
  relabeling — the output is slot-summed) turns that into `source sublane
  == destination sublane`, so a row-aligned `take_along_axis(axis=1)`
  resolves a whole (8 slots x 128 atoms) group per op. A general 2-D
  (row, lane) in-VMEM gather does NOT exist on TPU — chained takes compose
  wrongly (slab[rs[s, lane[s,l]], ...]), which is why alignment is load-
  bearing and the ~1% misaligned "spills" go through a small compacted XLA
  gather + scatter instead (~16k rows at 32k).
* Work items are CHUNKS (the same 128-atom source chunks as the disp
  worklists), enumerated per (tile, 128-lane half) — ~17 items per block.
  Finer granularities measured 5-8x more items, and each fori item costs
  ~100 cycles of scalar-loop latency regardless of its vector payload.
  The per-pair source row is handled in vector land: an 8-iteration loop
  over source octiles k with mask `o2 == k` (o2 = r//8, precomputed).
* The source pair_T (3, J, N) is far too big for VMEM, so the grid is
  (tiles, bands): each step fetches one (3, J, BC*128) band block whose
  base comes from a scalar-prefetched per-tile superchunk table, and
  accumulates into the tile's revisited (3, TN) output block. Streaming
  the neighborhood through VMEM trades HBM bandwidth for gather latency.

The reference does this redistribution with Kokkos atomic scatter-adds
(pair_mtp_kokkos.cpp:529-545); TPU has no atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtp_tpu.ops.window_disp import GROUP, SENTINEL, TN

BC = 4  # chunks per band block (BC*128 = 512 atoms)
NB = 32  # band blocks per tile (32k needs ~11, 160k ~25; overflow flagged)


def flip_perm(j: int):
    """Within-octile slot flip F(s) = 8*(s//8) + (7 - s%8) (involution)."""
    s = jnp.arange(j, dtype=jnp.int32)
    return 8 * (s // 8) + (7 - s % 8)


def giveback_metadata(idx, window_idx, rev, n_tiles: int, wl, k_spill=None):
    """Rebuild-time metadata for :func:`window_giveback`.

    Args:
      idx: (N_pad, J) true neighbor list (pads = own row) — realness test.
        window_idx CANNOT be used for that: its pads are retargeted to the
        tile's first atom and would read garbage as "real" pairs.
      window_idx: (N_pad, J) neighbor indices, pads retargeted in-tile,
        slots octant-aligned (build with align_slots=True).
      rev: (N_pad, J) reverse slots (ops/slot_assign.reverse_slots).
      n_tiles: N_pad // TN.
      wl: (n_tiles, 2, MAXW) per-(tile, half) chunk worklists from
        window_disp.worklists — the give-back touches exactly the same
        source chunks as the displacement gather.

    Returns a dict with the kernel operands (bases, off, wl, ilF, o2F), the
    compacted spill lists (sp_dst, sp_src), and `covered` (False if any
    static capacity — bands, spills — would be exceeded; treat like
    neighbor overflow).
    """
    n_pad, j = window_idx.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    real = idx != rows[:, None]
    s8 = (jnp.arange(j, dtype=jnp.int32) % 8)[None, :]
    elig = real & ((rev % 8) == (7 - s8))

    # ---- per-tile band table: distinct superchunks, largest-padded
    maxi = wl.shape[-1]
    sct = (wl // BC).reshape(n_tiles, 2 * maxi)
    sct = jnp.where(sct >= SENTINEL // BC, -1, sct)
    bs = jnp.sort(sct, axis=1)
    bfirst = (
        jnp.concatenate(
            [jnp.ones((n_tiles, 1), bool), bs[:, 1:] != bs[:, :-1]], axis=1
        )
        & (bs >= 0)
    )
    n_bands = jnp.sum(bfirst, axis=1)
    bkeys = jnp.where(bfirst, bs, jnp.int32(2**30))
    bases_sorted = jnp.sort(bkeys, axis=1)[:, :NB]
    largest = jnp.max(
        jnp.where(bases_sorted >= 2**30, -1, bases_sorted), axis=1, keepdims=True
    )
    bases = jnp.where(bases_sorted >= 2**30, largest, bases_sorted)
    bands_ok = jnp.max(n_bands) <= NB

    # ---- per-(tile, half) band offsets into the ascending chunk worklist
    bounds = bases * BC  # (nt, NB)
    off = jnp.sum(
        wl[:, :, :, None] < bounds[:, None, None, :], axis=2
    ).astype(jnp.int32)  # (nt, 2, NB)
    off_end = jnp.sum(wl < SENTINEL, axis=-1, keepdims=True).astype(jnp.int32)
    off = jnp.concatenate([off, off_end], axis=-1)  # (nt, 2, NB+1)

    # ---- flipped per-pair operands: neighbor columns + source octile
    fp = flip_perm(j)
    ilF = window_idx.T[fp].astype(jnp.int32)  # (J, N_pad)
    o2 = jnp.where(elig, rev // 8, 8)  # 8 = never matched by the k-loop
    o2F = o2.T[fp].astype(jnp.int32)

    # ---- globally compacted spill lists (real but misaligned directions).
    # ~0.49/atom at J=64 (class capacity 8; perfect lattices included once
    # zero-component ties are hash-broken), ~2.3/atom at J=56. The GLOBAL
    # count concentrates tightly, so a 0.75x/3x-per-atom cap has ~1.5x
    # margin — unlike per-atom slots, whose max fluctuates to ~9 (ROW_SP
    # below has margin over that). The consumer pays one K-element gather +
    # one K-row scatter-add; the gather cost is linear in the CAPACITY
    # (59 ms at 1M with K=n_pad, scratch/prof_spills.py), so the cap is as
    # tight as the flag safety allows — `covered`=False on overflow, and
    # the run() overflow response (grow max_neighbors) also grows the
    # octant class capacity, which REDUCES spills.
    #
    # Extraction is two-level (per-row J-wide sort, then one flat sort of
    # the N_pad*ROW_SP survivors) — jnp.flatnonzero over the flat 64M mask
    # was a large fraction of the 962 ms giveback_metadata cost at 1M.
    spill = real & ~elig  # (N_pad, J)
    if k_spill is None:
        # no spill repair: 1.5x margin over the measured ~0.49/atom at J=64
        k_spill = -(-(3 * n_pad) // 4) if j >= 64 else 3 * n_pad
    row_sp = 16
    iota_j = jnp.arange(j, dtype=jnp.int32)[None, :]
    rows_sp = jnp.sort(
        jnp.where(spill, iota_j, jnp.int32(2**24)), axis=1
    )[:, :row_sp]  # per-row spill slots, ascending
    row_counts = jnp.sum(spill, axis=1)
    rows_ok = jnp.max(row_counts) <= row_sp
    flat_keys = jnp.where(
        rows_sp < 2**24,
        rows[:, None] * j + rows_sp,
        jnp.int32(2**30),
    ).reshape(-1)
    sp_pos = jax.lax.sort(flat_keys)[:k_spill]
    sp_valid = sp_pos < 2**30
    sp_safe = jnp.where(sp_valid, sp_pos, 0)
    sp_dst = jnp.where(sp_valid, sp_safe // j, n_pad).astype(jnp.int32)
    src = rev.reshape(-1)[sp_safe] * n_pad + idx.reshape(-1)[sp_safe]
    # padding entries carry the OUT-OF-RANGE sentinel j*n_pad: the consumer
    # (window_giveback) masks on sp_src < j*n_pad and clamps the gather
    # index — the sentinel must stay >= j*n_pad, it does NOT point at data
    sp_src = jnp.where(sp_valid, src, j * n_pad).astype(jnp.int32)
    spills_ok = (jnp.sum(row_counts) <= k_spill) & rows_ok

    return dict(
        # 1-D: a 2-D (nt, NB) scalar-prefetch operand is padded to 128
        # lanes per row in SMEM (3908 tiles at 1M atoms -> 2 MB > the 1 MB
        # SMEM budget); flat packing is dense
        bases=bases.reshape(-1),
        off=off,
        ilF=ilF,
        o2F=o2F,
        sp_dst=sp_dst,
        sp_src=sp_src,
        covered=bands_ok & spills_ok,
    )


def _gb_kernel(bases_ref, wl_ref, off_ref, win_ref, il_ref, o2_ref, o_ref, acc_ref, *, j, nb):
    """One (tile, band) step: per half, loop the band's chunk items; per
    item an 8-iteration source-octile mask loop resolves every pair of the
    (J, 128) block whose neighbor lives in that chunk."""
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    sc = bases_ref[t * nb + b]
    for h in range(TN // 128):
        w0 = off_ref[0, h, b]
        w1 = off_ref[0, h, b + 1]

        @pl.when(w0 < w1)
        def _(h=h, w0=w0, w1=w1, sc=sc):
            ilh = il_ref[:, h * 128 : (h + 1) * 128]  # (J, 128)
            o2h = o2_ref[:, h * 128 : (h + 1) * 128]
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def body(w, _):
                ck = wl_ref[0, h, w]
                ci = ck - sc * BC
                lane = ilh - ck * 128
                m0 = (lane >= 0) & (lane < 128)
                lane_c = jnp.where(m0, lane, 0)
                cols = [win_ref[cc, :, pl.ds(ci * 128, 128)] for cc in range(3)]
                dtype = cols[0].dtype
                # per-(group, octile) nesting ON PURPOSE: a sublane-tiled
                # (J, 128) take_along that resolves all groups per octile in
                # one op measured 171 ms vs this form's 110 at 1M — Mosaic
                # lowers the fat gather + tile WORSE than 8 single-vreg-ish
                # (8, 128) shuffles. Data volume is identical either way.
                for g in range(j // 8):
                    sl = slice(g * 8, (g + 1) * 8)
                    lg = lane_c[sl]
                    m0g = m0[sl]
                    o2g = o2h[sl]
                    # accumulate the k-loop in registers; ONE scratch
                    # read-modify-write per (item, group, component) — the
                    # per-(k, g) VMEM round-trips dominated the first cut
                    ag = [jnp.zeros((GROUP, 128), dtype) for _ in range(3)]
                    for k in range(j // 8):
                        mk = (m0g & (o2g == k)).astype(dtype)
                        for cc in range(3):
                            gat = jnp.take_along_axis(
                                cols[cc][k * 8 : (k + 1) * 8], lg, axis=1
                            )
                            ag[cc] = ag[cc] + gat * mk
                    for cc in range(3):
                        row = slice(cc * j + g * 8, cc * j + (g + 1) * 8)
                        acc_ref[row, :] = acc_ref[row, :] + ag[cc]
                return 0

            jax.lax.fori_loop(w0, w1, body, 0)
            for cc in range(3):
                red = jnp.sum(acc_ref[cc * j : (cc + 1) * j, :], axis=0)
                o_ref[cc, pl.ds(h * 128, 128)] = (
                    o_ref[cc, pl.ds(h * 128, 128)] + red
                )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def window_giveback(pair_T, wl, meta):
    """F_give (3, N_pad): slot-summed mirrored pair forces (aligned
    directions via the kernel + spills via compact XLA gather/scatter).

    pair_T: (3, J, N_pad) per-pair forces from the megakernel backward
    (masked slots are zero). wl: the (nt, 2, MAXW) chunk worklists shared
    with the displacement kernel. meta: dict from
    :func:`giveback_metadata`.
    """
    _, j, n_pad = pair_T.shape
    n_tiles = n_pad // TN
    dtype = pair_T.dtype

    out = pl.pallas_call(
        functools.partial(_gb_kernel, j=j, nb=NB),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, NB),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, wl.shape[-1]),
                    lambda t, b, P: (t, 0, 0),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (1, 2, NB + 1),
                    lambda t, b, P: (t, 0, 0),
                    memory_space=pltpu.MemorySpace.SMEM,
                ),
                pl.BlockSpec(
                    (3, j, BC * 128), lambda t, b, P: (0, 0, P[t * NB + b])
                ),
                pl.BlockSpec((j, TN), lambda t, b, P: (0, t)),
                pl.BlockSpec((j, TN), lambda t, b, P: (0, t)),
            ],
            out_specs=pl.BlockSpec((3, TN), lambda t, b, P: (0, t)),
            scratch_shapes=[pltpu.VMEM((3 * j, 128), dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), dtype),
        interpret=_interpret(),
    )(meta["bases"], wl, meta["off"], pair_T, meta["ilF"], meta["o2F"])

    # spills: compact gather from the flat (J*N) table + a small row
    # scatter-add (padding rows land on the discarded n_pad slot).
    # Measured forms at 1M/J=64 on v5e (scratch/prof_spills.py): this 2-D
    # column gather with a validity mask 58.8 ms; the old zero-column
    # concatenate form 67.2 ms; three per-component 1-D gathers 104 ms;
    # 8-lane row gather + one-hot lane select 137 ms. The 2-D form wins —
    # XLA amortizes the 3 components per pick and the 64M-element table
    # cost dominates pick layout.
    sp_src = meta["sp_src"]
    valid = sp_src < j * n_pad
    src = jnp.where(valid, sp_src, 0)
    flat = pair_T.reshape(3, j * n_pad)
    vals = flat[:, src] * valid[None].astype(dtype)  # (3, K)
    extra = jnp.zeros((n_pad + 1, 3), dtype).at[meta["sp_dst"]].add(vals.T)
    return out + extra[:n_pad].T


def giveback_reference(pair_T, idx, rev):
    """XLA reference: gather each direction's mirrored value and slot-sum
    (for tests; the production XLA fallback uses the flat mirror)."""
    n_pad, j = idx.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
    real = idx != rows
    vals = pair_T[:, rev, idx]  # (3, N_pad, J) advanced indexing
    vals = vals * real[None].astype(pair_T.dtype)
    return jnp.sum(vals, axis=-1)  # (3, N_pad)
