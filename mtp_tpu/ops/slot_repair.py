"""Spill repair: relocate misaligned pairs onto complementary-sublane pads.

After octant-aligned slot assignment (ops/slot_assign.py), ~0.5 directed
pairs/atom are "spills": real pairs whose two ends do NOT sit at
complementary sublanes (rev % 8 == 7 - s % 8 fails), because their octant
class overflowed its capacity (J/8 per class). The give-back kernel routes
those through a compacted XLA gather whose cost is linear in its static
CAPACITY (~50 ms/step at 1M for the 0.75/atom budget on v5e) — paid every
step.

This pass moves spill pairs onto free PAD slots instead: a pair (i, j)
picks a sublane `a` with a free pad at sublane `a` in row i AND at sublane
`7 - a` in row j; both ends relocate there, which makes the pair eligible
for the kernel (the kernel's source-octile loop covers any octile; only
the sublane must be complementary). The matching is solved by a couple of
randomized symmetric rounds over a COMPACT undirected pair list (~0.25
pairs/atom), so the whole pass costs tens of ms at REBUILD time to remove
~40 ms from EVERY step at 1M.

Why this works where full slot coloring does not (scratch/proto_color*.py):
coloring constrains all ~62 pairs/row into 64 slots (tight, stalls at a
residual far over the spill budget), while repair only places ~0.5
pairs/atom into ~16 pads/row with 8 sublane choices — a sparse matching
that converges in 2 rounds.

The reference sidesteps all of this with Kokkos atomic scatter-adds
(pair_mtp_kokkos.cpp:529-545); TPU has no atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtp_tpu.ops.slot_assign import _mix
from mtp_tpu.ops.window_disp import TN


def _segment_rank(key, tie, big):
    """Rank of each element within its key-segment, ordered by `tie`.

    Returns ranks in the ORIGINAL order. Elements with key == big get
    arbitrary ranks (callers mask them). One 2-key sort + one 1-key sort.
    """
    k = key.shape[0]
    iota = jnp.arange(k, dtype=jnp.int32)
    ks, _, pos = jax.lax.sort((key, tie, iota), num_keys=2)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, iota, 0))
    rank_sorted = iota - start
    _, rank = jax.lax.sort((pos, rank_sorted), num_keys=1)
    return rank


def _lane8(table_k8, a):
    """table_k8[k, a[k]] for a (K, 8) table (onehot select, no gather)."""
    oh = jnp.arange(8, dtype=jnp.int32)[None, :] == a[:, None]
    return jnp.sum(jnp.where(oh, table_k8, 0), axis=1, dtype=jnp.int32)


def repair_spills(idx, window_idx, rev, n, *, rounds: int = 2):
    """Relocate spill pairs onto complementary-sublane pad slots.

    Args:
      idx: (N_pad, J) octant-aligned neighbor list (pads = own row).
      window_idx: (N_pad, J) same layout, pads retargeted in-tile.
      rev: (N_pad, J) reverse slots (ops/slot_assign.reverse_slots).
      n: number of real atoms (rows >= n are all-pad).
      rounds: randomized matching rounds (2 places ~90+% of repairables).

    Returns (idx, window_idx, rev, mirror) with repaired pairs moved to
    eligible slots; mirror is recomputed from the identity
    mirror[p] = idx_flat[p] * J + rev_flat[p]. The (tile, half) worklists
    are INVARIANT under this (per-row slot moves only).
    """
    n_pad, j = idx.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
    iota_j = jnp.arange(j, dtype=jnp.int32)[None, :]
    real = idx != rows
    s8 = iota_j % 8
    elig = real & ((rev % 8) == (7 - s8))

    # ---- compact undirected spill list (i < j end only; the twin's slot
    # comes from rev, so one extraction covers both ends). Two-level
    # extraction as in giveback_metadata: per-row J-sort, then one flat
    # sort of the N*ROW_SP survivors.
    spill_und = real & ~elig & (idx > rows)
    row_sp = 16
    rows_sp = jnp.sort(
        jnp.where(spill_und, iota_j, jnp.int32(2**24)), axis=1
    )[:, :row_sp]
    k_rep = n_pad // 2  # capacity 0.5 undirected/atom (mean ~0.25);
    # overflow pairs simply remain spills (flagged downstream if the
    # residual exceeds the spill budget)
    flat_keys = jnp.where(
        rows_sp < 2**24, rows * j + rows_sp, jnp.int32(2**30)
    ).reshape(-1)
    p_i = jax.lax.sort(flat_keys)[:k_rep]
    valid = p_i < 2**30
    p_safe = jnp.where(valid, p_i, 0)
    idx_f = idx.reshape(-1)
    rev_f = rev.reshape(-1)
    i_ = (p_safe // j).astype(jnp.int32)
    s_i = (p_safe % j).astype(jnp.int32)
    j_ = idx_f[p_safe]
    s_j = rev_f[p_safe]
    h0 = _mix(i_ * jnp.int32(-1640531527) + j_)

    # ---- free-pad tables: count + ascending free-octile list per
    # (row, sublane). freeoct[(row, a, t)] = octile of the t-th free pad
    # slot at sublane a (8 = none).
    pad3 = (~real).reshape(n_pad, j // 8, 8)
    F = jnp.sum(pad3, axis=1).astype(jnp.int32)  # (N_pad, 8)
    oct_ids = jnp.arange(j // 8, dtype=jnp.int32)[None, :, None]
    freeoct = jnp.sort(
        jnp.where(pad3, oct_ids, jnp.int32(8)).transpose(0, 2, 1), axis=2
    ).reshape(n_pad, j)  # (N_pad, 8*(J//8)) == (N_pad, J)
    freeoct_f = freeoct.reshape(-1)

    Fr_i = F[i_]  # (K, 8) static across rounds
    Fr_j = F[j_]
    u = jnp.zeros((n_pad * 8,), jnp.int32)  # pads consumed per (row, sublane)

    active = valid
    a_acc = jnp.full((k_rep,), -1, jnp.int32)
    sni_acc = jnp.zeros((k_rep,), jnp.int32)
    snj_acc = jnp.zeros((k_rep,), jnp.int32)

    for r in range(rounds):
        u2 = u.reshape(n_pad, 8)
        G_i = Fr_i - u2[i_]
        G_j = Fr_j - u2[j_]
        both = (G_i > 0) & (G_j > 0)[:, ::-1] & active[:, None]
        bits = jnp.sum(
            both.astype(jnp.int32) << jnp.arange(8, dtype=jnp.int32)[None, :],
            axis=1,
            dtype=jnp.int32,
        )
        h = _mix(h0 + jnp.int32(r * 1000003))
        rot = h & 7
        ext = bits | (bits << 8)
        m = ext & (jnp.int32(-1) << rot)
        iso = m & -m
        a = jnp.where(iso != 0, (31 - jax.lax.clz(iso)) % 8, -1)
        prop = a >= 0
        big = jnp.int32(2**30)
        # rank BOTH ends' claims in ONE sort: claims on the same
        # (row, sublane) can come from either end of different pairs
        # (row i_A == row j_B), and separate per-end rankings would hand
        # both rank 0 -> the same free slot
        key_i = jnp.where(prop, i_ * 8 + a, big)
        key_j = jnp.where(prop, j_ * 8 + (7 - a), big)
        tie = h & jnp.int32(2**30 - 1)
        rank_c = _segment_rank(
            jnp.concatenate([key_i, key_j]), jnp.concatenate([tie, tie]), big
        )
        rank_i = rank_c[:k_rep]
        rank_j = rank_c[k_rep:]
        win_i = prop & (rank_i < _lane8(G_i, jnp.maximum(a, 0)))
        win_j = prop & (rank_j < _lane8(G_j, jnp.maximum(7 - a, 0)))
        acc = win_i & win_j
        u_ia = _lane8(u2[i_], jnp.maximum(a, 0))
        u_jb = _lane8(u2[j_], jnp.maximum(7 - a, 0))
        oct_i = freeoct_f[
            jnp.where(acc, i_ * j + jnp.maximum(a, 0) * (j // 8) + u_ia + rank_i, 0)
        ]
        oct_j = freeoct_f[
            jnp.where(
                acc, j_ * j + jnp.maximum(7 - a, 0) * (j // 8) + u_jb + rank_j, 0
            )
        ]
        a_acc = jnp.where(acc, a, a_acc)
        sni_acc = jnp.where(acc, oct_i * 8 + a, sni_acc)
        snj_acc = jnp.where(acc, oct_j * 8 + (7 - a), snj_acc)
        active = active & ~acc
        # consumed pad slots advance by the LARGEST accepted rank + 1 per
        # (row, sublane) — rejected ranks leave holes, which must not be
        # reused next round (their pick indices were skipped, not freed)
        dump = jnp.int32(n_pad * 8)
        u = u.at[jnp.where(acc, i_ * 8 + a, dump)].max(
            u_ia + rank_i + 1, mode="drop"
        )
        u = u.at[jnp.where(acc, j_ * 8 + (7 - a), dump)].max(
            u_jb + rank_j + 1, mode="drop"
        )

    # ---- apply: one fused scatter per array over 4 position classes
    # (new/old slot at each end); never-accepted entries scatter nowhere
    done = a_acc >= 0
    dumpP = jnp.int32(n_pad * j)  # OOB -> dropped

    def P(rowv, slotv):
        return jnp.where(done, rowv * j + slotv, dumpP)

    pos_all = jnp.concatenate(
        [P(i_, sni_acc), P(j_, snj_acc), P(i_, s_i), P(j_, s_j)]
    )
    # window pad retarget: tile's first atom (clamped to the last real row)
    tile_first_i = jnp.minimum((i_ // TN) * TN, n - 1)
    tile_first_j = jnp.minimum((j_ // TN) * TN, n - 1)
    idx_vals = jnp.concatenate([j_, i_, i_, j_])
    widx_vals = jnp.concatenate([j_, i_, tile_first_i, tile_first_j])
    rev_vals = jnp.concatenate([snj_acc, sni_acc, s_i, s_j])
    idx_new = idx_f.at[pos_all].set(idx_vals, mode="drop").reshape(n_pad, j)
    widx_new = (
        window_idx.reshape(-1).at[pos_all].set(widx_vals, mode="drop")
        .reshape(n_pad, j)
    )
    rev_new = rev_f.at[pos_all].set(rev_vals, mode="drop").reshape(n_pad, j)
    mirror = (idx_new.reshape(-1) * j + rev_new.reshape(-1)).astype(jnp.int32)
    return idx_new, widx_new, rev_new, mirror
