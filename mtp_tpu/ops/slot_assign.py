"""Octant-aligned neighbor-slot assignment (TPU give-back fast path).

The Newton give-back `F_i -= sum_s t[j(i,s), r(i,s)]` is a 2-D gather over
(source row j, source slot r). A Pallas kernel can resolve the row dimension
with the same worklist/lane-shuffle machinery as the displacement gather
(ops/window_disp.py), but the slot dimension needs the source SUBLANE to be
a static function of the destination sublane. This module arranges exactly
that:

* Every directed pair (i -> j) gets a CLASS c = octant of the displacement
  d_ij (sign bits of x, y, z; zero components tie-broken by index order).
  Minimum-image displacements are bitwise antisymmetric in IEEE arithmetic
  (fl(a-b) = -fl(b-a), round is odd), so the class seen from the other end
  is exactly the bit-complement: c_ji = 7 - c_ij. No communication needed.
* Within each row, class-c pairs are placed at slots congruent to c mod 8
  (sorted by neighbor index within the class; capacity J/8 per class).
  For a pair aligned at BOTH ends, the source slot then satisfies
  r % 8 == 7 - s % 8 — a fixed sublane flip the kernel applies statically.
* Pairs that overflow their class (octant occupancies fluctuate to ~11 at
  300 K vs capacity 7 at J=56) go to leftover slots and are handled as
  per-pair "spill" items by the same kernel (~5% of directions, measured).

The reference's Kokkos path sidesteps all of this with atomic scatter-adds
(pair_mtp_kokkos.cpp:529-545); TPU has no atomics, so the redistribution is
restructured around gathers instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mix(x):
    """int32 hash (injective-ish); used for randomized symmetric-consistent
    tie-breaking of exactly-zero displacement components."""
    x = x * jnp.int32(-1640531527)  # 2654435761 mod 2^32, Knuth
    x = x ^ (x >> 15)
    x = x * jnp.int32(-862048943)
    return x ^ (x >> 13)


def octant_classes_T(dispT, idx):
    """octant_classes over the kernel's transposed displacement layout.

    dispT: (3, J, N) from ops/window_disp.window_disp (the rebuild computes
    displacements through the kernel instead of the N*J-row XLA gather —
    ~90 ms at 160k). idx: (N, J). Returns cls (N, J).
    """
    n, j = idx.shape
    rowsT = jnp.arange(n, dtype=idx.dtype)[None, :]
    idxT = idx.T
    realT = idxT != rowsT
    hi = _mix(rowsT)
    hj = _mix(idxT)
    tie = (hi < hj) | ((hi == hj) & (rowsT < idxT))
    bits = []
    for c in range(3):
        x = dispT[c]
        bits.append((x > 0) | ((x == 0) & tie))
    clsT = 4 * bits[0].astype(jnp.int32) + 2 * bits[1] + bits[2]
    return jnp.where(realT, clsT, 8).T


def octant_classes(disp, idx):
    """Per-pair octant class (N, J) int32 in 0..7; self/pad entries get 8.

    disp: (N, J, 3) minimum-image displacements to each neighbor.
    idx: (N, J) neighbor indices (pads = own row).

    Zero components are tie-broken by a hash comparison so the two ends of
    a pair still see complementary bits (c_ji = 7 - c_ij) — minimum-image
    displacements are bitwise antisymmetric, so nonzero components agree
    exactly. The hash (not plain index order) matters on perfect lattices:
    axis-aligned shells have exact zeros, and a systematic tie-break piles
    them into the same octants (measured 11 misaligned directions/atom at
    J=64 vs the spill capacity of 8); a randomized one spreads them.
    """
    n, j = idx.shape
    rows = jnp.arange(n, dtype=idx.dtype)[:, None]
    real = idx != rows
    hi = _mix(rows)
    hj = _mix(idx)
    tie = (hi < hj) | ((hi == hj) & (rows < idx))
    bits = []
    for c in range(3):
        x = disp[..., c]
        bits.append((x > 0) | ((x == 0) & tie))
    cls = 4 * bits[0].astype(jnp.int32) + 2 * bits[1] + bits[2]
    return jnp.where(real, cls, 8)


def assign_slots(idx_jsorted, cls):
    """Class-aligned slot permutation for each row.

    Args:
      idx_jsorted: (N, J) row-sorted neighbor list (pads = own row).
      cls: (N, J) classes from :func:`octant_classes` (8 = pad).

    Returns (perm, aligned_here):
      perm: (N, J) int32 — new slot s holds pair `idx_jsorted[a, perm[a,s]]`
        (apply with take_along_axis).
      aligned_here: (N, J) bool in NEW layout — pair sits in one of its
        class's aligned slots at THIS end (s % 8 == class, rank < J/8).
    """
    n, j = idx_jsorted.shape
    cap = j // 8
    iota = jnp.arange(j, dtype=jnp.int32)[None, :]

    # class-major stable order (j-sorted within class; pads last)
    co = jnp.argsort(cls * j + iota, axis=1).astype(jnp.int32)
    cls_q = jnp.take_along_axis(cls, co, axis=1)  # sorted classes
    # within-class rank: q - (number of pairs in earlier classes)
    onehot = (cls_q[:, :, None] == jnp.arange(9)[None, None, :]).astype(jnp.int32)
    counts = jnp.sum(onehot, axis=1)  # (N, 9)
    offs = jnp.cumsum(counts, axis=1) - counts  # exclusive
    k = iota - jnp.take_along_axis(offs, cls_q, axis=1)
    aligned_q = (k < cap) & (cls_q < 8)
    slot_aligned = cls_q + 8 * k

    # leftover pairs fill the complement slots in ascending order. Free
    # slots are found without scatters: sort the aligned targets against
    # the full slot range and keep range entries with no matching target.
    big = jnp.int32(2 * j)
    tgt = jnp.where(aligned_q, slot_aligned, big)
    merged = jnp.concatenate(
        [tgt * 2, jnp.broadcast_to(iota * 2 + 1, (n, j))], axis=1
    )  # (N, 2J): slot s used <=> 2s present before 2s+1
    ms = jnp.sort(merged, axis=1)
    is_iota = (ms % 2) == 1
    prev = jnp.concatenate([jnp.full((n, 1), -1, ms.dtype), ms[:, :-1]], axis=1)
    is_free = is_iota & (prev != ms - 1)
    free_sorted = jnp.sort(jnp.where(is_free, ms // 2, big), axis=1)[:, :j]

    e = jnp.cumsum((~aligned_q).astype(jnp.int32), axis=1) - 1
    slot_free = jnp.take_along_axis(free_sorted, jnp.maximum(e, 0), axis=1)
    slot_q = jnp.where(aligned_q, slot_aligned, slot_free).astype(jnp.int32)

    sigma = jnp.argsort(slot_q, axis=1).astype(jnp.int32)  # slot -> q
    perm = jnp.take_along_axis(co, sigma, axis=1)
    aligned_here = jnp.take_along_axis(aligned_q, sigma, axis=1)
    return perm, aligned_here


def assign_slots_apply(idx_jsorted, widx, cls):
    """Class-aligned slot assignment, APPLIED: returns the permuted arrays
    directly instead of a permutation to gather with.

    Same semantics as ``take_along_axis(x, assign_slots(...)[0], axis=1)``
    but built entirely from row sorts with payloads — XLA's per-row
    `take_along_axis` is a 64M-pick scalar gather at 1M x 64 (~1.06 s
    measured on v5e) while a row sort is ~9 ms, so every gather here is
    reformulated as a `lax.sort` carrying the values it would have picked.

    Args:
      idx_jsorted: (N, J) row-sorted neighbor list (pads = own row).
      widx: (N, J) a second array permuted identically (window_idx).
      cls: (N, J) classes from :func:`octant_classes` (8 = pad).

    Returns (idx_al, widx_al, aligned_here) in the new slot layout.
    """
    n, j = idx_jsorted.shape
    cap = j // 8
    iota = jnp.arange(j, dtype=jnp.int32)[None, :]
    big = jnp.int32(2**24)

    # S1: class-major stable order (j-sorted within class; pads last),
    # values carried as payloads
    key1 = cls * j + iota
    k1s, idx_q, widx_q = jax.lax.sort(
        (key1, idx_jsorted, widx), dimension=1, num_keys=1
    )
    cls_q = k1s // j

    # per-class counts / exclusive offsets; the (N, J)-shaped "offs[cls_q]"
    # gather becomes a 9-pass select (cls fits in 0..8)
    counts = jnp.stack(
        [jnp.sum((cls == c).astype(jnp.int32), axis=1) for c in range(9)],
        axis=1,
    )
    offs = jnp.cumsum(counts, axis=1) - counts
    off_take = jnp.zeros((n, j), jnp.int32)
    for c in range(9):
        off_take = jnp.where(cls_q == c, offs[:, c : c + 1], off_take)
    k = iota - off_take
    aligned_q = (k < cap) & (cls_q < 8)
    slot_aligned = cls_q + 8 * k

    # slot occupancy from counts alone: slot s (class s%8, rank s//8) is
    # used iff min(count[s%8], cap) > s//8 — jnp.tile lays the s%8 pattern
    # out without any gather
    csel = jnp.minimum(counts[:, :8], cap)
    used = jnp.tile(csel, (1, cap)) > (iota // 8)
    rank_free = jnp.cumsum((~used).astype(jnp.int32), axis=1) - 1
    e = jnp.cumsum((~aligned_q).astype(jnp.int32), axis=1) - 1

    # S2: pair the t-th unaligned element with the t-th free slot by merge-
    # sorting both sequences on interleaved ranks (2t / 2t+1): after the
    # sort, positions (2t, 2t+1) hold (free slot t, element t). The counts
    # match exactly: #free == J - #aligned == #unaligned (pads included).
    key_a = jnp.where(~used, 2 * rank_free, big)
    key_b = jnp.where(~aligned_q, 2 * e + 1, big)
    zero = jnp.zeros((n, j), jnp.int32)
    key2 = jnp.concatenate([key_a, key_b], axis=1)
    p_slot = jnp.concatenate([jnp.broadcast_to(iota, (n, j)), zero], axis=1)
    p_idx = jnp.concatenate([zero, idx_q], axis=1)
    p_widx = jnp.concatenate([zero, widx_q], axis=1)
    k2s, s_slot, s_idx, s_widx = jax.lax.sort(
        (key2, p_slot, p_idx, p_widx), dimension=1, num_keys=1
    )
    pair_slot = s_slot.reshape(n, j, 2)[:, :, 0]
    pair_idx = s_idx.reshape(n, j, 2)[:, :, 1]
    pair_widx = s_widx.reshape(n, j, 2)[:, :, 1]
    pair_valid = k2s.reshape(n, j, 2)[:, :, 0] < big

    # S3: emit slot order — each slot appears exactly once across the
    # aligned entries and the S2 pairs; sort by slot and slice
    key3 = jnp.concatenate(
        [
            jnp.where(aligned_q, slot_aligned, big),
            jnp.where(pair_valid, pair_slot, big),
        ],
        axis=1,
    )
    a_idx = jnp.concatenate([idx_q, pair_idx], axis=1)
    a_widx = jnp.concatenate([widx_q, pair_widx], axis=1)
    a_fl = jnp.concatenate([aligned_q.astype(jnp.int32), zero], axis=1)
    _, out_idx, out_widx, out_fl = jax.lax.sort(
        (key3, a_idx, a_widx, a_fl), dimension=1, num_keys=1
    )
    return out_idx[:, :j], out_widx[:, :j], out_fl[:, :j] > 0


def reverse_slots(idx):
    """Reverse slots and flat mirror for an ARBITRARY slot ordering.

    For a symmetric list: `r[a, s]` = slot of atom a in row `idx[a, s]`;
    `mirror[p]` = flat position of the mirrored pair. Generalizes
    neighbors.mirror_permutation (which requires row-sorted storage): the
    t-th pair in (src, dst) order mirrors the t-th pair in (dst, src)
    order. Self-pairs (pads) mirror to themselves.

    Sort-with-payload formulation (no take_along / argsort-and-gather —
    see assign_slots_apply): with a1 = per-row argsort of idx, the t-th
    pair of row i in (src, dst) order sits at storage slot a1[i, t], so
    placing the global-sort ranks back into storage order is one more
    per-row sort keyed by a1. The global (dst, src) order is ONE stable
    1-key sort: storage order is already src-major, so stability supplies
    the second key (185 ms vs 265 ms for the 2-key form at 64M on v5e).
    """
    n, j = idx.shape
    iota = jnp.arange(j, dtype=jnp.int32)[None, :]
    if n * j < 2**31:
        # packed per-row argsort: sort idx*J+slot, decode slot
        a1 = (jnp.sort(idx * j + iota, axis=1) % j).astype(jnp.int32)
    else:
        a1 = jnp.argsort(idx, axis=1).astype(jnp.int32)

    dst = idx.reshape(-1)
    pos = jnp.arange(n * j, dtype=jnp.int32)
    _, sp2 = jax.lax.sort((dst, pos), num_keys=1, is_stable=True)

    # mirror[i, a1[i, t]] = sp2[i*j + t]  ==  per-row sort of (a1, sp2-row)
    _, mirror_r = jax.lax.sort(
        (a1, sp2.reshape(n, j)), dimension=1, num_keys=1
    )
    mirror = mirror_r.reshape(-1)
    r = (mirror_r % j).astype(jnp.int32)
    return mirror, r
