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


def reverse_slots(idx):
    """Reverse slots and flat mirror for an ARBITRARY slot ordering.

    For a symmetric list: `r[a, s]` = slot of atom a in row `idx[a, s]`;
    `mirror[p]` = flat position of the mirrored pair. Generalizes
    neighbors.mirror_permutation (which requires row-sorted storage): the
    t-th pair in (src, dst) order mirrors the t-th pair in (dst, src)
    order, so mirror = sp2[rank1] with both orders built by stable sorts.
    Self-pairs (pads) mirror to themselves.
    """
    n, j = idx.shape
    a1 = jnp.argsort(idx, axis=1).astype(jnp.int32)  # per-row j-order
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    sp1 = (rows * j + a1).reshape(-1)  # rank -> storage pos, (src,dst) order
    rank_in_row = jnp.argsort(a1, axis=1).astype(jnp.int32)
    rank1 = (rows * j + rank_in_row).reshape(-1)  # storage pos -> rank

    dst = idx.reshape(-1)
    src = jnp.broadcast_to(rows, (n, j)).reshape(-1)
    pos = jnp.arange(n * j, dtype=jnp.int32)
    _, _, sp2 = jax.lax.sort((dst, src, pos), num_keys=2)

    mirror = sp2[rank1]
    del sp1  # (sp1 is sp2's counterpart by construction; kept for clarity)
    r = (mirror % j).reshape(n, j).astype(jnp.int32)
    return mirror, r
