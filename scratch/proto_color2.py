"""Prototype 2: symmetric RANK coloring within octant classes.

Pairs aligned at both ends (slot_assign elig, ~99%) already satisfy the
sublane condition; the giveback kernel's remaining 8x loop is over the
source RANK (slot//8). If ranks can be made to agree at both ends up to a
bin of size C (C=8: no constraint, current; C=4/2/1: kernel loop 4/2/1
iterations), the kernel shrinks proportionally.

This measures, per (B bins of capacity C), the residual fraction of
aligned pairs that fail to get a both-ends-consistent bin after R rounds
of randomized symmetric proposals. Residual pairs would join the existing
spill path (budget: current spills ~0.49/atom; total capacity 0.75/atom).

Round structure (all (N, J) ops + 2 flat mirror-keyed sorts per round):
  1. transport other end's per-bin free bitmask (int32) via mirror sort
  2. propose: first bin free at both ends, cyclic from a pair-symmetric
     hash rotation
  3. local win: per (row, class, bin) rank by pair hash < free count
  4. transport win bit; accept = win at both ends
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def _mix(x):
    x = x * jnp.int32(-1640531527)
    x = x ^ (x >> 15)
    x = x * jnp.int32(-862048943)
    return x ^ (x >> 13)


def color_ranks(idx, cls, elig, mirror, j, n_bins, rounds, seed=0):
    """Returns bin_as (N, J) int32 (-1 = unassigned) + per-round residuals.

    cls: octant class 0..7 (8=pad). elig: aligned at both ends.
    Capacity per (row, class, bin) = (j//8) // n_bins.
    """
    n_pad = idx.shape[0]
    cap = (j // 8) // n_bins
    rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
    iota = jnp.arange(j, dtype=jnp.int32)[None, :]
    flat_i = jnp.broadcast_to(rows, (n_pad, j)).reshape(-1)
    flat_j = idx.reshape(-1)
    lo = jnp.minimum(flat_i, flat_j)
    hi = jnp.maximum(flat_i, flat_j)
    pair_key = lo * jnp.int32(np.int32(np.uint32(2654435761))) + hi

    bin_as = jnp.full((n_pad, j), -1, jnp.int32)
    residuals = []
    n_elig = int(jnp.sum(elig))

    for r in range(rounds):
        # per-(row, class, bin) used counts -> free counts (one-hot over
        # 8*n_bins values; fine at prototype scale)
        key_cb = jnp.where((bin_as >= 0) & elig, cls * n_bins + bin_as, -1)
        used = jnp.stack(
            [jnp.sum(key_cb == v, axis=1) for v in range(8 * n_bins)], axis=1
        )  # (N, 8*n_bins)
        free_cnt = cap - used
        # own free bitmask for THIS pair's class: bit b set if free_cnt>0
        fb = (free_cnt > 0).astype(jnp.int32)  # (N, 8*n_bins)
        own_mask = jnp.zeros((n_pad, j), jnp.int32)
        for c in range(8):
            m = jnp.zeros((n_pad,), jnp.int32)
            for b in range(n_bins):
                m = m | (fb[:, c * n_bins + b] << b)
            own_mask = jnp.where(cls == c, m[:, None], own_mask)
        own_flat = own_mask.reshape(-1)
        # transport: other end's free mask
        _, oth_flat = jax.lax.sort((mirror, own_flat), num_keys=1)
        both = own_flat & oth_flat
        h = _mix(pair_key + jnp.int32(r * 1000003 + seed))
        rot = jnp.abs(h) % n_bins
        # first free bin cyclically at/after rot
        ext = both | (both << n_bins)
        masked = ext & (jnp.int32(-1) << rot)
        isolate = masked & -masked
        b_prop = jnp.where(
            isolate > 0, (31 - jax.lax.clz(isolate)) % n_bins, -1
        )
        b_prop = jnp.where(
            elig.reshape(-1) & (bin_as.reshape(-1) < 0), b_prop, -1
        )
        # local win: per (row, class, bin) rank by hash < free_cnt
        b2 = b_prop.reshape(n_pad, j)
        h2 = h.reshape(n_pad, j)
        seg = jnp.where(b2 >= 0, cls * n_bins + b2, 8 * n_bins)
        skey = seg * jnp.int32(1 << 22) + (h2 & ((1 << 22) - 1))
        ks, slot_s = jax.lax.sort(
            (skey, jnp.broadcast_to(iota, (n_pad, j))), dimension=1, num_keys=1
        )
        seg_s = ks >> 22
        first = jnp.concatenate(
            [jnp.ones((n_pad, 1), bool), seg_s[:, 1:] != seg_s[:, :-1]], axis=1
        )
        segid = jnp.cumsum(first.astype(jnp.int32), axis=1)
        # rank within segment = iota - index of segment start
        start = jnp.where(first, iota, 0)
        start = jax.lax.associative_scan(jnp.maximum, start, axis=1)
        rank = iota - start
        # free count for this segment
        fc = jnp.take_along_axis(
            jnp.pad(free_cnt, ((0, 0), (0, 1))),
            jnp.minimum(seg_s, 8 * n_bins), axis=1,
        )
        win_s = (seg_s < 8 * n_bins) & (rank < fc)
        _, win = jax.lax.sort(
            (slot_s, win_s.astype(jnp.int32)), dimension=1, num_keys=1
        )
        win_f = win.reshape(-1) > 0
        _, win_oth = jax.lax.sort((mirror, win_f.astype(jnp.int32)), num_keys=1)
        acc = win_f & (win_oth > 0) & (b_prop >= 0)
        bin_as = jnp.where(acc.reshape(n_pad, j), b2, bin_as)
        residuals.append(int(jnp.sum((bin_as < 0) & elig)))
    return bin_as, residuals, n_elig


def main():
    from mtp_tpu.md.simulation import make_lattice
    from mtp_tpu.ops.neighbors import grid_shape, build_sorted_neighbor_list
    from mtp_tpu.ops.slot_assign import reverse_slots

    for name, reps, sigma in [
        ("32k thermal", (20, 20, 20), 0.07),
        ("32k lattice", (20, 20, 20), 0.0),
    ]:
        pos, types, cell = make_lattice("fcc", 3.9, reps)
        rng = np.random.default_rng(0)
        pos = jnp.asarray(
            np.asarray(pos) + sigma * rng.standard_normal(pos.shape),
            jnp.float32,
        )
        cell = jnp.asarray(cell, jnp.float32)
        cutoff = 5.5
        grid = grid_shape(np.asarray(cell), cutoff)
        nl = build_sorted_neighbor_list(
            pos, cell, cutoff, max_neighbors=64, grid=grid, align_slots=True
        )
        idx = nl.idx
        mirror, rev = reverse_slots(idx)
        n_pad, j = idx.shape
        rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
        real = idx != rows
        s8 = (jnp.arange(j, dtype=jnp.int32) % 8)[None, :]
        elig = real & ((rev % 8) == (7 - s8))
        cls = (jnp.arange(j, dtype=jnp.int32) % 8)[None, :] * jnp.ones(
            (n_pad, 1), jnp.int32
        )  # aligned slots: class == s % 8 by construction
        print(f"{name}: n_pad={n_pad} real={int(real.sum())} "
              f"elig={int(elig.sum())} ({float(elig.sum()/real.sum()):.4f})")
        for n_bins in (2, 4, 8):
            t0 = time.time()
            bin_as, res, n_elig = color_ranks(
                idx, cls, elig, mirror, j, n_bins, rounds=8
            )
            t1 = time.time()
            per_atom = [r / (n_pad) for r in res]
            print(f"  B={n_bins} (cap {j//8//n_bins}, span {8//n_bins}): "
                  f"residual/atom per round "
                  f"{['%.3f' % p for p in per_atom]} ({t1-t0:.0f}s)")


if __name__ == "__main__":
    main()
