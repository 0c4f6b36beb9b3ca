"""Prototype: symmetric edge coloring of the MD pair graph.

Goal: assign each (i,j) pair a color c in 0..J-1 such that colors are
distinct within every row at BOTH ends. Placing pairs at slot == color
makes rev == identity for colored pairs, which would let the giveback
kernel drop its 8x source-octile mask loop (192 -> 24 take_alongs/item).

This prototype measures convergence (residual uncolored fraction per
round) on realistic configs: thermal fcc and the adversarial perfect
lattice. Algorithm: randomized proposal rounds, all state (N,J) arrays,
cross-end transport via the flat mirror permutation (an involution, so
transport == one sort keyed by mirror).
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


def _ctz_words(words):
    """Index of lowest set bit across W int32 words, -1 if none.

    words: list of (F,) int32. Returns (F,) int32 in -1..32W-1.
    """
    out = jnp.full(words[0].shape, -1, jnp.int32)
    for w in reversed(range(len(words))):
        x = words[w]
        iso = x & -x
        k = 31 - jax.lax.clz(iso)  # -1 when x == 0
        out = jnp.where(x != 0, k + 32 * w, out)
    return out


def color_rounds(idx, mirror, j, rounds, seed=0):
    """Returns col (N, J) int32 (-1 = uncolored) and per-round residuals."""
    n_pad = idx.shape[0]
    F = n_pad * j
    W = (j + 31) // 32
    rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
    iota = jnp.arange(j, dtype=jnp.int32)[None, :]
    valid = idx != rows
    flat_i = jnp.broadcast_to(rows, (n_pad, j)).reshape(-1)
    flat_j = idx.reshape(-1)
    lo = jnp.minimum(flat_i, flat_j)
    hi = jnp.maximum(flat_i, flat_j)
    pair_key = lo * jnp.int32(np.int32(np.uint32(2654435761))) + hi  # symmetric

    col = jnp.full((n_pad, j), -1, jnp.int32)
    used = [jnp.zeros((n_pad,), jnp.int32) for _ in range(W)]
    residuals = []

    for r in range(rounds):
        # per-pair free masks (own row, broadcast to pairs), flat
        free_own = [jnp.repeat(~used[w], j) for w in range(W)]
        # transport to the other end: sort by mirror (involution)
        ops = jax.lax.sort(tuple([mirror] + free_own), num_keys=1)
        free_oth = list(ops[1:])
        both = [free_own[w] & free_oth[w] for w in range(W)]
        # zero bits >= j in the last word
        rem = j - 32 * (W - 1)
        if rem < 32:
            both[W - 1] = both[W - 1] & jnp.int32((1 << rem) - 1)

        h = _mix(pair_key + jnp.int32(np.int64(r * 0x9E3779B1).astype(np.int64) & 0x7FFFFFFF))
        rot = jnp.abs(h) % j
        # first free color cyclically at/after rot
        ge = []
        for w in range(W):
            b = rot - 32 * w
            shift = jnp.clip(b, 0, 32)
            m = jnp.where(
                b >= 32, 0, jnp.where(b <= 0, -1, (-1 << shift))
            ).astype(jnp.int32)
            ge.append(both[w] & m)
        c_ge = _ctz_words(ge)
        c_any = _ctz_words(both)
        c = jnp.where(c_ge >= 0, c_ge, c_any)
        c = jnp.where(valid.reshape(-1) & (col.reshape(-1) < 0), c, -1)

        # local win: per row unique per color (min 25-bit hash)
        c2 = c.reshape(n_pad, j)
        key = jnp.where(
            c2 >= 0, c2 * (1 << 25) + (h.reshape(n_pad, j) & 0x1FFFFFF),
            jnp.int32(2**30),
        )
        ks, slot_s = jax.lax.sort((key, jnp.broadcast_to(iota, (n_pad, j))),
                                  dimension=1, num_keys=1)
        prev_c = jnp.concatenate(
            [jnp.full((n_pad, 1), -1, jnp.int32), ks[:, :-1] >> 25], axis=1
        )
        win_s = (ks < 2**30) & ((ks >> 25) != prev_c)
        # restore slot order
        _, win = jax.lax.sort(
            (slot_s, win_s.astype(jnp.int32)), dimension=1, num_keys=1
        )
        win = win.reshape(-1) > 0
        # transport win
        _, win_oth = jax.lax.sort(
            (mirror, win.astype(jnp.int32)), num_keys=1
        )
        acc = win & (win_oth > 0) & (c >= 0)
        col = jnp.where(acc.reshape(n_pad, j), c.reshape(n_pad, j), col)
        # update used masks (accepted colors are distinct per row, so the
        # per-slot bit words OR together; lax.reduce folds them)
        for w in range(W):
            bit = jnp.where(
                (col >= 32 * w) & (col < 32 * (w + 1)),
                jnp.int32(1) << (col - 32 * w), 0)
            used[w] = jax.lax.reduce(
                bit, jnp.int32(0), jax.lax.bitwise_or, (1,))
        residual = int(jnp.sum((col < 0) & valid))
        residuals.append(residual)
    return col, residuals


def main():
    from mtp_tpu.md.simulation import make_lattice
    from mtp_tpu.ops.neighbors import grid_shape, build_sorted_neighbor_list
    from mtp_tpu.ops.slot_assign import reverse_slots

    for name, reps, sigma in [
        ("2k thermal", (8, 8, 8), 0.07),
        ("2k lattice", (8, 8, 8), 0.0),
        ("32k thermal", (20, 20, 20), 0.07),
    ]:
        pos, types, cell = make_lattice("fcc", 4.0 if "2k" in name else 3.9, reps)
        rng = np.random.default_rng(0)
        pos = jnp.asarray(
            np.asarray(pos) + sigma * rng.standard_normal(pos.shape),
            jnp.float32,
        )
        cell = jnp.asarray(cell, jnp.float32)
        cutoff = 5.5
        grid = grid_shape(np.asarray(cell), cutoff)
        nl = build_sorted_neighbor_list(
            pos, cell, cutoff, max_neighbors=64, grid=grid
        )
        idx = nl.idx
        mirror, rev = reverse_slots(idx)
        n_pad, j = idx.shape
        valid = int(jnp.sum(idx != jnp.arange(n_pad)[:, None]))
        t0 = time.time()
        col, res = color_rounds(idx, mirror, j, rounds=12)
        t1 = time.time()
        print(f"{name}: n_pad={n_pad} pairs={valid} "
              f"deg_mean={valid/ n_pad:.1f} "
              f"deg_max={int(jnp.max(jnp.sum(idx != jnp.arange(n_pad)[:, None], axis=1)))}")
        print("  residual/round:",
              [f"{r / valid:.4f}" for r in res], f"({t1 - t0:.1f}s)")
        # sanity: per-row distinctness of colors at both ends
        csort = np.sort(np.asarray(col), axis=1)
        dup = (csort[:, 1:] == csort[:, :-1]) & (csort[:, 1:] >= 0)
        print("  row-dup colors:", int(dup.sum()))
        # symmetric consistency via mirror
        colf = np.asarray(col).reshape(-1)
        mir = np.asarray(mirror)
        print("  asym colored:", int(((colf >= 0) & (colf != colf[mir])).sum()))


if __name__ == "__main__":
    main()
