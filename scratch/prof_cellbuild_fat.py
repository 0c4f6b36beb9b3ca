"""Stage split of the PRODUCTION (fat-row) cell build at 1M.

Stages: fatten tables -> fat-row gathers -> distance chain -> packed top_k,
each cumulative, scan-free single calls (1M dispatches ~30x the tunnel
floor). Goal: find where the 579 ms goes (compute floor is ~30-50 ms).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

reps = (63, 63, 63)
J = 64
pos0, types, cell = make_lattice("fcc", 4.0, reps)
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
cutoff = 5.6
grid = grid_shape(cell, cutoff)
n = pos.shape[0]
gx, gy, gz = grid
ncells = gx * gy * gz
cap = max(1, int(np.ceil(2.2 * n / ncells)) + 12)
RB = 8192
nb = -(-n // RB)
pad = nb * RB - n
print(f"N={n} grid={grid} cap={cap} blocks={nb}")


def timeit(label, fn, *args, reps_n=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps_n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)


inv_cell = jnp.linalg.inv(celld)
dims = jnp.asarray(grid)
stencil_x = np.array([-1, 0, 1], dtype=np.int32)


def make_tables(p):
    frac = jnp.stack(
        [p[:, 0] * inv_cell[0, a] + p[:, 1] * inv_cell[1, a]
         + p[:, 2] * inv_cell[2, a] for a in range(3)], axis=1)
    frac = frac - jnp.floor(frac)
    bin3 = jnp.clip((frac * dims).astype(jnp.int32), 0, dims - 1)
    bin_id = (bin3[:, 0] * gy + bin3[:, 1]) * gz + bin3[:, 2]
    order = jnp.argsort(bin_id)
    sorted_bin = bin_id[order]
    counts = jnp.zeros((ncells,), jnp.int32).at[sorted_bin].add(1)
    start = jnp.cumsum(counts) - counts
    rank = jnp.arange(n, dtype=jnp.int32) - start[sorted_bin]
    table = jnp.full((ncells, cap), -1, dtype=jnp.int32)
    table = table.at[sorted_bin, jnp.clip(rank, 0, cap - 1)].set(
        order.astype(jnp.int32))
    ptab = jnp.zeros((ncells, cap, 3), p.dtype)
    ptab = ptab.at[sorted_bin, jnp.clip(rank, 0, cap - 1)].set(p[order])
    return table, ptab, bin3


def fatten(t):
    c = t.shape[1]
    s = t.shape[2:]
    tz = t.reshape(gx * gy, gz, c, *s)
    t3 = jnp.concatenate(
        [jnp.roll(tz, 1, axis=1), tz, jnp.roll(tz, -1, axis=1)], axis=2)
    t3 = t3.reshape(gx, gy, gz, 3 * c, *s)
    t9 = jnp.concatenate(
        [jnp.roll(t3, 1, axis=1), t3, jnp.roll(t3, -1, axis=1)], axis=3)
    return t9.reshape(ncells, 9 * c, *s)


def full(p, upto):
    table, ptab, bin3 = make_tables(p)
    table9 = fatten(table)
    ptab9 = fatten(ptab)
    if upto == "fatten":
        return jnp.sum(table9) + jnp.sum(ptab9).astype(jnp.int32)
    pbin3 = jnp.pad(bin3, ((0, pad), (0, 0)))
    ppos = jnp.pad(p, ((0, pad), (0, 0)))
    prow = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad))

    def row_phase(args):
        cbin3, cpos, crow = args
        b = cbin3.shape[0]
        nbx = (cbin3[:, None, 0] + stencil_x[None, :]) % gx
        nb_id = (nbx * gy + cbin3[:, None, 1]) * gz + cbin3[:, None, 2]
        cand = table9[nb_id].reshape(b, -1)
        cand_pos = ptab9[nb_id].reshape(b, -1, 3)
        if upto == "gather":
            return jnp.sum(cand) + jnp.sum(cand_pos).astype(jnp.int32), 0
        cand_valid = cand >= 0
        cand_safe = jnp.where(cand_valid, cand, 0)
        dc = [cand_pos[..., a] - cpos[:, a][:, None] for a in range(3)]
        fr = [dc[0] * inv_cell[0, a] + dc[1] * inv_cell[1, a]
              + dc[2] * inv_cell[2, a] for a in range(3)]
        fr = [fa - jnp.round(fa) for fa in fr]
        d2 = jnp.zeros_like(fr[0])
        for a in range(3):
            da = fr[0] * celld[0, a] + fr[1] * celld[1, a] + fr[2] * celld[2, a]
            d2 = d2 + da * da
        keep = cand_valid & (d2 <= cutoff * cutoff) & (cand_safe != crow[:, None])
        if upto == "d2":
            return jnp.sum(keep.astype(jnp.int32)), 0
        w = keep.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1)
        packed = jnp.where(keep, ((w - col) << 20) | cand_safe, 0)
        vals, _ = jax.lax.top_k(packed, J)
        row_keep = vals > 0
        idx = jnp.where(row_keep, vals & ((1 << 20) - 1), crow[:, None])
        return jnp.sum(idx), jnp.max(jnp.sum(keep, axis=1))

    out, cnt = jax.lax.map(
        row_phase,
        (pbin3.reshape(nb, RB, 3), ppos.reshape(nb, RB, 3),
         prow.reshape(nb, RB)),
    )
    return jnp.sum(out)


for upto in ["fatten", "gather", "d2", "all"]:
    timeit(f"cumulative -> {upto}", lambda p, u=upto: full(p, u), pos)

prod = jax.jit(lambda p: build_neighbor_list(
    p, celld, cutoff, max_neighbors=J, grid=grid, with_reverse=False).idx)
timeit("production build_neighbor_list", prod, pos)
