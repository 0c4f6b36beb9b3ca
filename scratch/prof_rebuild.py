"""Decompose sorted-rebuild cost at 32k: bin-sort, cell build, row sort,
mirror argsort, band metadata."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import (
    build_neighbor_list,
    build_sorted_neighbor_list,
    grid_shape,
    mirror_permutation,
)
from mtp_tpu.ops.window_disp import band_bases, num_tiles, pad_window_lists

pos0, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
grid = grid_shape(cell, 5.6)
n = pos.shape[0]

def timeit(label, fn, reps=6):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms")

@jax.jit
def binsort(p):
    inv = jnp.linalg.inv(celld)
    f = p @ inv
    f = f - jnp.floor(f)
    dims = jnp.asarray(grid)
    b3 = jnp.clip((f * dims).astype(jnp.int32), 0, dims - 1)
    bid = (b3[:, 0] * grid[1] + b3[:, 1]) * grid[2] + b3[:, 2]
    order = jnp.argsort(bid).astype(jnp.int32)
    return order, jnp.argsort(order).astype(jnp.int32)

order, inv_order = jax.block_until_ready(binsort(pos))
spos = jnp.asarray(np.asarray(pos)[np.asarray(order)])

build = jax.jit(lambda p: build_neighbor_list(
    p, celld, 5.6, max_neighbors=56, grid=grid, with_reverse=False))
nl = build(spos)
jax.block_until_ready(nl.idx)

@jax.jit
def rowsort(idx):
    return jnp.sort(idx, axis=1)

idx_s = jax.block_until_ready(rowsort(nl.idx))
mirror = jax.jit(mirror_permutation)

@jax.jit
def bands_of(idx):
    wi = pad_window_lists(idx, idx.shape[0])
    return band_bases(wi, num_tiles(idx.shape[0]))

full = jax.jit(lambda p: build_sorted_neighbor_list(
    p, celld, 5.6, max_neighbors=56, grid=grid))

timeit("binsort (2x argsort N)", lambda: jax.block_until_ready(binsort(pos)))
timeit("cell build (table+topk)", lambda: jax.block_until_ready(build(spos).idx))
timeit("row sort (N,J)", lambda: jax.block_until_ready(rowsort(nl.idx)))
timeit("mirror argsort (N*J)", lambda: jax.block_until_ready(mirror(idx_s)))
timeit("bands+pad", lambda: jax.block_until_ready(bands_of(idx_s)[0]))
timeit("FULL sorted build", lambda: jax.block_until_ready(full(pos).idx))
