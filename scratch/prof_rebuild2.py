"""Rebuild decomposition at 160k."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape, mirror_permutation
from mtp_tpu.ops.window_disp import num_tiles, pad_window_lists, worklists

reps = (20, 20, 100)
pos0, types, cell = make_lattice("fcc", 4.0, reps)
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
grid = grid_shape(cell, 5.6)
n = pos.shape[0]
print("N", n, "grid", grid)

def timeit(label, fn, reps_n=4):
    fn()
    best = 1e9
    for _ in range(reps_n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.2f} ms")

@jax.jit
def binsort(p):
    inv = jnp.linalg.inv(celld)
    f = p @ inv; f = f - jnp.floor(f)
    dims = jnp.asarray(grid)
    b3 = jnp.clip((f * dims).astype(jnp.int32), 0, dims - 1)
    bid = (b3[:, 0] * grid[1] + b3[:, 1]) * grid[2] + b3[:, 2]
    order = jnp.argsort(bid).astype(jnp.int32)
    return order

order = jax.block_until_ready(binsort(pos))
spos = jnp.asarray(np.asarray(pos)[np.asarray(order)])
build = jax.jit(lambda p: build_neighbor_list(p, celld, 5.6, max_neighbors=56, grid=grid, with_reverse=False))
nl = build(spos); jax.block_until_ready(nl.idx)
idx_s = jax.block_until_ready(jax.jit(lambda i: jnp.sort(i, axis=1))(nl.idx))
n_pad = -(-n // 256) * 256
rows = jnp.arange(n_pad, dtype=jnp.int32)
idx_pad = jax.block_until_ready(jnp.broadcast_to(rows[:, None], (n_pad, 56)).at[:n].set(idx_s))

mirror = jax.jit(mirror_permutation)
@jax.jit
def wl_of(idx):
    wi = pad_window_lists(idx, idx.shape[0])
    return worklists(wi, num_tiles(idx.shape[0]))[0]

timeit("binsort", lambda: jax.block_until_ready(binsort(pos)))
timeit("cell build", lambda: jax.block_until_ready(build(spos).idx))
timeit("row sort", lambda: jax.block_until_ready(jnp.sort(nl.idx, axis=1)))
timeit("mirror lexsort", lambda: jax.block_until_ready(mirror(idx_pad)))
timeit("worklists", lambda: jax.block_until_ready(wl_of(idx_pad)))
