"""Production rebuild decomposition at 1M (post r4 sort-with-payload rewrite).

Times the FULL jitted build_sorted_neighbor_list(align_slots=True) plus each
production stage as its own dispatch (best-of-4; ~30ms dispatch floor is in
every number — rank, don't sum)."""
import sys
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
)
from mtp_tpu.ops.slot_assign import (
    assign_slots_apply,
    octant_classes_T,
    reverse_slots,
)
from mtp_tpu.ops.window_disp import num_tiles, pad_window_lists, window_disp, worklists
from mtp_tpu.ops.window_giveback import giveback_metadata

which = sys.argv[1] if len(sys.argv) > 1 else "1m"
reps = {"32k": (20, 20, 20), "160k": (20, 20, 100), "1m": (63, 63, 63)}[which]
J = 64
pos0, types, cell = make_lattice("fcc", 4.0, reps)
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
cutoff = 5.6
grid = grid_shape(cell, cutoff)
n = pos.shape[0]
print("N", n, "grid", grid, flush=True)


def timeit(label, fn, reps_n=4):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps_n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return out


timeit("FULL build_sorted (align)", jax.jit(lambda p: build_sorted_neighbor_list(
    p, celld, cutoff, max_neighbors=J, grid=grid, align_slots=True).idx))


@jax.jit
def stage_sort(p):
    gx, gy, gz = grid
    inv = jnp.linalg.inv(celld)
    f = p @ inv
    f = f - jnp.floor(f)
    dims = jnp.asarray(grid)
    b3 = jnp.clip((f * dims).astype(jnp.int32), 0, dims - 1)
    bid = (b3[:, 0] * gy + b3[:, 1]) * gz + b3[:, 2]
    order = jnp.argsort(bid).astype(jnp.int32)
    return order, jnp.argsort(order).astype(jnp.int32)


order, inv_order = timeit("binsort (2 argsorts)", lambda: stage_sort(pos))
spos = jax.block_until_ready(pos[order])

build = jax.jit(lambda p: build_neighbor_list(
    p, celld, cutoff, max_neighbors=J, grid=grid, with_reverse=False).idx)
idx = timeit("cell build (bins+stencil+top_k)", lambda: build(spos))

n_pad = -(-n // 256) * 256
rows = jnp.arange(n_pad, dtype=jnp.int32)
pad_rows = jnp.broadcast_to(rows[:, None], (n_pad, J))


@jax.jit
def stage_rowsort(idx):
    return jnp.sort(pad_rows.at[:n].set(idx), axis=1)


idx_pad = timeit("pad + row sort", lambda: stage_rowsort(idx))
wi0 = timeit("pad_window_lists", lambda: jax.jit(
    lambda i: pad_window_lists(i, n_pad))(idx_pad))
wl, wlc, cov = jax.jit(lambda w: worklists(w, num_tiles(n_pad)))(wi0)
timeit("worklists", lambda: jax.jit(
    lambda w: worklists(w, num_tiles(n_pad))[0])(wi0))

pos_pad = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(spos)
dispT = timeit("window_disp (rebuild)", lambda: window_disp(
    pos_pad, wi0, wl, wlc, celld))
cls = timeit("octant_classes_T", lambda: jax.jit(octant_classes_T)(dispT, idx_pad))
out = timeit("assign_slots_apply", lambda: jax.jit(assign_slots_apply)(
    idx_pad, wi0, cls)[0])
idx_al, wi_al, aligned = jax.jit(assign_slots_apply)(idx_pad, wi0, cls)
jax.block_until_ready(idx_al)
mr = timeit("reverse_slots", lambda: jax.jit(reverse_slots)(idx_al)[0])
mirror, rev = jax.jit(reverse_slots)(idx_al)
timeit("giveback_metadata", lambda: jax.jit(
    lambda a, b, c, w: giveback_metadata(a, b, c, num_tiles(n_pad), w)["bases"])(
    idx_al, wi_al, rev, wl))
