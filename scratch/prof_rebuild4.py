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


def _full(p):
    s = build_sorted_neighbor_list(
        p, celld, cutoff, max_neighbors=J, grid=grid, align_slots=True)
    return (s.idx, s.window_idx, s.wl, s.wl_counts, s.order, s.inv_order,
            s.mirror, s.rev, s.overflow, s.gb)
full = jax.jit(_full)
timeit("FULL build_sorted (align, all outputs)", lambda: full(pos))


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
pwl_j = jax.jit(lambda i: pad_window_lists(i, n_pad))
wi0 = timeit("pad_window_lists", lambda: pwl_j(idx_pad))
wl_j = jax.jit(lambda w: worklists(w, num_tiles(n_pad)))
wl, wlc, cov = wl_j(wi0)
timeit("worklists", lambda: wl_j(wi0)[0])

pos_pad = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(spos)
dispT = timeit("window_disp (rebuild)", lambda: window_disp(
    pos_pad, wi0, wl, wlc, celld))
oc_j = jax.jit(octant_classes_T)
cls = timeit("octant_classes_T", lambda: oc_j(dispT, idx_pad))
as_j = jax.jit(assign_slots_apply)
out = timeit("assign_slots_apply", lambda: as_j(idx_pad, wi0, cls)[0])
idx_al, wi_al, aligned = as_j(idx_pad, wi0, cls)
jax.block_until_ready(idx_al)
rs_j = jax.jit(reverse_slots)
mr = timeit("reverse_slots", lambda: rs_j(idx_al)[0])
mirror, rev = rs_j(idx_al)
gm_j = jax.jit(lambda a, b, c, w: giveback_metadata(a, b, c, num_tiles(n_pad), w))
timeit("giveback_metadata", lambda: gm_j(idx_al, wi_al, rev, wl)["bases"])
from mtp_tpu.ops.slot_repair import repair_spills
rp_j = jax.jit(lambda a, b, c: repair_spills(a, b, c, n))
timeit("repair_spills (NEW)", lambda: rp_j(idx_al, wi_al, rev)[0])
idx_r, wi_r, rev_r, mir_r = rp_j(idx_al, wi_al, rev)
jax.block_until_ready(idx_r)
# residual spill stats before/after
def spills(ii, rr):
    rows = jnp.arange(ii.shape[0], dtype=jnp.int32)[:, None]
    s8 = (jnp.arange(ii.shape[1], dtype=jnp.int32) % 8)[None, :]
    real = ii != rows
    elig = real & ((rr % 8) == (7 - s8))
    return int(jnp.sum(real & ~elig)), int(jnp.sum(real))
sb, rl = spills(idx_al, rev)
sa, _ = spills(idx_r, rev_r)
print(f"spills/atom before={sb/n:.3f} after={sa/n:.3f} (real/atom {rl/n:.1f})")
