"""Isolate window_giveback cost: scan-amortized (50 iters in ONE dispatch)."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops import window_giveback as WG

MODE = sys.argv[1]  # full | aligned | spill | empty
ITERS = 50

pos0, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
grid = grid_shape(cell, 5.6)
swl = build_sorted_neighbor_list(pos, jnp.asarray(cell, jnp.float32), 5.6,
                                 max_neighbors=56, grid=grid, align_slots=True)
assert not bool(swl.overflow)
meta = dict(swl.gb)
n_pad, J = swl.idx.shape
if MODE in ("aligned", "empty"):
    meta["off_s"] = jnp.zeros_like(meta["off_s"])
if MODE in ("spill", "empty"):
    meta["off_a"] = jnp.zeros_like(meta["off_a"])

pair_T = jax.random.normal(jax.random.PRNGKey(0), (3, J, n_pad), jnp.float32)

@jax.jit
def run(x):
    def one(c, _):
        out = WG.window_giveback(c, meta)
        c2 = c * 0.999999 + out[:, None, :] * 1e-12
        return c2, None
    c, _ = jax.lax.scan(one, x, None, length=ITERS)
    return jnp.sum(c)

float(run(pair_T))
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    float(run(pair_T))
    best = min(best, time.perf_counter() - t0)
print(f"{MODE}: {best/ITERS*1e3:.3f} ms/iter")
