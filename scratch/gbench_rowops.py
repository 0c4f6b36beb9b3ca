"""Microbench: row-local (axis=1) ops at (1M, 64) on v5e — the rebuild's
hot primitives. Scan-amortized (K iterations inside one program, inputs
perturbed per iteration to defeat CSE/hoisting).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

N, J = 1_000_192, 64
K = 8
rng = np.random.default_rng(0)
perm = np.argsort(rng.random((N, J)), axis=1).astype(np.int32)
x0 = rng.integers(0, N, (N, J)).astype(np.int32)

xd = jnp.asarray(x0)
pd = jnp.asarray(perm)


def _sync(o):
    # block_until_ready can return early through the axon tunnel: force a
    # value instead (CLAUDE.md)
    return float(jnp.sum(o.astype(jnp.float32)))


def bench(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/K*1e3:.2f} ms/iter", flush=True)
    return out


def scan_k(body):
    def fn(x, p):
        def step(c, i):
            return body(c + i, p), 0
        out, _ = jax.lax.scan(step, x, jnp.arange(K, dtype=jnp.int32))
        return out
    return fn


# 1. XLA take_along_axis(axis=1)
bench("xla take_along (1M,64)", scan_k(
    lambda x, p: jnp.take_along_axis(x, p, axis=1)), xd, pd)

# 2. jnp.sort axis=1
bench("jnp.sort axis=1 (1M,64)", scan_k(
    lambda x, p: jnp.sort(x, axis=1)), xd, pd)

# 3. packed argsort (sort of key*64+iota)
iota = jnp.arange(J, dtype=jnp.int32)[None, :]


def packed_argsort(x, p):
    key = (x % 1024) * J + iota
    return jnp.sort(key, axis=1) % J


bench("packed argsort (sort+mod)", scan_k(packed_argsort), xd, pd)

# 4. lax.sort 2-operand stable over flat 64M (the reverse_slots global sort)
pos = jnp.arange(N * J, dtype=jnp.int32)


def global_stable(x, p):
    dst = x.reshape(-1)
    _, sp2 = jax.lax.sort((dst, pos), num_keys=1, is_stable=True)
    return sp2.reshape(N, J)


bench("global stable 1-key sort (64M, 2 ops)", scan_k(global_stable), xd, pd)


def global_lex3(x, p):
    dst = x.reshape(-1)
    src = jax.lax.broadcasted_iota(jnp.int32, (N, J), 0).reshape(-1)
    _, _, sp2 = jax.lax.sort((dst, src, pos), num_keys=2)
    return sp2.reshape(N, J)


bench("global 2-key lexsort (64M, 3 ops)", scan_k(global_lex3), xd, pd)

# 5. pad_window_lists-style elementwise pass
rows = jnp.arange(N, dtype=jnp.int32)


def pwl(x, p):
    self_or_pad = x == rows[:, None]
    tile_first = (rows // 256) * 256
    return jnp.where(self_or_pad, jnp.minimum(tile_first, N - 1)[:, None], x)


bench("pad_window_lists elementwise", scan_k(pwl), xd, pd)

# 6. top_k vs packed-sort compaction at cell-build shapes (block 8192 x 999)
W = 999
yb = jnp.asarray(rng.integers(0, 2, (8192, W)).astype(np.int32))
NB_ = 123


def topk_blocks(x, p):
    def blk(c, _):
        keep = (yb + c) % 2 == 1
        score = jnp.where(keep, W - jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1), 0)
        vals, take = jax.lax.top_k(score, J)
        return c + 1, jnp.sum(take)
    _, s = jax.lax.scan(blk, x, None, length=NB_)
    return s


bench("cell-build top_k (123 x 8192 x 999)",
      lambda x, p: topk_blocks(x, p), jnp.int32(0), pd)


def sortpack_blocks(x, p):
    col = jax.lax.broadcasted_iota(jnp.int32, (8192, W), 1)
    def blk(c, _):
        keep = (yb + c) % 2 == 1
        key = jnp.where(keep, col, jnp.int32(2**22))
        ks = jax.lax.sort(key, dimension=1)[:, :J]
        return c + 1, jnp.sum(ks)
    _, s = jax.lax.scan(blk, x, None, length=NB_)
    return s


bench("cell-build packed-sort (123 x 8192 x 999)",
      lambda x, p: sortpack_blocks(x, p), jnp.int32(0), pd)
