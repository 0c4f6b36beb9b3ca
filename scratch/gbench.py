"""Microbench: TPU gather primitive costs (round-3 planning).

Experiments:
  1. Pallas dynamic_gather (take_along_axis) cost vs source extent,
     both axis=0 (per-lane sublane gather) and axis=1 (per-sublane lane
     gather).
  2. XLA fat-row gather (bin-table pattern) at step time.
  3. Thin-row gather locality sensitivity (sorted vs shuffled indices).

All timed by amortizing ITERS iterations inside one lax.scan (CLAUDE.md).
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl


def timed(fn, *args, iters=30):
    def body(c, _):
        return fn(c, *args[1:]), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    r = run(args[0])
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = run(args[0])
    float(jnp.sum(r))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


# ---------------- Exp 1: pallas dynamic_gather ----------------

def make_dg_kernel(axis):
    def k(x_ref, idx_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[...], idx_ref[0], axis=axis)
    return k


def pallas_dg(S, L, n_out_chunks, key, axis=0):
    """Gather (S, L) -> (S, L) x n_out_chunks over a grid."""
    x = jax.random.normal(key, (S, L), jnp.float32)
    hi = S if axis == 0 else L
    idx = jax.random.randint(key, (n_out_chunks, S, L), 0, hi, jnp.int32)

    f = pl.pallas_call(
        make_dg_kernel(axis),
        grid=(n_out_chunks,),
        in_specs=[
            pl.BlockSpec((S, L), lambda i: (0, 0)),
            pl.BlockSpec((1, S, L), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_out_chunks, S, L), jnp.float32),
    )

    def step(x):
        y = f(x, idx)
        return y[0] * 1e-6 + x

    try:
        ms = timed(step, x)
    except Exception as e:
        print(f"dyngather axis={axis} S={S} L={L}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}")
        return
    n_el = n_out_chunks * S * L
    print(f"dyngather axis={axis} S={S:5d} L={L:4d} chunks={n_out_chunks:4d}: "
          f"{ms:7.3f} ms  {n_el/(ms*1e-3)/1e9:7.2f} Gelem/s")


# ---------------- Exp 2: XLA fat-row gather ----------------

def fat_gather(nbins, cap, n_rows, key):
    tab0 = jax.random.normal(key, (nbins, cap * 8), jnp.float32)
    ids = jax.random.randint(key, (n_rows,), 0, nbins, jnp.int32)

    def step(t):
        t = t * 1.0000001
        g = t[ids]
        return t + 1e-9 * jnp.sum(g)

    ms = timed(step, tab0)
    mb = n_rows * cap * 8 * 4 / 1e6
    print(f"fat gather rows={n_rows} rowbytes={cap*8*4}: {ms:7.3f} ms "
          f"({mb:.0f} MB, {mb/ms:.1f} GB/s)")


# ---------------- Exp 3: thin gather locality ----------------

def thin_gather(n_src, n_rows, spread, key):
    tab0 = jax.random.normal(key, (n_src, 8), jnp.float32)
    base = (jnp.arange(n_rows) * n_src // n_rows).astype(jnp.int32)
    jit_ = jax.random.randint(key, (n_rows,), -spread, spread + 1, jnp.int32)
    ids = jnp.clip(base + jit_, 0, n_src - 1)

    def step(t):
        t = t * 1.0000001
        g = t[ids]
        return t + 1e-9 * jnp.sum(g)

    ms = timed(step, tab0)
    print(f"thin gather src={n_src} rows={n_rows} spread={spread}: {ms:7.3f} ms")


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend())
    # axis=0 sublane gather: S = source extent (the window), fixed ~30M out
    for S, chunks in [(8, 1024), (64, 128), (256, 32), (512, 16), (2048, 4)]:
        pallas_dg(S, 128, chunks, key, axis=0)
    # axis=1 lane gather within 128 lanes, varying sublane count per call
    for S, chunks in [(8, 1024), (64, 128), (512, 16)]:
        pallas_dg(S, 128, chunks, key, axis=1)
    # wider lane extent (gather within 256/512 lanes?)
    pallas_dg(64, 256, 64, key, axis=1)
    pallas_dg(64, 512, 32, key, axis=1)
    # Exp 2: disp-gather replacement pattern: 32k atoms x 27 bins
    fat_gather(2744, 16, 32768 * 27, key)
    fat_gather(2744, 16, 100_000, key)
    # Exp 3: t_ji-like: 1.8M rows from 1.8M-row table
    for spread in [1_000_000, 30_000, 2_000]:
        thin_gather(1_835_008, 1_835_008, spread, key)
    # disp-like: 1.8M rows from 32k-row table
    for spread in [16_000, 2_000, 128]:
        thin_gather(32_768, 1_835_008, spread, key)
