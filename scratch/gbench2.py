"""Microbench 2: true in-VMEM dynamic_gather / select / broadcast rates.

Each grid step does R independent gathers on VMEM-resident data so grid
overhead and HBM streaming are negligible.
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl


def timed(fn, x, iters=20):
    def body(c, _):
        return fn(c), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    r = run(x)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = run(x)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_op(name, S, L, R, G, mode, key):
    """G grid steps x R ops of (S, L) each."""
    x = jax.random.normal(key, (S, L), jnp.float32)
    hi = L if mode == "gather1" else S
    idxs = jax.random.randint(key, (G, R, S, L), 0, max(hi, 1), jnp.int32)

    def kernel(x_ref, idx_ref, o_ref):
        xv = x_ref[...]
        acc = jnp.zeros_like(xv)
        for r in range(R):
            iv = idx_ref[0, r]
            if mode == "gather1":
                acc = acc + jnp.take_along_axis(xv * (1.0 + 1e-6 * r), iv, axis=1)
            elif mode == "gather0":
                acc = acc + jnp.take_along_axis(xv * (1.0 + 1e-6 * r), iv, axis=0)
            elif mode == "select":
                acc = acc + jnp.where(iv > (hi // 2), xv, acc * 0.5)
            elif mode == "bcast":
                acc = acc + jnp.broadcast_to(xv[:1] * (1.0 + 1e-6 * r), xv.shape)
        o_ref[0] = acc

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((S, L), lambda i: (0, 0)),
            pl.BlockSpec((1, R, S, L), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, L), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, L), jnp.float32),
    )

    def step(x):
        return x + 1e-9 * f(x, idxs)[0]

    try:
        ms = timed(step, x)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}")
        return
    n_el = G * R * S * L
    print(f"{name} (S={S},L={L},R={R},G={G}): {ms:7.3f} ms  "
          f"{n_el/(ms*1e-3)/1e9:7.2f} Gelem/s")


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend())
    bench_op("lane-gather ", 56, 128, 64, 64, "gather1", key)
    bench_op("lane-gather ", 8, 128, 64, 64, "gather1", key)
    bench_op("lane-gather ", 136, 128, 64, 32, "gather1", key)
    bench_op("sub-gather8 ", 8, 128, 64, 64, "gather0", key)
    bench_op("select      ", 56, 128, 64, 64, "select", key)
    bench_op("broadcast   ", 56, 128, 64, 64, "bcast", key)
