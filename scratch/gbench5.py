"""Windowed gather v2: whole ext table as a VMEM block, window = in-VMEM
dynamic slice (no DMA), picks via chunked lane gather. Modes:
  slice   — dynamic slice only
  both    — slice + gathers (the real thing), with correctness + timing
  skip    — like both, but per-jj-group chunk-range skipping via pl.when
"""
import sys
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 32768
J = 56
TN = 256
W = 5632
NC = W // 128

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"


def kernel(base_ref, ext_ref, lidx_ref, o_ref):
    b = base_ref[pl.program_id(0)]
    win = ext_ref[pl.ds(b, NC), :]  # (NC, 128) dynamic sublane slice
    lidx = lidx_ref[...]
    if MODE == "slice":
        o_ref[...] = jnp.concatenate(
            [jnp.broadcast_to(win[0][None, :], (J, 128))] * (TN // 128), axis=1
        ) + lidx.astype(jnp.float32) * 0.0
        return
    chunk = lidx // 128
    lane = lidx % 128
    out = jnp.zeros((J, TN), jnp.float32)
    for c in range(NC):
        row = jnp.broadcast_to(win[c][None, :], (J, 128))
        g0 = jnp.take_along_axis(row, lane[:, :128], axis=1)
        g1 = jnp.take_along_axis(row, lane[:, 128:], axis=1)
        g = jnp.concatenate([g0, g1], axis=1)
        out = jnp.where(chunk == c, g, out)
    o_ref[...] = out


def run():
    key = jax.random.PRNGKey(0)
    rows = np.arange(N, dtype=np.int64)[:, None]
    off = np.random.randint(-2500, 2501, size=(N, J))
    idx = np.sort(((rows + off) % N).astype(np.int32), axis=1)
    base_atom = (np.arange(N // TN) * TN + TN // 2 - W // 2) % N
    lidx = (idx - base_atom[np.arange(N) // TN, None]) % N
    assert lidx.max() < W
    bases = jnp.asarray(base_atom // 128, jnp.int32)
    lidxT = jnp.asarray(lidx.T.reshape(J, N), jnp.int32)
    posx = jax.random.normal(key, (N,), jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec(
                    ((N + W) // 128, 128), lambda i, b: (0, 0)
                ),
                pl.BlockSpec((J, TN), lambda i, b: (0, i)),
            ],
            out_specs=pl.BlockSpec((J, TN), lambda i, b: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((J, N), jnp.float32),
    )

    @jax.jit
    def step(p):
        pe = jnp.concatenate([p, p[:W]]).reshape(-1, 128)
        y = f(bases, pe, lidxT)
        return p * 1.0000001 + 1e-12 * jnp.sum(y) / N

    p = step(posx)
    print(MODE, "ok:", float(jnp.sum(p)))
    if MODE != "slice":
        pe = jnp.concatenate([posx, posx[:W]]).reshape(-1, 128)
        y = f(bases, pe, lidxT)
        ref = posx[jnp.asarray(idx)]
        print("max err:", float(jnp.max(jnp.abs(y.T - ref))))

    def body(c, _):
        return step(c), None

    @jax.jit
    def loop(x):
        y, _ = jax.lax.scan(body, x, None, length=30)
        return y

    r = loop(posx)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = loop(posx)
    float(jnp.sum(r))
    print(f"per iter: {(time.perf_counter()-t0)/30*1e3:.3f} ms")


if __name__ == "__main__":
    run()
