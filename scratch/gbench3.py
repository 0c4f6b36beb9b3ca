"""Microbench 3: windowed in-kernel disp-gather prototype.

Per grid step (tile of 256 atoms):
  - window positions arrive as a dynamically-offset DMA from HBM
    (base scalar in SMEM), component-major (3, W).
  - per-pair picks via chunked per-sublane lane gather
    (jnp.take_along_axis axis=1 within 128-lane chunks + select merge).

Compares against the XLA thin-row gather doing the same job.
"""
import time
import functools
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
W = 5632  # window atoms (44 chunks of 128)


def wg_kernel(base_ref, posx_ref, lidx_ref, o_ref, scratch, sem):
    # DMA the window rows [base, base+W) of the (N_ext/128, 128) table
    b = base_ref[pl.program_id(0)]
    dma = pltpu.make_async_copy(
        posx_ref.at[pl.ds(b, W // 128)], scratch, sem
    )
    dma.start()
    dma.wait()
    win = scratch[...]  # (W//128, 128)
    lidx = lidx_ref[...]  # (J, TN)
    out = jnp.zeros((J, TN), jnp.float32)
    chunk = lidx // 128
    lane = lidx % 128
    for c in range(W // 128):
        row = win[c][None, :]  # (1, 128)
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(row, (J, 128)), lane[:, :128], axis=1
        )
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(row, (J, 128)), lane[:, 128:], axis=1
        )
        g = jnp.concatenate([g0, g1], axis=1)
        out = jnp.where(chunk == c, g, out)
    o_ref[...] = out


def windowed_gather(posx_pad, bases, lidx):
    f = pl.pallas_call(
        wg_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((J, TN), lambda i, b: (0, i)),
            ],
            out_specs=pl.BlockSpec((J, TN), lambda i, b: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((W // 128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((J, N), jnp.float32),
    )
    return f(bases, posx_pad, lidx)


def timed(fn, x, iters=30):
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


def main():
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend())
    # fake a bin-sorted neighbor structure: idx within +-2500 of row
    rows = np.arange(N, dtype=np.int64)[:, None]
    off = np.random.randint(-2500, 2501, size=(N, J))
    idx = ((rows + off) % N).astype(np.int32)

    # per-tile base: min over tile rows of idx, rounded down to 128
    idx_t = idx.reshape(N // TN, TN * J)
    # circular window: base = row_start - 2816 (half window), mod N
    base_atom = (np.arange(N // TN) * TN + TN // 2 - W // 2) % N
    lidx = (idx - base_atom[np.arange(N) // TN, None]) % N
    assert lidx.max() < W, lidx.max()
    bases = jnp.asarray(base_atom // 128, jnp.int32)
    lidxT = jnp.asarray(lidx.T.reshape(J, N), jnp.int32)  # (J, N) wait

    posx = jax.random.normal(key, (N,), jnp.float32)
    # extended circular table, reshaped (rows of 128)
    posx_ext = jnp.concatenate([posx, posx[:W]]).reshape(-1, 128)

    idx_j = jnp.asarray(idx, jnp.int32)

    def step_pallas(p):
        pe = jnp.concatenate([p, p[:W]]).reshape(-1, 128)
        y = windowed_gather(pe, bases, lidxT)
        return p + 1e-9 * y[0, :N] * 0  + p * 1.0000001

    def step_pallas_real(p):
        pe = jnp.concatenate([p, p[:W]]).reshape(-1, 128)
        y = windowed_gather(pe, bases, lidxT)
        return p * 1.0000001 + 1e-12 * jnp.sum(y) / N

    def step_xla(p):
        p8 = jnp.pad(p[:, None], ((0, 0), (0, 7)))
        g = p8[idx_j][..., 0]  # (N, J)
        return p * 1.0000001 + 1e-12 * jnp.sum(g) / N

    # correctness
    pe = jnp.concatenate([posx, posx[:W]]).reshape(-1, 128)
    y = windowed_gather(pe, bases, lidxT)  # (J, N)
    ref = posx[idx_j]  # (N, J)
    err = float(jnp.max(jnp.abs(y.T - ref)))
    print("max err:", err)

    ms_p = timed(step_pallas_real, posx)
    print(f"pallas windowed gather (1 comp): {ms_p:.3f} ms")
    ms_x = timed(step_xla, posx)
    print(f"xla thin gather (1 comp, 8-lane): {ms_x:.3f} ms")


if __name__ == "__main__":
    main()
