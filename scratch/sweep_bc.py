"""Giveback-kernel band-width (BC) sweep at 1M: fetch granularity vs
overdraw. BC=4 (512-atom blocks) is the shipped value."""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops import window_giveback as wg
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape

J = 64
m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos0, types0, cell = make_lattice("fcc", 4.0, (63, 63, 63))
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
grid = grid_shape(cell, model.cutoff + 0.6)
n = pos.shape[0]

swl = jax.jit(
    lambda p: build_sorted_neighbor_list(
        p, celld, model.cutoff + 0.6, max_neighbors=J, grid=grid,
        align_slots=True,
    )
)(pos)
jax.block_until_ready(swl.idx)
n_pad = swl.idx.shape[0]
nt = n_pad // 256
pair_tT = jnp.asarray(rng.normal(0, 1e-3, (3, J, n_pad)).astype(np.float32))

K = 8


def bench(label, fn, x0, *args):
    @jax.jit
    def run(x, *a):
        def step(c, i):
            o = fn(x + i.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), *a)
            return c + jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)) * 1e-30, None
        out, _ = jax.lax.scan(step, 0.0, jnp.arange(K, dtype=jnp.int32))
        return out

    float(run(x0, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / K * 1e3:.2f} ms/iter", flush=True)


def kernel_only(bc, nb, pT, wl, bases, off, ilF, o2F):
    return pl.pallas_call(
        functools.partial(wg._gb_kernel, j=J, nb=nb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, nb),
            in_specs=[
                pl.BlockSpec((1, 2, wl.shape[-1]), lambda t, b, P: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec((1, 2, nb + 1), lambda t, b, P: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec((3, J, bc * 128),
                             lambda t, b, P: (0, 0, P[t * nb + b])),
                pl.BlockSpec((J, 256), lambda t, b, P: (0, t)),
                pl.BlockSpec((J, 256), lambda t, b, P: (0, t)),
            ],
            out_specs=pl.BlockSpec((3, 256), lambda t, b, P: (0, t)),
            scratch_shapes=[pltpu.VMEM((3 * J, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
    )(bases, wl, off, pT, ilF, o2F)


for bc, nb in ((4, 32), (8, 24), (16, 16)):
    wg.BC, wg.NB = bc, nb
    meta = jax.jit(
        lambda idx, widx, rev, wl: wg.giveback_metadata(idx, widx, rev, nt, wl)
    )(swl.idx, swl.window_idx, swl.rev, swl.wl)
    cov = bool(meta["covered"])
    bases = np.asarray(meta["bases"]).reshape(nt, nb)
    nbands = (np.diff(bases, axis=1) != 0).sum(1) + 1
    print(f"BC={bc} NB={nb}: covered={cov} bands max={nbands.max()} mean={nbands.mean():.1f}", flush=True)
    if not cov:
        continue
    # note: _gb_kernel reads wg.BC at trace time for ci = ck - sc*BC
    bench(f"  kernel BC={bc}", lambda pT, wl, b_, o_, i_, q_: kernel_only(bc, nb, pT, wl, b_, o_, i_, q_),
          pair_tT, swl.wl, meta["bases"], meta["off"], meta["ilF"], meta["o2F"])
wg.BC, wg.NB = 4, 32
