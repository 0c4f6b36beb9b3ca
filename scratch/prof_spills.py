"""Spill-path variants + kernel-only + NB slices at 1M (timing)."""
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
from mtp_tpu.models.mtp import MTPModel, _gather_rows3
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops import window_giveback as wg

K = 8
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
g = swl.gb
print(f"N={n} n_pad={n_pad} spills K={g['sp_src'].shape}", flush=True)

# synthetic pair_T with the right shape (values don't matter for timing)
pair_tT = jnp.asarray(
    rng.normal(0, 1, (3, J, n_pad)).astype(np.float32) * 1e-3
)


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


def sp_old(pT, sp_src, sp_dst):
    flat = jnp.concatenate(
        [pT.reshape(3, J * n_pad), jnp.zeros((3, 1), jnp.float32)], axis=1
    )
    vals = flat[:, sp_src]
    return jnp.zeros((n_pad + 1, 3), jnp.float32).at[sp_dst].add(vals.T)


def sp_2d_mask(pT, sp_src, sp_dst):
    valid = sp_src < J * n_pad
    src = jnp.where(valid, sp_src, 0)
    flat = pT.reshape(3, J * n_pad)
    vals = flat[:, src] * valid[None].astype(jnp.float32)
    return jnp.zeros((n_pad + 1, 3), jnp.float32).at[sp_dst].add(vals.T)


def sp_1d(pT, sp_src, sp_dst):
    valid = sp_src < J * n_pad
    src = jnp.where(valid, sp_src, 0)
    vf = valid.astype(jnp.float32)
    vals = jnp.stack([pT[c].reshape(-1)[src] * vf for c in range(3)], axis=-1)
    return jnp.zeros((n_pad + 1, 3), jnp.float32).at[sp_dst].add(vals)


def sp_rows8(pT, sp_src, sp_dst):
    valid = sp_src < J * n_pad
    src = jnp.where(valid, sp_src, 0)
    rows = src // 8
    lane = src % 8
    onehot = (lane[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    vf = valid.astype(jnp.float32)
    out = []
    for c in range(3):
        tab = pT[c].reshape(J * n_pad // 8, 8)
        r = tab[rows]  # (K, 8) row gather
        out.append(jnp.sum(r * onehot, axis=1) * vf)
    return jnp.zeros((n_pad + 1, 3), jnp.float32).at[sp_dst].add(
        jnp.stack(out, axis=-1))


bench("spill old (concat+2D)", sp_old, pair_tT, g["sp_src"], g["sp_dst"])
bench("spill 2D+mask", sp_2d_mask, pair_tT, g["sp_src"], g["sp_dst"])
bench("spill 3x1D", sp_1d, pair_tT, g["sp_src"], g["sp_dst"])
bench("spill rows8+onehot", sp_rows8, pair_tT, g["sp_src"], g["sp_dst"])


# kernel only (no spills)
def kernel_only(pT, wl, bases, off, ilF, o2F):
    return pl.pallas_call(
        functools.partial(wg._gb_kernel, j=J, nb=bases.shape[0] // nt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, bases.shape[0] // nt),
            in_specs=[
                pl.BlockSpec((1, 2, wl.shape[-1]), lambda t, b, P: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec((1, 2, off.shape[-1]), lambda t, b, P: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec((3, J, wg.BC * 128),
                             lambda t, b, P: (0, 0, P[t * (off.shape[-1] - 1) + b])),
                pl.BlockSpec((J, 256), lambda t, b, P: (0, t)),
                pl.BlockSpec((J, 256), lambda t, b, P: (0, t)),
            ],
            out_specs=pl.BlockSpec((3, 256), lambda t, b, P: (0, t)),
            scratch_shapes=[pltpu.VMEM((3 * J, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
    )(bases, wl, off, pT, ilF, o2F)


bench("gb kernel only NB=32", kernel_only, pair_tT, swl.wl,
      g["bases"], g["off"], g["ilF"], g["o2F"])
for nb in (24, 20):
    b24 = g["bases"].reshape(nt, wg.NB)[:, :nb].reshape(-1)
    off24 = jnp.concatenate([g["off"][:, :, :nb], g["off"][:, :, -1:]], axis=-1)
    bench(f"gb kernel only NB={nb} (timing)", kernel_only, pair_tT, swl.wl,
          b24, off24, g["ilF"], g["o2F"])
