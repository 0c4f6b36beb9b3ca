"""Ceiling probe: giveback kernel with the source-octile k-loop restricted.

If a symmetric rank coloring guaranteed o2 in a small set around g (exact:
o2 == g; pair: o2//2 == g//2; half: o2//4 == g//4), the kernel's inner loop
shrinks 8x/4x/2x. This measures the attainable kernel time at each trip
count with REAL metadata (output is numerically wrong for the reduced
variants — only timing is meaningful; the mask shapes and data volume are
identical).

Usage: python scratch/probe_gb_ceiling.py [reps]   (default 63 -> 1M atoms)
"""
import functools
import sys
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
from mtp_tpu.models.mtp import MTPModel, _gather_rows3, window_constants
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops.pallas_moments import site_energies_mega
from mtp_tpu.ops.window_disp import GROUP, TN, window_disp
from mtp_tpu.ops.window_giveback import BC, NB

K = 8


def _gb_kernel_k(bases_ref, wl_ref, off_ref, win_ref, il_ref, o2_ref, o_ref,
                 acc_ref, *, j, nb, span):
    """span = size of the source-octile set per destination group (8 = full
    current kernel; 4/2/1 = coloring-restricted variants)."""
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    sc = bases_ref[t * nb + b]
    for h in range(TN // 128):
        w0 = off_ref[0, h, b]
        w1 = off_ref[0, h, b + 1]

        @pl.when(w0 < w1)
        def _(h=h, w0=w0, w1=w1, sc=sc):
            ilh = il_ref[:, h * 128 : (h + 1) * 128]
            o2h = o2_ref[:, h * 128 : (h + 1) * 128]
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def body(w, _):
                ck = wl_ref[0, h, w]
                ci = ck - sc * BC
                lane = ilh - ck * 128
                m0 = (lane >= 0) & (lane < 128)
                lane_c = jnp.where(m0, lane, 0)
                cols = [win_ref[cc, :, pl.ds(ci * 128, 128)] for cc in range(3)]
                dtype = cols[0].dtype
                for g in range(j // 8):
                    sl = slice(g * 8, (g + 1) * 8)
                    lg = lane_c[sl]
                    m0g = m0[sl]
                    o2g = o2h[sl]
                    ag = [jnp.zeros((GROUP, 128), dtype) for _ in range(3)]
                    base = (g // span) * span
                    for k in range(base, base + span):
                        mk = (m0g & (o2g == k)).astype(dtype)
                        for cc in range(3):
                            gat = jnp.take_along_axis(
                                cols[cc][k * 8 : (k + 1) * 8], lg, axis=1
                            )
                            ag[cc] = ag[cc] + gat * mk
                    for cc in range(3):
                        row = slice(cc * j + g * 8, cc * j + (g + 1) * 8)
                        acc_ref[row, :] = acc_ref[row, :] + ag[cc]
                return 0

            jax.lax.fori_loop(w0, w1, body, 0)
            for cc in range(3):
                red = jnp.sum(acc_ref[cc * j : (cc + 1) * j, :], axis=0)
                o_ref[cc, pl.ds(h * 128, 128)] = (
                    o_ref[cc, pl.ds(h * 128, 128)] + red
                )


def gb_kernel_only(pair_T, wl, bases, off, ilF, o2F, span):
    _, j, n_pad = pair_T.shape
    n_tiles = n_pad // TN
    return pl.pallas_call(
        functools.partial(_gb_kernel_k, j=j, nb=NB, span=span),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, NB),
            in_specs=[
                pl.BlockSpec((1, 2, wl.shape[-1]), lambda t, b, P: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec((1, 2, NB + 1), lambda t, b, P: (t, 0, 0),
                             memory_space=pltpu.MemorySpace.SMEM),
                pl.BlockSpec((3, j, BC * 128), lambda t, b, P: (0, 0, P[t * NB + b])),
                pl.BlockSpec((j, TN), lambda t, b, P: (0, t)),
                pl.BlockSpec((j, TN), lambda t, b, P: (0, t)),
            ],
            out_specs=pl.BlockSpec((3, TN), lambda t, b, P: (0, t)),
            scratch_shapes=[pltpu.VMEM((3 * j, 128), pair_T.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), pair_T.dtype),
    )(bases, wl, off, pair_T, ilF, o2F)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    J = 64
    m = make_mtp(16, species_count=1, seed=0)
    model = MTPModel.from_data(m, dtype=jnp.float32)
    pos0, types0, cell = make_lattice("fcc", 4.0, (reps, reps, reps))
    rng = np.random.default_rng(1)
    pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
    celld = jnp.asarray(cell, jnp.float32)
    types = jnp.asarray(types0, jnp.int32)
    grid = grid_shape(cell, model.cutoff + 0.6)
    n = pos.shape[0]
    print("N", n, flush=True)
    swl = jax.jit(lambda p: build_sorted_neighbor_list(
        p, celld, model.cutoff + 0.6, max_neighbors=J, grid=grid,
        align_slots=True))(pos)
    jax.block_until_ready(swl.idx)
    print("overflow:", bool(swl.overflow), flush=True)
    consts = window_constants(model.schedule, model.coeffs, types, swl, jnp.float32)
    sched, coeffs = model.schedule, model.coeffs
    n_pad = swl.idx.shape[0]
    pos_s = jnp.pad(_gather_rows3(pos, swl.order), ((0, n_pad - n), (0, 0)))
    dispT = jax.jit(window_disp)(pos_s, swl.window_idx, swl.wl, swl.wl_counts, celld)
    d2 = dispT[0] ** 2 + dispT[1] ** 2 + dispT[2] ** 2
    maskf = jnp.where((d2 <= sched.max_dist**2) & consts["pair_valid_t"], 1.0,
                      0.0).astype(jnp.float32)

    def fwd_bwd(dT, mf):
        site_e, vjp = jax.vjp(
            lambda d: site_energies_mega(
                sched, d, mf, consts["it_row"], consts["jtypes_t"],
                coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"],
                consts["esp"]),
            dT)
        (pair_tT,) = vjp(jnp.ones_like(site_e))
        return site_e, pair_tT

    _, pair_tT = jax.jit(fwd_bwd)(dispT, maskf)
    jax.block_until_ready(pair_tT)

    def bench(label, fn, x0, *args):
        @jax.jit
        def run(x, *a):
            def step(c, i):
                o = fn(x + i.astype(x.dtype) * jnp.asarray(1e-30, x.dtype), *a)
                leaf = jax.tree_util.tree_leaves(o)[0]
                return c + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None
            out, _ = jax.lax.scan(step, 0.0, jnp.arange(K, dtype=jnp.int32))
            return out
        float(run(x0, *args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0, *args))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best / K * 1e3:.2f} ms/iter", flush=True)

    gb = swl.gb
    for span in (8, 4, 2, 1):
        bench(
            f"gb kernel span={span}",
            lambda pT, wl, ba, of, il, o2, s=span: gb_kernel_only(
                pT, wl, ba, of, il, o2, s
            ),
            pair_tT, swl.wl, gb["bases"], gb["off"], gb["ilF"], gb["o2F"],
        )

    # spill-order experiment: src-sorted vs dst-sorted pick lists. The
    # production lists are dst-sorted (flat key row*J+slot); at a 768MB
    # table, page locality of the PICKS may matter even though index
    # locality didn't at 2M x 32B.
    sp_src = np.asarray(gb["sp_src"])
    sp_dst = np.asarray(gb["sp_dst"])
    o = np.argsort(sp_src, kind="stable")
    src_s = jnp.asarray(sp_src[o])
    dst_s = jnp.asarray(sp_dst[o])

    def spills(pT, src, dst):
        valid = src < J * n_pad
        s = jnp.where(valid, src, 0)
        flat = pT.reshape(3, J * n_pad)
        vals = flat[:, s] * valid[None].astype(jnp.float32)
        return jnp.zeros((n_pad + 1, 3), jnp.float32).at[dst].add(vals.T)

    bench("spills dst-sorted", spills, pair_tT, gb["sp_src"], gb["sp_dst"])
    bench("spills src-sorted", spills, pair_tT, src_s, dst_s)


if __name__ == "__main__":
    main()
