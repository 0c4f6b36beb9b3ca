"""Probe Mosaic support for the give-back kernel's constructs:
grid (tiles, bands); band source block via scalar-prefetch index_map;
dual-axis dynamic in-VMEM slice; take_along gather; dynamic fori from SMEM
offsets; revisited accumulating output."""
import functools
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT, NB, J, TN, BC = 4, 3, 16, 256, 4
N = NT * TN
NSC = N // (128 * BC)  # superchunks


def kernel(bases_ref, off_ref, wl_ref, sc_ref, il_ref, cd_ref, o_ref, acc_ref):
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    sc = bases_ref[0, b]
    for g in range(J // 8):
        for h in range(2):
            il = il_ref[g * 8 : (g + 1) * 8, h * 128 : (h + 1) * 128]
            cd = cd_ref[g * 8 : (g + 1) * 8, h * 128 : (h + 1) * 128]
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def body(w, _, il=il, cd=cd, sc=sc):
                item = wl_ref[0, g, h, w]
                ci = (item // 8) % BC
                o2 = item % 8
                lane = il - (sc * BC + ci) * 128
                m = cd == item
                lane_c = jnp.where(m, jnp.where((lane >= 0) & (lane < 128), lane, 0), 0)
                slab = sc_ref[0, pl.ds(o2 * 8, 8), pl.ds(ci * 128, 128)]
                gat = jnp.take_along_axis(slab, lane_c, axis=1)
                acc_ref[...] = acc_ref[...] + jnp.where(m, gat, 0.0)
                return 0

            jax.lax.fori_loop(off_ref[0, g, h, b], off_ref[0, g, h, b + 1], body, 0)
            red = jnp.sum(acc_ref[...], axis=0)  # (128,)
            o_ref[0, pl.ds(h * 128, 128)] = o_ref[0, pl.ds(h * 128, 128)] + red


def run():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1, J, N)).astype(np.float32)
    # destination picks: each (slot s, atom a) picks (src_row r, src_col j)
    # with r % 8 == s % 8 (the aligned condition, flip pre-applied)
    jcol = rng.integers(0, N, size=(J, N)).astype(np.int32)
    o2 = rng.integers(0, J // 8, size=(J, N)).astype(np.int32)
    s8 = (np.arange(J) % 8)[:, None]
    r = o2 * 8 + s8
    expect = np.zeros((1, N), np.float32)
    for s in range(J):
        expect[0, np.arange(N)] += src[0, r[s], jcol[s]]

    # metadata: per tile, bands = sorted distinct superchunks of its picks
    chunks = jcol // 128
    codes = (chunks % BC + (chunks // BC) * BC) * 0  # placeholder
    bases = np.zeros((NT, NB), np.int32)
    wl = np.full((NT, J // 8, 2, 64), 0, np.int32)
    off = np.zeros((NT, J // 8, 2, NB + 1), np.int32)
    cdF = np.zeros((NT, J, TN), np.int32)
    for t in range(NT):
        cols = jcol[:, t * TN : (t + 1) * TN]
        sc_t = np.unique(cols // (128 * BC))
        assert len(sc_t) <= NB, len(sc_t)
        base_list = np.concatenate([sc_t, np.repeat(sc_t[:1], NB - len(sc_t))])
        bases[t] = np.sort(base_list)
        sc_rank = {v: i for i, v in enumerate(bases[t])}
        for g in range(J // 8):
            for h in range(2):
                blk_cols = jcol[g * 8 : (g + 1) * 8, t * TN + h * 128 : t * TN + h * 128 + 128]
                blk_o2 = o2[g * 8 : (g + 1) * 8, t * TN + h * 128 : t * TN + h * 128 + 128]
                b_of = np.vectorize(lambda c: sc_rank[c // (128 * BC)])(blk_cols)
                ci = (blk_cols // 128) % BC
                code = ((b_of * BC + ci) * 8 + blk_o2).astype(np.int32)
                cdF[t, g * 8 : (g + 1) * 8, h * 128 : h * 128 + 128] = code
                u = np.unique(code)
                wl[t, g, h, : len(u)] = u
                bands_of_items = u // (8 * BC)
                for b in range(NB + 1):
                    off[t, g, h, b] = (bands_of_items < b).sum()

    ilF = jcol.reshape(J, NT, TN).transpose(1, 0, 2).copy()  # (NT, J, TN)
    cd3 = cdF

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT, NB),
        in_specs=[
            pl.BlockSpec((1, J // 8, 2, NB + 1), lambda t, b, P: (t, 0, 0, 0),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((1, J // 8, 2, 64), lambda t, b, P: (t, 0, 0, 0),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((1, J, BC * 128), lambda t, b, P: (0, 0, P[t, b])),
            pl.BlockSpec((J, TN), lambda t, b, P: (t, 0)),  # hmm il (NT*J? no)
            pl.BlockSpec((J, TN), lambda t, b, P: (t, 0)),
        ],
        out_specs=pl.BlockSpec((1, TN), lambda t, b, P: (0, t)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    # il/cd shaped (NT*J, TN) blocks index (t,0)
    il_in = ilF.reshape(NT * J, TN)
    cd_in = cd3.reshape(NT * J, TN)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )(jnp.asarray(bases), jnp.asarray(off), jnp.asarray(wl),
      jnp.asarray(src), jnp.asarray(il_in), jnp.asarray(cd_in))
    err = np.abs(np.asarray(out) - expect).max()
    print("max err:", err)
    assert err < 1e-5
    print("PROBE OK")


run()
