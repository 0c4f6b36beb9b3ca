"""Measure giveback-kernel cost vs NB (band-grid width) at 1M.

NB slices of the meta tables give a TIMING-only variant (results invalid
when real bands exceed the slice) — tells us whether padded band steps
cost anything before investing in adaptive NB."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import MTPModel, _gather_rows3, window_constants
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops.pallas_moments import site_energies_mega
from mtp_tpu.ops.window_disp import window_disp
from mtp_tpu.ops.window_giveback import NB, window_giveback

K = 8
J = 64
m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos0, types0, cell = make_lattice("fcc", 4.0, (63, 63, 63))
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
types = jnp.asarray(types0, jnp.int32)
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

# actual band counts (recompute from off: count of strictly-increasing
# boundaries is not stored; derive from bases: first occurrence pattern)
bases = np.asarray(swl.gb["bases"]).reshape(nt, NB)
nbands = (np.diff(bases, axis=1) != 0).sum(1) + 1
print(f"N={n} n_tiles={nt} bands: max={nbands.max()} mean={nbands.mean():.1f}",
      flush=True)

consts = window_constants(model.schedule, model.coeffs, types, swl, jnp.float32)
sched, coeffs = model.schedule, model.coeffs
pos_s = jnp.pad(_gather_rows3(pos, swl.order), ((0, n_pad - n), (0, 0)))
dispT = jax.jit(window_disp)(pos_s, swl.window_idx, swl.wl, swl.wl_counts, celld)
d2 = dispT[0] ** 2 + dispT[1] ** 2 + dispT[2] ** 2
maskf = jnp.where(
    (d2 <= sched.max_dist**2) & consts["pair_valid_t"], 1.0, 0.0
).astype(jnp.float32)


def fwd_bwd(dT, mf, cst):
    site_e, vjp = jax.vjp(
        lambda d: site_energies_mega(
            sched, d, mf, cst["it_row"], cst["jtypes_t"],
            coeffs.radial_coeffs.astype(jnp.float32), cst["xi_full"], cst["esp"],
        ),
        dT,
    )
    return vjp(jnp.ones_like(site_e))[0]


pair_tT = jax.jit(fwd_bwd)(dispT, maskf, consts)
jax.block_until_ready(pair_tT)


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


def sliced_meta(nb):
    g = swl.gb
    b = g["bases"].reshape(nt, NB)[:, :nb].reshape(-1)
    off = jnp.concatenate([g["off"][:, :, :nb], g["off"][:, :, -1:]], axis=-1)
    return dict(bases=b, off=off, ilF=g["ilF"], o2F=g["o2F"],
                sp_dst=g["sp_dst"], sp_src=g["sp_src"], covered=g["covered"])


bench("giveback NB=32 (full, new spills)",
      lambda pT, wl, gb: window_giveback(pT, wl, gb), pair_tT, swl.wl, swl.gb)
for nb in (16, 12):
    bench(f"giveback NB={nb} (timing only)",
          lambda pT, wl, gb: window_giveback(pT, wl, gb),
          pair_tT, swl.wl, sliced_meta(nb))
