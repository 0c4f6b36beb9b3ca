"""1M force-eval decomposition: giveback vs mirror, assembly pieces.

Each piece amortized in a K-iteration lax.scan. The scanned function's
FIRST float arg is perturbed by the loop counter (`x + i * eps`) so XLA
cannot hoist the loop-invariant computation out of the scan (it does —
measured 4-8x fake speedups without this)."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.models.mtp import (
    MTPModel,
    _gather_rows3,
    mtp_energy_forces_window,
    window_constants,
)
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops.pallas_moments import site_energies_mega
from mtp_tpu.ops.window_disp import window_disp
from mtp_tpu.ops.window_giveback import window_giveback

K = 8
reps = (63, 63, 63)
J = 64
m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos0, types0, cell = make_lattice("fcc", 4.0, reps)
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
types = jnp.asarray(types0, jnp.int32)
cutoff = model.cutoff  # 5.0
grid = grid_shape(cell, cutoff + 0.6)
n = pos.shape[0]
print("N", n, "grid", grid, flush=True)

swl = jax.jit(
    lambda p: build_sorted_neighbor_list(
        p, celld, cutoff + 0.6, max_neighbors=J, grid=grid, align_slots=True
    )
)(pos)
jax.block_until_ready(swl.idx)
print("overflow:", bool(swl.overflow), flush=True)
consts = window_constants(model.schedule, model.coeffs, types, swl, jnp.float32)
sched, coeffs = model.schedule, model.coeffs
n_pad = swl.idx.shape[0]


def bench(label, fn, x0, *args):
    """fn(x, *args); x is perturbed per scan iteration (anti-hoist)."""

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


pos_s = _gather_rows3(pos, swl.order)
pos_s = jnp.pad(pos_s, ((0, n_pad - n), (0, 0)))
dispT = jax.jit(window_disp)(pos_s, swl.window_idx, swl.wl, swl.wl_counts, celld)
jax.block_until_ready(dispT)
d2 = dispT[0] ** 2 + dispT[1] ** 2 + dispT[2] ** 2
maskf = jnp.where((d2 <= sched.max_dist**2) & consts["pair_valid_t"], 1.0, 0.0).astype(jnp.float32)


def fwd_bwd(dT, mf):
    site_e, vjp = jax.vjp(
        lambda d: site_energies_mega(
            sched, d, mf, consts["it_row"], consts["jtypes_t"],
            coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"],
            consts["esp"],
        ),
        dT,
    )
    (pair_tT,) = vjp(jnp.ones_like(site_e))
    return site_e, pair_tT


_, pair_tT = jax.jit(fwd_bwd)(dispT, maskf)
jax.block_until_ready(pair_tT)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "pieces"):
    bench("pos gather + pad", lambda p: jnp.pad(_gather_rows3(p, swl.order), ((0, n_pad - n), (0, 0))), pos)
    bench("window_disp", lambda p: window_disp(p, swl.window_idx, swl.wl, swl.wl_counts, celld), pos_s)
    bench("d2+mask", lambda dT: jnp.where((dT[0]**2 + dT[1]**2 + dT[2]**2 <= sched.max_dist**2) & consts["pair_valid_t"], 1.0, 0.0).astype(jnp.float32), dispT)
    bench("megakernel fwd+bwd", fwd_bwd, dispT, maskf)
    bench("f_own sum", lambda pT: jnp.sum(pT, axis=1), pair_tT)
    bench("window_giveback (kernel+spills)", lambda pT: window_giveback(pT, swl.wl, swl.gb), pair_tT)

    def spills_only(pT):
        flat = jnp.concatenate([pT.reshape(3, J * n_pad), jnp.zeros((3, 1), jnp.float32)], axis=1)
        vals = flat[:, swl.gb["sp_src"]]
        extra = jnp.zeros((n_pad + 1, 3), jnp.float32).at[swl.gb["sp_dst"]].add(vals.T)
        return extra

    bench("spills only", spills_only, pair_tT)
    bench("inv_order gather", lambda f: _gather_rows3(f, swl.inv_order), pos_s)

if which in ("all", "full"):
    import dataclasses

    def full_gb(p):
        return mtp_energy_forces_window(
            sched, coeffs, p, celld, swl, compute_virial=False, **consts
        )["forces"]

    swl_nogb = dataclasses.replace(swl, gb=None)

    def full_mirror(p):
        return mtp_energy_forces_window(
            sched, coeffs, p, celld, swl_nogb, compute_virial=False, **consts
        )["forces"]

    bench("FULL force eval (giveback)", full_gb, pos)
    bench("FULL force eval (mirror)", full_mirror, pos)
