"""End-of-round-3 32k step decomposition (all optimizations in)."""
import dataclasses
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import (
    MTPModel, _gather_rows3, _window_forces_from_pairs, window_constants,
)
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops.pallas_moments import pair_forces_mega, site_energies_mega
from mtp_tpu.ops.window_disp import window_disp
from mtp_tpu.ops.window_giveback import window_giveback

K = 20
J = 64
m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos0, types0, cell = make_lattice("fcc", 4.0, (20, 20, 20))
rng = np.random.default_rng(1)
pos = jnp.asarray(pos0 + rng.normal(0, 0.1, pos0.shape), jnp.float32)
celld = jnp.asarray(cell, jnp.float32)
grid = grid_shape(cell, model.cutoff + 0.6)
n = pos.shape[0]
swl = jax.jit(lambda p: build_sorted_neighbor_list(
    p, celld, model.cutoff + 0.6, max_neighbors=J, grid=grid, align_slots=True))(pos)
jax.block_until_ready(swl.idx)
consts = window_constants(model.schedule, model.coeffs,
                          jnp.asarray(types0, jnp.int32), swl, jnp.float32)
sched, coeffs = model.schedule, model.coeffs
n_pad = swl.idx.shape[0]
pos_s = jnp.pad(_gather_rows3(pos, swl.order), ((0, n_pad - n), (0, 0)))
dispT = jax.jit(window_disp)(pos_s, swl.window_idx, swl.wl, swl.wl_counts, celld)
d2 = dispT[0]**2 + dispT[1]**2 + dispT[2]**2
maskf = jnp.where((d2 <= sched.max_dist**2) & consts["pair_valid_t"], 1.0, 0.0).astype(jnp.float32)
pair_tT = jax.jit(lambda dT, mf: pair_forces_mega(
    sched, dT, mf, consts["it_row"], consts["jtypes_t"],
    coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"]))(dispT, maskf)
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
    print(f"{label}: {best / K * 1e3:.3f} ms/iter", flush=True)


bench("window_disp", lambda p, s: window_disp(p, s.window_idx, s.wl, s.wl_counts, celld), pos_s, swl)
bench("d2+mask", lambda dT, pv: jnp.where((dT[0]**2+dT[1]**2+dT[2]**2 <= sched.max_dist**2) & pv, 1., 0.).astype(jnp.float32), dispT, consts["pair_valid_t"])
bench("mega bwd (pair_forces)", lambda dT, mf: pair_forces_mega(
    sched, dT, mf, consts["it_row"], consts["jtypes_t"],
    coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"]), dispT, maskf)
bench("giveback (kernel+spills)", lambda pT, s: window_giveback(pT, s.wl, s.gb), pair_tT, swl)
bench("f_own sum", lambda pT: jnp.sum(pT, axis=1), pair_tT)
bench("mega fwd HIGHEST (per-block energy)", lambda dT, mf: site_energies_mega(
    sched, dT, mf, consts["it_row"], consts["jtypes_t"],
    coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"], consts["esp"]), dispT, maskf)
