"""1M step decomposition + transpose variants (scan-amortized)."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel, window_constants
from mtp_tpu.ops.neighbors import grid_shape
from mtp_tpu.ops.pallas_moments import site_energies_mega
from mtp_tpu.ops.window_disp import window_disp
from mtp_tpu.ops.window_giveback import window_giveback

K = 20


def _sync(o):
    return float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))


def bench(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/K*1e3:.2f} ms/iter", flush=True)
    return out


# --- transpose variants at (1M, 64) int32 ---
N, J = 1_000_192, 64
rng = np.random.default_rng(0)
w = jnp.asarray(rng.integers(0, N, (N, J)).astype(np.int32))


def scan_k(body):
    def fn(x):
        def step(c, i):
            return c, body(x + i)[0, :8]
        _, o = jax.lax.scan(step, 0, jnp.arange(K, dtype=jnp.int32))
        return o
    return fn


bench("transpose int32 (1M,64)->(64,1M)", scan_k(lambda x: x.T + 0), w)
bench("transpose via f32 bitcast", scan_k(
    lambda x: jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.float32).T + 0.0, jnp.int32)), w)

# --- step pieces at 1M ---
model = MTPModel.from_data(make_mtp(16, species_count=1, seed=0), dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (63, 63, 63))
n = len(pos)
state = thermalize(
    jax.random.PRNGKey(0),
    init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32), 300.0)
sim = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, giveback=True)
grid = grid_shape(cell, model.cutoff + 0.6)
swl = sim.rebuild(state, grid=grid, max_neighbors=64)
jax.block_until_ready(swl.idx)
print("overflow:", bool(swl.overflow))
consts = window_constants(model.schedule, model.coeffs, state.types, swl, jnp.float32)
n_pad = swl.idx.shape[0]
pos_s = state.positions[swl.order]
pos_s = jnp.pad(pos_s, ((0, n_pad - n), (0, 0)))
sched, coeffs = model.schedule, model.coeffs


def scan_pos(body):
    def fn(p):
        def step(c, i):
            return c, body(p + i * 1e-7)
        _, o = jax.lax.scan(step, 0, jnp.arange(K, dtype=jnp.float32))
        return o
    return fn


cellj = state.cell
bench("disp kernel x20", scan_pos(
    lambda p: window_disp(p, swl.window_idx, swl.wl, swl.wl_counts, cellj)[0, 0, :8]), pos_s)


dispT0 = window_disp(pos_s, swl.window_idx, swl.wl, swl.wl_counts, cellj)
jax.block_until_ready(dispT0)
maskf0 = jnp.where(
    (dispT0[0]**2 + dispT0[1]**2 + dispT0[2]**2 <= sched.max_dist**2)
    & consts["pair_valid_t"], 1.0, 0.0).astype(jnp.float32)


def mega_fwd_bwd(dT):
    site_e, vjp = jax.vjp(
        lambda d: site_energies_mega(
            sched, d, maskf0, consts["it_row"], consts["jtypes_t"],
            coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"],
            consts["esp"]),
        dT)
    (pair_tT,) = vjp(jnp.ones_like(site_e))
    return pair_tT[0, 0, :8]


def scan_disp(body):
    def fn(d):
        def step(c, i):
            return c, body(d + i * 1e-9)
        _, o = jax.lax.scan(step, 0, jnp.arange(K, dtype=jnp.float32))
        return o
    return fn


bench("megakernel fwd+bwd x20", scan_disp(mega_fwd_bwd), dispT0)

site_e, vjp = jax.vjp(
    lambda d: site_energies_mega(
        sched, d, maskf0, consts["it_row"], consts["jtypes_t"],
        coeffs.radial_coeffs.astype(jnp.float32), consts["xi_full"],
        consts["esp"]),
    dispT0)
(pair_tT0,) = vjp(jnp.ones_like(site_e))
jax.block_until_ready(pair_tT0)

bench("giveback kernel x20", scan_disp(
    lambda pt: window_giveback(pt, swl.wl, swl.gb)[0, :8]), pair_tT0)


def assembly(pt):
    f_own = jnp.sum(pt, axis=1)
    f_give = window_giveback(pt, swl.wl, swl.gb)
    forces_s = (f_own - f_give).T
    from mtp_tpu.models.mtp import _gather_rows3
    return _gather_rows3(forces_s, swl.inv_order)[0]


bench("giveback + assembly x20", scan_disp(assembly), pair_tT0)
