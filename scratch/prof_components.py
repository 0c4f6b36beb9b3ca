"""Scan-amortized per-component timings of the giveback-path force step
at 32k x J=64: disp kernel, megakernel fwd, megakernel bwd, giveback
kernel, spills, full force fn."""
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

ITERS = 40

m = make_mtp(16, species_count=1, seed=0)
model = MTPModel.from_data(m, dtype=jnp.float32)
pos, types, cell = make_lattice("fcc", 4.0, (20, 20, 20))
n = len(pos)
state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
state = thermalize(jax.random.PRNGKey(0), state, 300.0)
sim = Simulation(model, max_neighbors=64, skin=0.6, steps_per_rebuild=30,
                 compute_virial=False, window=True, giveback=True)
grid = grid_shape(cell, model.cutoff + 0.6)
state, _, ovf = sim.run_async(state, 30, ensemble="nve", dt=0.001)
float(jnp.sum(state.positions)); assert not bool(ovf)
swl = sim.rebuild(state, grid=grid, max_neighbors=64)
jax.block_until_ready(swl.idx)
sched = model.schedule
coeffs = model.coeffs
consts = window_constants(sched, coeffs, state.types, swl, jnp.float32)
celld = state.cell

pos_s = state.positions[swl.order]
dispT0 = window_disp(pos_s, swl.window_idx, swl.wl, swl.wl_counts, celld)
d2 = dispT0[0]**2 + dispT0[1]**2 + dispT0[2]**2
maskf = jnp.where((d2 <= sched.max_dist**2) & consts["pair_valid_t"], 1.0, 0.0).astype(jnp.float32)
rc = coeffs.radial_coeffs.astype(jnp.float32)


def scan_bench(label, fn, x0):
    @jax.jit
    def run(x):
        def one(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(one, x0, None, length=ITERS)
        return jnp.sum(c[0] if isinstance(c, tuple) else c)
    float(run(x0))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/ITERS*1e3:.3f} ms")


# 1. disp kernel (positions perturbed each iter to avoid CSE)
scan_bench("window_disp", lambda p: window_disp(p * 1.0000001, swl.window_idx, swl.wl, swl.wl_counts, celld)[:, 0, :n].T * 1e-9 + p, pos_s)

# 2. megakernel fwd only
def mk_fwd(dT):
    e = site_energies_mega(sched, dT, maskf, consts["it_row"], consts["jtypes_t"], rc, consts["xi_full"], consts["esp"])
    return dT * 0.9999999 + e[None, None, :] * 1e-12
scan_bench("megakernel fwd", mk_fwd, dispT0)

# 3. megakernel fwd+bwd (pair_T)
def mk_fb(dT):
    e, vjp = jax.vjp(lambda d: site_energies_mega(sched, d, maskf, consts["it_row"], consts["jtypes_t"], rc, consts["xi_full"], consts["esp"]), dT)
    (pT,) = vjp(jnp.ones_like(e))
    return dT * 0.9999999 + pT * 1e-12
scan_bench("megakernel fwd+bwd", mk_fb, dispT0)

# 4. giveback kernel (incl spills)
pair_T0 = jax.random.normal(jax.random.PRNGKey(1), dispT0.shape, jnp.float32)
def gb(pT):
    g = window_giveback(pT, swl.wl, swl.gb)
    return pT * 0.9999999 + g[:, None, :] * 1e-12
scan_bench("giveback kernel+spills", gb, pair_T0)

# 5. full force fn
ff = sim.force_fn_window(swl, state.types, compute_virial=False)
def full(p):
    f, e, v = ff(p, None, celld)
    return p * 0.9999999 + f * 1e-9
scan_bench("FULL force fn", full, state.positions)
