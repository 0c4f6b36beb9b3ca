"""On-device kernel smoke gate (VERDICT r2 item 10).

Asserts, ON THE REAL TPU, that every Pallas kernel (megakernel fwd+bwd, the
r1 fused pair kernels, window_disp, window_giveback + spill path) compiles
under Mosaic and agrees with the XLA path — the interpreter-mode CPU tests
can't catch Mosaic-only failures (alignment rules, SMEM budgets, layout
crashes; see CLAUDE.md). Run BEFORE benches:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py

Analog of the reference's host-fallback cross-check (pair_mtp_kokkos.cpp:
200-205: the same input through the scalar CPU path validates the device
pipeline). Exits nonzero on any mismatch. ~1 min warm (compile cache).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    if jax.default_backend() != "tpu":
        print("tpu_smoke: no TPU backend — nothing to gate", file=sys.stderr)
        return 1

    from mtp_tpu.io.basis_gen import make_mtp
    from mtp_tpu.md.simulation import Simulation, make_lattice
    from mtp_tpu.md.state import init_state, thermalize
    from mtp_tpu.models.mtp import MTPModel
    from mtp_tpu.ops.neighbors import grid_shape

    m = make_mtp(16, species_count=2, seed=0)
    model = MTPModel.from_data(m, dtype=jnp.float32)
    # (6,6,6) fcc = 864 atoms: grid (4,4,4) >= 3 so the window path engages;
    # n_pad = 1024 = 4 tiles exercises multi-tile grids and the spill path
    pos, types, cell = make_lattice("fcc", 4.0, (6, 6, 6), type_pattern=(0, 1))
    n = len(pos)
    state = thermalize(
        jax.random.PRNGKey(0),
        init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32),
        300.0,
    )
    grid = grid_shape(cell, model.cutoff + 0.6)

    def forces_of(**kw):
        sim = Simulation(model, max_neighbors=56, skin=0.6,
                         compute_virial=True, **kw)
        nl = sim.rebuild(state, grid=grid, max_neighbors=56)
        st = sim.refresh_forces(state, nl)
        jax.block_until_ready(st.forces)
        assert not bool(nl.overflow), f"overflow in {kw}"
        return sim, nl, st

    sim_x, nl_x, st_x = forces_of(backend="xla", window=False)
    cases = {
        "megakernel (r1 pallas backend)": dict(backend="pallas", window=False),
        "window_disp + megakernel": dict(window=True, giveback=False),
        "window + giveback kernels": dict(window=True, giveback=True),
    }
    fx = np.asarray(st_x.forces)
    ok = True
    for name, kw in cases.items():
        sim, nl, st = forces_of(**kw)
        f = np.asarray(st.forces)
        df = float(np.max(np.abs(f - fx)))
        de = abs(float(st.potential_energy) - float(st_x.potential_energy)) / n
        dv = float(
            np.max(np.abs(np.asarray(st.virial) - np.asarray(st_x.virial)))
        )
        good = df < 5e-4 and de < 1e-6 and dv < 5e-2
        ok &= good
        print(f"{name}: max|dF|={df:.2e} dE/atom={de:.2e} max|dW|={dv:.2e} "
              f"{'OK' if good else 'FAIL'}")

        # scan-amortized timing sanity (never benchmark one call through
        # the tunnel: ~30 ms dispatch floor)
        st2, _, stale = sim.steps(st, 0, nl, n_steps=50, dt=0.001)
        float(jnp.sum(st2.positions))
        t0 = time.perf_counter()
        st2, _, stale = sim.steps(st, 0, nl, n_steps=50, dt=0.001)
        float(jnp.sum(st2.positions))
        dt_ms = (time.perf_counter() - t0) / 50 * 1e3
        print(f"  50-step scan: {dt_ms:.2f} ms/step")

    # the fused candidates kernel (grade-step path) vs the XLA candidate
    # path ON DEVICE — new kernels must prove themselves under Mosaic, not
    # just interpret mode (the dot-precision bias was invisible on CPU)
    from mtp_tpu.al.grades import candidates_and_forces, candidates_and_forces_window
    from mtp_tpu.models.mtp import _gather_rows3, _gather_scalar, window_constants

    swl = sim_x.rebuild(state, grid=grid, max_neighbors=56)
    if not hasattr(swl, "order"):
        from mtp_tpu.ops.neighbors import build_sorted_neighbor_list

        swl = build_sorted_neighbor_list(
            state.positions, state.cell, model.cutoff + 0.6,
            max_neighbors=56, grid=grid, align_slots=True,
        )
    consts = window_constants(
        model.schedule, model.coeffs, state.types, swl, jnp.float32
    )
    out_w = candidates_and_forces_window(
        model.schedule, model.coeffs, state.positions, state.cell, swl,
        **consts,
    )
    n_pad = swl.idx.shape[0]
    pos_s = jnp.pad(
        _gather_rows3(state.positions, swl.order), ((0, n_pad - n), (0, 0))
    )
    types_s = jnp.pad(_gather_scalar(state.types, swl.order), (0, n_pad - n))
    out_ref = candidates_and_forces(
        model.schedule, model.coeffs, pos_s, types_s, swl.idx, state.cell,
        swl.mirror, row_valid=jnp.arange(n_pad) < n,
    )
    db = float(jnp.max(jnp.abs(out_w["b"] - out_ref["b"])))
    dfc = float(jnp.max(jnp.abs(
        out_w["forces"] - _gather_rows3(out_ref["forces"], swl.inv_order)
    )))
    good = db < 1e-4 and dfc < 5e-4
    ok &= good
    print(f"candidates megakernel: max|db|={db:.2e} max|dF|={dfc:.2e} "
          f"{'OK' if good else 'FAIL'}")

    # integrator/geometry transform exactness ON DEVICE: XLA lowers even
    # (N,3)@(3,3) to the MXU, whose default precision rounds f32 operands
    # (measured 0.5 A on `pos @ eye` for a 252 A box — would corrupt the
    # aniso-NPT drift and the cell-bin assignment). The production paths
    # use unrolled/HIGHEST forms; this check fails if a plain `@` sneaks
    # back in (scratch/probe_precision.py for the measurements).
    from mtp_tpu.md import integrators as itg

    rng = np.random.default_rng(1)
    p64 = rng.uniform(0, 252.0, (4096, 3))
    e64 = np.eye(3) + rng.normal(0, 1e-5, (3, 3))
    p32 = jnp.asarray(p64, jnp.float32)
    e32 = jnp.asarray(e64, jnp.float32)
    drift = np.asarray(jax.jit(itg._xm3)(p32, e32), np.float64)
    dmax = np.abs(drift - p64 @ e64).max()
    cell_t = np.asarray(jax.jit(itg._mm3)(jnp.asarray(e64 * 252.0, jnp.float32),
                                          e32), np.float64)
    cmax = np.abs(cell_t - (e64 * 252.0) @ e64).max()
    good = dmax < 5e-4 and cmax < 5e-4
    ok &= good
    print(f"integrator transforms: max|dr|={dmax:.2e} max|dh|={cmax:.2e} "
          f"{'OK' if good else 'FAIL'}")

    # df32 accuracy mode: the error-free transforms (two_sum / two_prod)
    # must be EXACT on the VPU — they rely on correctly-rounded f32 +,-,*
    # and on XLA not algebraically simplifying the cancellation patterns.
    # If either assumption breaks (compiler flag change, fast-math sneaking
    # in), the df32 backend silently degrades to fp32 accuracy; this gate
    # catches it on device (CPU tests compile through a different backend).
    from mtp_tpu.ops import df32 as dfm

    a = rng.uniform(-100, 100, 8192).astype(np.float32)
    b = rng.uniform(-100, 100, 8192).astype(np.float32)

    @jax.jit
    def eft(a, b):
        s, e = dfm.two_sum(a, b)
        p, q = dfm.two_prod(a, b)
        return s, e, p, q

    s, e, p, q = [np.asarray(x, np.float64)
                  for x in eft(jnp.asarray(a), jnp.asarray(b))]
    ts_ok = np.array_equal(s + e, a.astype(np.float64) + b.astype(np.float64))
    tp_ok = np.array_equal(p + q, a.astype(np.float64) * b.astype(np.float64))
    good = ts_ok and tp_ok
    ok &= good
    print(f"df32 error-free transforms: two_sum={'exact' if ts_ok else 'BROKEN'} "
          f"two_prod={'exact' if tp_ok else 'BROKEN'} {'OK' if good else 'FAIL'}")

    print("tpu_smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
