"""Accuracy gate at bench scale: fp32 TPU forces/energy vs the f64 oracle.

BASELINE.md's gate is <1e-6 eV/atom energy AND force parity vs MLIP-3. The
f64 oracle chain: utils/golden.py (loop-level reference-spec transcription)
== XLA f64 path to ~1e-11 at small N (tests/test_model.py), so the XLA f64
CPU evaluation IS the oracle at sizes where the Python-loop golden engine is
infeasible (32k would take hours).

Usage:
    python tools/accuracy_gate.py          # full: oracle subprocess + fp32
    python tools/accuracy_gate.py --oracle # (internal) f64 CPU oracle only
    python tools/accuracy_gate.py --df32   # double-float accuracy mode
    python tools/accuracy_gate.py --fp32-cpu  # plain-f32-math floor (no TPU)

Writes /tmp/acc_gate_oracle.npz from the subprocess, prints one JSON line
with max|dF|, RMS dF, dE/atom (both naive-fp32 and f64-host-summed), and
the force scale for context. Run on the TPU host for the production-path
numbers; falls back to fp32-on-CPU if no TPU.
"""

import json
import os
import subprocess
import sys

import numpy as np

CFG = dict(level=16, reps=(20, 20, 20), a=4.0, seed=0, temperature=300.0)
ORACLE_NPZ = "/tmp/acc_gate_oracle.npz"


def _config_positions():
    """The bench config, thermally displaced: deterministic positions shared
    by both processes (displacements minted on the host, NOT by running MD,
    so oracle and fp32 process see bitwise-identical inputs).

    Positions/cell are rounded to f32 ONCE here, so the oracle evaluates at
    exactly the configuration the fp32 path sees — the gate then measures
    the EVALUATOR's arithmetic error, not the f32 representation error of
    the coordinates (~ulp(252 A) = 1.5e-5 A, which maps to ~1.5e-5 eV/A of
    force perturbation at this stiffness and would swamp the df32 path's
    ~1e-7). The representation error is a property of storing coordinates
    in f32 at 252 A box scale, shared by every f32 consumer of the same
    snapshot; evaluator parity (this gate, = the reference's MLIP-3 parity
    methodology) is measured at a representable configuration."""
    from mtp_tpu.md.simulation import make_lattice

    pos, types, cell = make_lattice("fcc", CFG["a"], CFG["reps"])
    rng = np.random.default_rng(CFG["seed"])
    # ~300 K thermal displacement amplitude for fcc Ni (sigma ~ 0.07 A)
    pos = pos + rng.normal(scale=0.07, size=pos.shape)
    pos = pos.astype(np.float32).astype(np.float64)
    cell = np.asarray(cell, np.float32).astype(np.float64)
    return pos, types, cell


def run_oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mtp_tpu.io.basis_gen import make_mtp
    from mtp_tpu.models.mtp import MTPModel, mtp_energy_forces
    from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

    m = make_mtp(CFG["level"], species_count=1, seed=CFG["seed"])
    model = MTPModel.from_data(m, dtype=jnp.float64)
    pos, types, cell = _config_positions()
    grid = grid_shape(cell, model.cutoff)
    nl = build_neighbor_list(
        jnp.asarray(pos), jnp.asarray(cell), model.cutoff,
        max_neighbors=64, grid=grid, with_reverse=True,
    )
    assert not bool(nl.overflow)
    out = mtp_energy_forces(
        model.schedule, model.coeffs, jnp.asarray(pos),
        jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
        nl.mirror, backend="xla",
    )
    np.savez(
        ORACLE_NPZ,
        forces=np.asarray(out["forces"], np.float64),
        site_energies=np.asarray(out["site_energies"], np.float64),
        energy=np.float64(out["energy"]),
        virial=np.asarray(out["virial"], np.float64),
    )
    print(f"oracle: N={len(pos)} E={float(out['energy']):.10f} eV", file=sys.stderr)


def run_fp32(force_cpu=False):
    import jax

    if force_cpu:
        # the env var alone is not enough when a sitecustomize already
        # registered the TPU backend; the config update is authoritative
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from mtp_tpu.io.basis_gen import make_mtp
    from mtp_tpu.md.simulation import Simulation
    from mtp_tpu.models.mtp import MTPModel
    from mtp_tpu.ops.neighbors import grid_shape

    m = make_mtp(CFG["level"], species_count=1, seed=CFG["seed"])
    model = MTPModel.from_data(m, dtype=jnp.float32)
    pos, types, cell = _config_positions()
    n = len(pos)
    backend = jax.default_backend()

    sim = Simulation(
        model, max_neighbors=64, skin=0.0, steps_per_rebuild=1,
        compute_virial=True, window=(backend == "tpu"),
    )
    grid = grid_shape(cell, model.cutoff)
    import jax.numpy as jnp

    from mtp_tpu.md.state import init_state

    state = init_state(pos, types, np.full(n, 58.693), cell, dtype=jnp.float32)
    nl = sim.rebuild(state, grid=grid, max_neighbors=64)
    assert not bool(nl.overflow)
    force_fn = sim._force_fn_for(nl, state)
    f32_forces, f32_energy, f32_virial = jax.jit(force_fn)(
        state.positions, state.types, state.cell
    )
    # site energies for f64 host summation (the fp32 tree-sum of the total
    # loses ~log2(N)*eps*|E|; the per-site values themselves carry only
    # per-neighborhood rounding)
    if hasattr(nl, "order"):
        from mtp_tpu.models.mtp import mtp_energy_forces_window, window_constants

        consts = window_constants(
            model.schedule, model.coeffs, state.types, nl, jnp.float32
        )
        out = mtp_energy_forces_window(
            model.schedule, model.coeffs, state.positions, state.cell, nl,
            compute_virial=False, **consts,
        )
        # mtp_energy_forces_window returns site energies already permuted
        # back to user order (verified vs the XLA path on CPU)
        site_e = np.asarray(out["site_energies"], np.float64)[:n]
    else:
        from mtp_tpu.models.mtp import mtp_energy_forces

        out = mtp_energy_forces(
            model.schedule, model.coeffs, state.positions, state.types,
            nl.idx, state.cell, nl.mirror,
        )
        site_e = np.asarray(out["site_energies"], np.float64)

    ref = np.load(ORACLE_NPZ)
    df = np.asarray(f32_forces, np.float64) - ref["forces"]
    fmag = np.linalg.norm(ref["forces"], axis=1)
    d = dict(
        metric="accuracy-gate (32k level-16 thermal fcc, fp32 %s vs f64 oracle)"
        % backend,
        n_atoms=n,
        max_abs_dF=float(np.abs(df).max()),
        rms_dF=float(np.sqrt((df**2).mean())),
        force_scale_rms=float(np.sqrt((fmag**2).mean())),
        dE_per_atom_naive_f32_sum=float(
            abs(float(f32_energy) - float(ref["energy"])) / n
        ),
        dE_per_atom_f64_host_sum=float(
            abs(site_e.sum() - float(ref["energy"])) / n
        ),
        max_site_e_err=float(
            np.abs(site_e - ref["site_energies"]).max()
        ),
        rms_site_e_err=float(
            np.sqrt(((site_e - ref["site_energies"]) ** 2).mean())
        ),
        max_dvirial=float(
            np.abs(np.asarray(f32_virial, np.float64) - ref["virial"]).max()
        ),
        virial_scale=float(np.abs(ref["virial"]).max()),
    )
    print(json.dumps(d))


def run_df32():
    """The df32 (double-float) accuracy mode at the bench config: the
    reference's all-double accuracy class (pair_mtp.cpp) on f64-less TPU
    hardware. Measures max|dF| vs the f64 oracle AND the cost per eval
    (amortized in one lax.scan; anti-hoist input perturbation per CLAUDE.md)
    so PARITY.md can state the accuracy-vs-cost frontier with numbers."""
    import time

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from mtp_tpu.io.basis_gen import make_mtp
    from mtp_tpu.models.mtp import MTPModel, mtp_energy_forces
    from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

    m = make_mtp(CFG["level"], species_count=1, seed=CFG["seed"])
    model = MTPModel.from_data(m, dtype=jnp.float32)
    pos, types, cell = _config_positions()
    n = len(pos)
    backend = jax.default_backend()
    pos32 = jnp.asarray(pos, jnp.float32)
    cell32 = jnp.asarray(cell, jnp.float32)
    nl = build_neighbor_list(
        pos32.astype(jnp.float64) if jax.config.jax_enable_x64 else pos32,
        cell32, model.cutoff, max_neighbors=64,
        grid=grid_shape(cell, model.cutoff), with_reverse=True,
    )
    assert not bool(nl.overflow)
    args = (model.schedule, model.coeffs, pos32,
            jnp.asarray(types, jnp.int32), nl.idx, cell32, nl.mirror)

    out = mtp_energy_forces(*args, backend="df32")
    f_df = np.asarray(out["forces"], np.float64)
    e_df = float(out["energy"])

    ref = np.load(ORACLE_NPZ)
    df_err = np.abs(f_df - ref["forces"])
    fmag = np.linalg.norm(ref["forces"], axis=1)

    def timed(bk, iters):
        def one(x, i):
            o = mtp_energy_forces(
                model.schedule, model.coeffs, x + i * jnp.float32(1e-30),
                jnp.asarray(types, jnp.int32), nl.idx, cell32, nl.mirror,
                backend=bk,
            )
            return x, o["forces"][0, 0]

        @jax.jit
        def loop(x):
            _, ys = jax.lax.scan(one, x, jnp.arange(iters, dtype=jnp.float32))
            return ys.sum()

        float(loop(pos32))  # compile + warm
        t0 = time.time()
        float(loop(pos32))
        return (time.time() - t0) / iters * 1e3

    ms_df = timed("df32", 4)
    ms_32 = timed("pallas" if backend == "tpu" else "xla", 20)
    d = dict(
        metric="accuracy-gate df32 (32k level-16 thermal fcc, %s)" % backend,
        n_atoms=n,
        max_abs_dF=float(df_err.max()),
        rms_dF=float(np.sqrt((df_err**2).mean())),
        force_scale_rms=float(np.sqrt((fmag**2).mean())),
        dE_per_atom=float(abs(e_df - float(ref["energy"])) / n),
        df32_ms_per_eval=ms_df,
        fp32_ms_per_eval=ms_32,
        cost_ratio=ms_df / ms_32,
    )
    print(json.dumps(d))


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        run_oracle()
        sys.exit(0)
    if not os.path.exists(ORACLE_NPZ):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--oracle"], env=env
        )
        assert r.returncode == 0, "oracle subprocess failed"
    # --fp32-cpu: measure the plain-f32-math floor (XLA CPU path, no TPU
    # kernels/MXU) — separates fundamental fp32 rounding from TPU-specific
    # error in the frontier analysis (PARITY.md)
    if "--df32" in sys.argv:
        run_df32()
    else:
        run_fp32(force_cpu="--fp32-cpu" in sys.argv)
