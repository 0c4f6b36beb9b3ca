"""On-TPU validation of the df32 path: error-free transforms + a 4k-atom
force eval vs the CPU f64 oracle, plus a timed cost measurement.

The df arithmetic relies on correctly-rounded f32 +,-,* on the VPU and on
XLA not algebraically simplifying the cancellation patterns. Both hold on
CPU (tests/test_df32.py); this probes them on the v5e through the tunnel.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ORACLE = "/tmp/df32_probe_oracle.npz"


def oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mtp_tpu.io.basis_gen import make_mtp
    from mtp_tpu.models.mtp import MTPModel, mtp_energy_forces
    from mtp_tpu.md.simulation import make_lattice
    from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

    m = make_mtp(16, species_count=1, seed=0)
    model = MTPModel.from_data(m, dtype=jnp.float64)
    pos, types, cell = make_lattice("fcc", 4.0, (10, 10, 10))
    rng = np.random.default_rng(0)
    pos = pos + rng.normal(scale=0.07, size=pos.shape)
    # round to f32 so both sides see identical inputs
    pos = pos.astype(np.float32).astype(np.float64)
    cell = np.asarray(cell, np.float32).astype(np.float64)
    nl = build_neighbor_list(
        jnp.asarray(pos), jnp.asarray(cell), model.cutoff,
        max_neighbors=64, grid=grid_shape(cell, model.cutoff), with_reverse=True,
    )
    assert not bool(nl.overflow)
    out = mtp_energy_forces(
        model.schedule, model.coeffs, jnp.asarray(pos),
        jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
        nl.mirror, backend="xla",
    )
    np.savez(ORACLE, forces=np.asarray(out["forces"]), energy=np.float64(out["energy"]),
             pos=pos.astype(np.float32), cell=cell.astype(np.float32),
             types=np.asarray(types, np.int32), idx=np.asarray(nl.idx),
             mirror=np.asarray(nl.mirror))
    print("oracle done", file=sys.stderr)


def probe():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from mtp_tpu.ops import df32 as df

    print("backend:", jax.default_backend(), file=sys.stderr)

    # 1. error-free transforms on device
    rng = np.random.default_rng(1)
    a = rng.uniform(-100, 100, 8192).astype(np.float32)
    b = rng.uniform(-100, 100, 8192).astype(np.float32)

    @jax.jit
    def eft(a, b):
        s, e = df.two_sum(a, b)
        p, q = df.two_prod(a, b)
        return s, e, p, q

    s, e, p, q = [np.asarray(x, np.float64) for x in eft(jnp.asarray(a), jnp.asarray(b))]
    ts_ok = np.array_equal(s + e, a.astype(np.float64) + b.astype(np.float64))
    tp_ok = np.array_equal(p + q, a.astype(np.float64) * b.astype(np.float64))
    print(json.dumps({"two_sum_exact": bool(ts_ok), "two_prod_exact": bool(tp_ok)}))
    assert ts_ok and tp_ok, "error-free transforms broken on this backend"

    # 2. 4k force eval vs f64 oracle
    from mtp_tpu.io.basis_gen import make_mtp
    from mtp_tpu.models.mtp import MTPModel, mtp_energy_forces

    d = np.load(ORACLE)
    m = make_mtp(16, species_count=1, seed=0)
    model = MTPModel.from_data(m, dtype=jnp.float32)
    args = (
        model.schedule, model.coeffs, jnp.asarray(d["pos"]),
        jnp.asarray(d["types"]), jnp.asarray(d["idx"]),
        jnp.asarray(d["cell"]), jnp.asarray(d["mirror"]),
    )
    t0 = time.time()
    out = mtp_energy_forces(*args, backend="df32")
    f_df = np.asarray(out["forces"], np.float64)
    t_compile = time.time() - t0
    out32 = mtp_energy_forces(*args, backend="xla")
    f_32 = np.asarray(out32["forces"], np.float64)

    ref = d["forces"]
    fscale = float(np.abs(ref).max())
    res = {
        "n": int(len(ref)),
        "max_dF_df32": float(np.abs(f_df - ref).max()),
        "max_dF_f32": float(np.abs(f_32 - ref).max()),
        "dE_df32": float(abs(float(out["energy"]) - float(d["energy"])) / len(ref)),
        "force_scale_max": fscale,
        "compile_plus_first_s": t_compile,
    }

    # 3. cost: amortized inside one scan, input perturbed by counter
    def one(x, i):
        o = mtp_energy_forces(
            model.schedule, model.coeffs, x + i * jnp.float32(1e-30),
            jnp.asarray(d["types"]), jnp.asarray(d["idx"]),
            jnp.asarray(d["cell"]), jnp.asarray(d["mirror"]), backend="df32",
        )
        return x, o["forces"][0, 0]

    @jax.jit
    def loop(x):
        _, ys = jax.lax.scan(one, x, jnp.arange(5, dtype=jnp.float32))
        return ys.sum()

    x = jnp.asarray(d["pos"])
    v = float(loop(x))  # compile + run
    t0 = time.time()
    v = float(loop(x))
    res["df32_ms_per_eval_4k"] = (time.time() - t0) / 5 * 1e3

    def one32(x, i):
        o = mtp_energy_forces(
            model.schedule, model.coeffs, x + i * jnp.float32(1e-30),
            jnp.asarray(d["types"]), jnp.asarray(d["idx"]),
            jnp.asarray(d["cell"]), jnp.asarray(d["mirror"]), backend="xla",
        )
        return x, o["forces"][0, 0]

    @jax.jit
    def loop32(x):
        _, ys = jax.lax.scan(one32, x, jnp.arange(5, dtype=jnp.float32))
        return ys.sum()

    float(loop32(x))
    t0 = time.time()
    float(loop32(x))
    res["xla_f32_ms_per_eval_4k"] = (time.time() - t0) / 5 * 1e3
    print(json.dumps(res))


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        oracle()
        sys.exit(0)
    if not os.path.exists(ORACLE):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = "/root/repo"
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--oracle"], env=env)
        assert r.returncode == 0
    probe()
