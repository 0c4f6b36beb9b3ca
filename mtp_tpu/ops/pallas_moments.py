"""Fused Pallas TPU kernels for the MTP per-pair stage.

This is the TPU-native replacement for the reference's hot kernels
``ComputeAlphaBasic`` (pair_mtp_kokkos.cpp:413-546, ~80% of GPU time) and
``ComputeForce`` (pair_mtp_kokkos.cpp:594-660). One forward kernel produces
basic moments; one backward kernel consumes dE/d(basic moments) and emits
per-pair force vectors. Everything per-pair (distances, Chebyshev recurrence,
radial functions, unit-vector power tables, the B-term static unroll) lives in
VMEM — no (N, J, B) intermediates ever touch HBM, which is what makes the XLA
path bandwidth-bound.

Layout: a grid step processes TILE_N = 128 atoms (lanes) x J neighbors
(sublanes); per-pair arrays are (J, 128). Moments are kept feature-major
(B, N) so the contraction DAG downstream is all row slices.

Math (same function as pair_mtp.cpp:154-192, reformulated in unit vectors):
    val_k = f_mu(d) * ux^ax uy^ay uz^az,   u = r/d, rank = ax+ay+az
    dval_k/dr_a = (f' - rank f / d) u_a U_k + (f/d) alpha_a * u^(alpha - e_a)
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _tile_n(j: int) -> int:
    """Atom-tile width: large tiles amortize the in-kernel DAG matmuls, but
    per-pair (J, TN) VMEM arrays must fit the ~16MB scoped budget."""
    return 256 if j <= 64 else 128


def _tile_n_cand(j: int) -> int:
    """Candidates-kernel tile: roughly double the live VMEM of the fwd/bwd
    kernels (4 outputs incl. the (3, J, TN) pair block and the rad block,
    the Gmu accumulators, and cheb kept alive through the rad loop), so halve
    the tile. AL overflow retries can grow J well past 64 mid-run; the grade
    kernel must keep compiling where the force kernels do."""
    return _tile_n(j) // 2


def _cheb_vals(d, lo, hi, scaling, size):
    ksi = (2.0 * d - (lo + hi)) / (hi - lo)
    env = scaling * (d - hi) ** 2
    vals = [env, ksi * env]
    for _ in range(2, size):
        vals.append(2.0 * ksi * vals[-1] - vals[-2])
    return vals


def _cheb_vals_ders(d, lo, hi, scaling, size):
    """Values and analytic derivatives (mtp_rb_chevbyshev_basis.cpp:40-54)."""
    ksi = (2.0 * d - (lo + hi)) / (hi - lo)
    mult = 2.0 / (hi - lo)
    env = scaling * (d - hi) ** 2
    vals = [env, ksi * env]
    ders = [
        scaling * 2.0 * (d - hi),
        scaling * (mult * (d - hi) ** 2 + 2.0 * ksi * (d - hi)),
    ]
    for i in range(2, size):
        vals.append(2.0 * ksi * vals[-1] - vals[-2])
        ders.append(2.0 * (mult * vals[i - 1] + ksi * ders[i - 1]) - ders[i - 2])
    return vals, ders


def _pair_radials(cheb, coeff_ref, it_row, jt, S, MU):
    """f_mu per pair for every (mu): select the (itype,jtype) coefficient row.

    cheb: list of RB (J,TN) arrays; coeff_ref: (S,S,MU,RB) VMEM table;
    it_row: (1,TN) itype; jt: (J,TN) jtype. Static loops over S,S,MU,RB.
    """
    RB = len(cheb)
    f = []
    for mu in range(MU):
        acc = None
        for s1 in range(S):
            for s2 in range(S):
                g = None
                for r in range(RB):
                    term = coeff_ref[s1, s2, mu, r] * cheb[r]
                    g = term if g is None else g + term
                if S > 1:
                    sel = jnp.where(
                        (it_row == s1) & (jt == s2), 1.0, 0.0
                    ).astype(g.dtype)
                    g = g * sel
                acc = g if acc is None else acc + g
        f.append(acc)
    return f


def _power_tables(ux, uy, uz, max_rank):
    PX, PY, PZ = [jnp.ones_like(ux)], [jnp.ones_like(uy)], [jnp.ones_like(uz)]
    for _ in range(max_rank):
        PX.append(PX[-1] * ux)
        PY.append(PY[-1] * uy)
        PZ.append(PZ[-1] * uz)
    return PX, PY, PZ


def _geometry(dispT_ref, mask_ref):
    x = dispT_ref[0]
    y = dispT_ref[1]
    z = dispT_ref[2]
    w = mask_ref[:].astype(x.dtype)
    d2 = x * x + y * y + z * z
    d2 = jnp.where(w > 0, d2, 1.0)
    d = jnp.sqrt(d2)
    inv_d = 1.0 / d
    return x, y, z, w, d, inv_d


def _u_tables(basic, PX, PY, PZ, *, with_derivs=False):
    """Shared unit-power products.

    U[(ax,ay,az)] = ux^ax uy^ay uz^az, computed once per *distinct* exponent
    triple (they repeat across radial indices mu). With derivs, also
    Um[a][(triple)] = alpha_a * u^(alpha - e_a).
    """
    PYZ = {}
    U = {}
    Um = ({}, {}, {}) if with_derivs else None
    for _, ax, ay, az in basic:
        if (ay, az) not in PYZ:
            PYZ[(ay, az)] = PY[ay] * PZ[az]
        t = (ax, ay, az)
        if t not in U:
            U[t] = PX[ax] * PYZ[(ay, az)]
        if with_derivs:
            if ax > 0 and t not in Um[0]:
                Um[0][t] = float(ax) * (PX[ax - 1] * PYZ[(ay, az)])
            if ay > 0 and t not in Um[1]:
                if (ay - 1, az) not in PYZ:
                    PYZ[(ay - 1, az)] = PY[ay - 1] * PZ[az]
                Um[1][t] = float(ay) * (PX[ax] * PYZ[(ay - 1, az)])
            if az > 0 and t not in Um[2]:
                if (ay, az - 1) not in PYZ:
                    PYZ[(ay, az - 1)] = PY[ay] * PZ[az - 1]
                Um[2][t] = float(az) * (PX[ax] * PYZ[(ay, az - 1)])
    return U, Um


def _pair_force_terms(basic, MU, f, fp, inv_d, x, U, Um, get_g, *, want_gmu=False):
    """Shared per-pair force tail of every backward-style kernel.

    T_a = u_a * sum_k g_k W1_k U_k + sum_k (g_k W2[mu_k]) Um_a[k] with
    W2[mu] = f_mu/d, W1[mu,rank] = f'_mu - rank f_mu/d. `get_g(k)` supplies
    gamma row k as a (1, TN) block (gamma_ref for the modular kernel, dm for
    the fused ones). With `want_gmu`, also accumulates the radial-jacobian
    pair factor Gmu[mu] = sum_{k: mu_k = mu} g_k U_k (candidates kernel).

    ONE implementation on purpose: the same expression previously lived in
    three kernels and a drift between the MD force kernels and the AL grade
    kernel would silently decouple the forces run_with_extrapolation
    refreshes from the step-scan forces.

    Returns (P, Dx, Dy, Dz, Gmu)."""
    W2 = [fm * inv_d for fm in f]
    ranks = sorted({ax + ay + az for _, ax, ay, az in basic})
    W1 = {}
    for mu in range(MU):
        for r in ranks:
            W1[(mu, r)] = fp[mu] - float(r) * W2[mu] if r else fp[mu]
    P = jnp.zeros_like(x)
    Dx = jnp.zeros_like(x)
    Dy = jnp.zeros_like(x)
    Dz = jnp.zeros_like(x)
    Gmu = [None] * MU if want_gmu else None
    for k, (mu, ax, ay, az) in enumerate(basic):
        g = get_g(k)
        t = (ax, ay, az)
        if want_gmu:
            gU = g * U[t]
            Gmu[mu] = gU if Gmu[mu] is None else Gmu[mu] + gU
        P = P + (g * W1[(mu, ax + ay + az)]) * U[t]
        if ax or ay or az:
            gw2 = g * W2[mu]
            if ax > 0:
                Dx = Dx + gw2 * Um[0][t]
            if ay > 0:
                Dy = Dy + gw2 * Um[1][t]
            if az > 0:
                Dz = Dz + gw2 * Um[2][t]
    return P, Dx, Dy, Dz, Gmu


def _fwd_kernel(
    dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref, out_ref, *, sched_tables
):
    basic, S, MU, RB, lo, hi, scaling, max_rank, B_pad = sched_tables
    x, y, z, w, d, inv_d = _geometry(dispT_ref, mask_ref)
    ux, uy, uz = x * inv_d, y * inv_d, z * inv_d

    cheb = _cheb_vals(d, lo, hi, scaling, RB)
    it_row = it_ref[0][None, :]  # (1, TN)
    jt = jt_ref[:]
    f = _pair_radials(cheb, coeff_ref, it_row, jt, S, MU)
    fw = [fm * w for fm in f]  # fold the neighbor mask into the radials once
    PX, PY, PZ = _power_tables(ux, uy, uz, max_rank)
    U, _ = _u_tables(basic, PX, PY, PZ)

    rows = []
    for mu, ax, ay, az in basic:
        rows.append(jnp.sum(fw[mu] * U[(ax, ay, az)], axis=0))  # (TN,)
    for _ in range(B_pad - len(basic)):
        rows.append(jnp.zeros_like(rows[0]))
    out_ref[:] = jnp.stack(rows, axis=0)


def _bwd_kernel(
    dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref, gamma_ref, out_ref, *, sched_tables
):
    basic, S, MU, RB, lo, hi, scaling, max_rank, B_pad = sched_tables
    x, y, z, w, d, inv_d = _geometry(dispT_ref, mask_ref)
    ux, uy, uz = x * inv_d, y * inv_d, z * inv_d

    cheb, cheb_d = _cheb_vals_ders(d, lo, hi, scaling, RB)
    it_row = it_ref[0][None, :]
    jt = jt_ref[:]
    f = _pair_radials(cheb, coeff_ref, it_row, jt, S, MU)
    fp = _pair_radials(cheb_d, coeff_ref, it_row, jt, S, MU)
    PX, PY, PZ = _power_tables(ux, uy, uz, max_rank)
    U, Um = _u_tables(basic, PX, PY, PZ, with_derivs=True)

    P, Dx, Dy, Dz, _ = _pair_force_terms(
        basic, MU, f, fp, inv_d, x, U, Um,
        lambda k: gamma_ref[k][None, :],  # (1, TN) -> broadcast over J
    )
    out_ref[0] = (P * ux + Dx) * w
    out_ref[1] = (P * uy + Dy) * w
    out_ref[2] = (P * uz + Dz) * w


def _pad_axis(a, mult, axis):
    n = a.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _prep(sched):
    basic = tuple(map(tuple, sched.basic.tolist()))
    B = len(basic)
    B_pad = -(-B // 8) * 8
    return (
        basic,
        sched.species_count,
        sched.radial_funcs_count,
        sched.radial_basis_size,
        sched.min_dist,
        sched.max_dist,
        sched.scaling,
        sched.max_rank,
        B_pad,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def basic_moments_fused(sched, dispT, mask, itypes, jtypes_t, radial_coeffs):
    """Basic moments, feature-major: (B, N).

    Args:
      dispT: (3, J, N) displacement components (J padded to x8, N to x128).
      mask: (J, N) float 0/1.
      itypes: (1, N) int32; jtypes_t: (J, N) int32.
      radial_coeffs: (S, S, MU, RB).
    """
    return _fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs)


def _interpret() -> bool:
    # CPU tests run the kernels in interpreter mode
    return jax.default_backend() != "tpu"


def _bwd_precision():
    """MXU precision of the BACKWARD kernel's DAG dots. Default (None) keeps
    the fast path: its dot-precision error measured < 3e-7 eV/A against the
    fp32-math floor of ~1.4e-5 (PARITY.md frontier), so HIGHEST buys ~2x
    accuracy at ~3x the backward's MXU passes. MTP_PRECISE_FORCES=1 opts in
    (read at trace time)."""
    import os

    if os.environ.get("MTP_PRECISE_FORCES", "0") == "1":
        return jax.lax.Precision.HIGHEST
    return None


def _fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs):
    tables = _prep(sched)
    B_pad = tables[-1]
    J, N = mask.shape
    grid = (N // TILE_N,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, sched_tables=tables),
        out_shape=jax.ShapeDtypeStruct((B_pad, N), dispT.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, J, TILE_N), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coeff table, replicated
        ],
        out_specs=pl.BlockSpec(
            (B_pad, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(dispT, mask, itypes, jtypes_t, radial_coeffs)
    return out[: sched.basic_count]


def _fused_fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs):
    out = _fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs)
    return out, (dispT, mask, itypes, jtypes_t, radial_coeffs)


def _fused_bwd(sched, res, gamma):
    dispT, mask, itypes, jtypes_t, radial_coeffs = res
    tables = _prep(sched)
    B_pad = tables[-1]
    J, N = mask.shape
    gamma_pad = _pad_axis(gamma, 8, 0)
    if gamma_pad.shape[0] != B_pad:
        gamma_pad = jnp.pad(gamma_pad, ((0, B_pad - gamma_pad.shape[0]), (0, 0)))
    grid = (N // TILE_N,)
    pair_t = pl.pallas_call(
        functools.partial(_bwd_kernel, sched_tables=tables),
        out_shape=jax.ShapeDtypeStruct((3, J, N), dispT.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, J, TILE_N), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((B_pad, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, J, TILE_N), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(dispT, mask, itypes, jtypes_t, radial_coeffs, gamma_pad)
    # cotangents: only disp is differentiated on the MD path
    return (pair_t, None, None, None, None)


basic_moments_fused.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------------------------
# megakernel: per-pair stage + contraction DAG + readout fused in VMEM
# ----------------------------------------------------------------------


def _prep_mega(sched):
    tables = _prep(sched)
    B_pad = tables[-1]
    M = sched.alpha_moments_count
    M_pad = -(-M // 8) * 8
    mats = [
        (
            np.asarray(w0, np.float32),
            np.asarray(a1m, np.float32),
            np.asarray(s3, np.float32),
        )
        for w0, a1m, s3 in _dag_matrices(sched)
    ]
    return tables, B_pad, M, M_pad, mats


def _moments_tile(sched_tables, dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref):
    """Shared fwd compute: basic moment rows for one atom tile."""
    basic, S, MU, RB, lo, hi, scaling, max_rank, B_pad = sched_tables
    x, y, z, w, d, inv_d = _geometry(dispT_ref, mask_ref)
    ux, uy, uz = x * inv_d, y * inv_d, z * inv_d
    cheb = _cheb_vals(d, lo, hi, scaling, RB)
    it_row = it_ref[0][None, :]
    jt = jt_ref[:]
    f = _pair_radials(cheb, coeff_ref, it_row, jt, S, MU)
    fw = [fm * w for fm in f]
    PX, PY, PZ = _power_tables(ux, uy, uz, max_rank)
    U, _ = _u_tables(basic, PX, PY, PZ)
    rows = [jnp.sum(fw[mu] * U[(ax, ay, az)], axis=0) for mu, ax, ay, az in basic]
    return rows


def _dag_tile(mat_refs, M_pad, rows, tn, dtype, precision=None):
    """DAG forward on one tile via one-hot matmuls (matrices are inputs).

    Returns (moments (M_pad, TN), per-wave (p0, p1) residuals).

    `precision`: the ENERGY path passes Precision.HIGHEST — at the default
    precision Mosaic's MXU lowering rounds the f32 operands, leaving a
    systematic ~3e-6 eV/atom bias vs the f32 reference (caught by
    tools/tpu_smoke.py; exactly zero in interpret mode). The force backward
    keeps the default: its dot-precision error measured below 3e-7 eV/A
    while HIGHEST would multiply the dominant kernel's MXU passes."""
    zero = jnp.zeros((tn,), dtype)
    m = jnp.stack(rows + [zero] * (M_pad - len(rows)), axis=0)
    resid = []
    for w0_ref, a1_ref, s3_ref in mat_refs:
        p0 = jnp.dot(
            w0_ref[:], m, preferred_element_type=m.dtype, precision=precision
        )
        p1 = jnp.dot(
            a1_ref[:], m, preferred_element_type=m.dtype, precision=precision
        )
        m = m + jnp.dot(
            s3_ref[:], p0 * p1, preferred_element_type=m.dtype,
            precision=precision,
        )
        resid.append((p0, p1))
    return m, resid


def _pack_mats(mats, M, M_pad, dtype):
    """Pad the per-wave DAG matrices for the kernel inputs."""
    out = []
    for w0, a1m, s3 in mats:
        out.append(jnp.asarray(np.pad(w0, ((0, 0), (0, M_pad - M))), dtype))
        out.append(jnp.asarray(np.pad(a1m, ((0, 0), (0, M_pad - M))), dtype))
        out.append(jnp.asarray(np.pad(s3, ((0, M_pad - M), (0, 0))), dtype))
    return out


def _mega_fwd_kernel(
    dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref, xi_ref, esp_ref, *refs,
    sched_tables, n_waves, M_pad
):
    out_ref = refs[-1]
    mat_refs = [tuple(refs[3 * k : 3 * k + 3]) for k in range(n_waves)]
    rows = _moments_tile(sched_tables, dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref)
    tn = rows[0].shape[0]
    # HIGHEST through the whole energy chain: at default precision Mosaic's
    # MXU lowering rounds the f32 operands — the readout matvec alone was a
    # -1.5e-3 eV/atom constant bias, the DAG dots another ~3e-6 (exactly
    # zero in interpret mode; caught by tools/tpu_smoke.py). With HIGHEST
    # the fp32 TPU path meets the <1e-6 eV/atom gate at 32k (PARITY.md).
    m, _ = _dag_tile(
        mat_refs, M_pad, rows, tn, rows[0].dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    e = jnp.dot(
        xi_ref[:], m, preferred_element_type=m.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, TN)
    out_ref[:] = e + esp_ref[:]


def _mega_bwd_kernel(
    dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref, xi_ref, de_ref, *refs,
    sched_tables, n_waves, M_pad
):
    out_ref = refs[-1]
    mat_refs = [tuple(refs[3 * k : 3 * k + 3]) for k in range(n_waves)]
    basic, S, MU, RB, lo, hi, scaling, max_rank, B_pad = sched_tables
    x, y, z, w, d, inv_d = _geometry(dispT_ref, mask_ref)
    ux, uy, uz = x * inv_d, y * inv_d, z * inv_d
    cheb, cheb_d = _cheb_vals_ders(d, lo, hi, scaling, RB)
    it_row = it_ref[0][None, :]
    jt = jt_ref[:]
    f = _pair_radials(cheb, coeff_ref, it_row, jt, S, MU)
    fp = _pair_radials(cheb_d, coeff_ref, it_row, jt, S, MU)
    fw = [fm * w for fm in f]
    PX, PY, PZ = _power_tables(ux, uy, uz, max_rank)
    U, Um = _u_tables(basic, PX, PY, PZ, with_derivs=True)

    # forward moments (recompute; cheaper than spilling to HBM)
    rows = [jnp.sum(fw[mu] * U[(ax, ay, az)], axis=0) for mu, ax, ay, az in basic]
    tn = rows[0].shape[0]
    prec = _bwd_precision()
    m, resid = _dag_tile(mat_refs, M_pad, rows, tn, rows[0].dtype, precision=prec)

    # DAG reverse: dm starts at the readout row, pulled back wave by wave
    dm = xi_ref[:].T * de_ref[:]  # (M_pad, 1) * (1, TN) -> (M_pad, TN)
    for (w0_ref, a1_ref, s3_ref), (p0, p1) in zip(reversed(mat_refs), reversed(resid)):
        dc = jnp.dot(s3_ref[:].T, dm, preferred_element_type=dm.dtype,
                     precision=prec)
        dm = dm + jnp.dot(w0_ref[:].T, dc * p1, preferred_element_type=dm.dtype,
                          precision=prec)
        dm = dm + jnp.dot(a1_ref[:].T, dc * p0, preferred_element_type=dm.dtype,
                          precision=prec)

    # pair forces from gamma = dm[:B] (same math as _bwd_kernel)
    P, Dx, Dy, Dz, _ = _pair_force_terms(
        basic, MU, f, fp, inv_d, x, U, Um, lambda k: dm[k][None, :]
    )
    out_ref[0] = (P * ux + Dx) * w
    out_ref[1] = (P * uy + Dy) * w
    out_ref[2] = (P * uz + Dz) * w


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def site_energies_mega(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp):
    """Per-atom energies, fully fused: per-pair stage, contraction DAG (as
    constant one-hot MXU matmuls), and linear readout in one kernel.

    xi_full: (1, M_pad) moment_coeffs scattered to their moment slots.
    esp: (1, N) per-atom species reference energies.
    Differentiable w.r.t. dispT only (MD path).
    """
    return _mega_fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp)


def _mega_fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp):
    tables, B_pad, M, M_pad, mats = _prep_mega(sched)
    J, N = mask.shape
    TN = _tile_n(J)
    mat_args = _pack_mats(mats, M, M_pad, dispT.dtype)
    out = pl.pallas_call(
        functools.partial(
            _mega_fwd_kernel,
            sched_tables=tables,
            n_waves=len(mats),
            M_pad=M_pad,
        ),
        out_shape=jax.ShapeDtypeStruct((1, N), dispT.dtype),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((3, J, TN), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mat_args],
        out_specs=pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp, *mat_args)
    return out[0]


def _mega_fwd_vjp(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp):
    out = _mega_fwd(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp)
    return out, (dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full)


def _mega_bwd_vjp(sched, res, de):
    dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full = res
    tables, B_pad, M, M_pad, mats = _prep_mega(sched)
    J, N = mask.shape
    TN = _tile_n(J)
    mat_args = _pack_mats(mats, M, M_pad, dispT.dtype)
    pair_t = pl.pallas_call(
        functools.partial(
            _mega_bwd_kernel,
            sched_tables=tables,
            n_waves=len(mats),
            M_pad=M_pad,
        ),
        out_shape=jax.ShapeDtypeStruct((3, J, N), dispT.dtype),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((3, J, TN), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mat_args],
        out_specs=pl.BlockSpec(
            (3, J, TN), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, de[None, :], *mat_args)
    return (pair_t, None, None, None, None, None, None)


site_energies_mega.defvjp(_mega_fwd_vjp, _mega_bwd_vjp)


def _mega_cand_kernel(
    dispT_ref, mask_ref, it_ref, jt_ref, coeff_ref, xi_ref, esp_ref, bm_sel_ref,
    *refs, sched_tables, n_waves, M_pad
):
    """Fused grade-step kernel: ONE per-pair stage + DAG yields site
    energies, the scalar-basis members, the radial-jacobian candidate block
    AND the pair forces (the TPU analog of the reference's
    ComputeAlphaBasicRad grade-step fusion,
    pair_mtp_extrapolation_kokkos.cpp:780-907). The XLA candidate path
    materializes the (N, J, B) U/cheb tables to HBM (~74 ms at 32k x 64 on
    v5e); here they never leave VMEM.

    Outputs: site_e (1, TN), basis_members (m_scal_pad, TN),
    rad (S*MU*RB padded, TN) in (s2, mu, r) row-major order, pair_t
    (3, J, TN). DAG runs at HIGHEST throughout (grade steps are off the
    hot loop; site energies feed the MD state refresh)."""
    site_ref, bm_ref, rad_ref, pair_ref = refs[-4:]
    mat_refs = [tuple(refs[3 * k : 3 * k + 3]) for k in range(n_waves)]
    basic, S, MU, RB, lo, hi, scaling, max_rank, B_pad = sched_tables
    x, y, z, w, d, inv_d = _geometry(dispT_ref, mask_ref)
    ux, uy, uz = x * inv_d, y * inv_d, z * inv_d
    cheb, cheb_d = _cheb_vals_ders(d, lo, hi, scaling, RB)
    it_row = it_ref[0][None, :]
    jt = jt_ref[:]
    f = _pair_radials(cheb, coeff_ref, it_row, jt, S, MU)
    fp = _pair_radials(cheb_d, coeff_ref, it_row, jt, S, MU)
    fw = [fm * w for fm in f]
    PX, PY, PZ = _power_tables(ux, uy, uz, max_rank)
    U, Um = _u_tables(basic, PX, PY, PZ, with_derivs=True)

    rows = [jnp.sum(fw[mu] * U[(ax, ay, az)], axis=0) for mu, ax, ay, az in basic]
    tn = rows[0].shape[0]
    HI = jax.lax.Precision.HIGHEST
    m, resid = _dag_tile(mat_refs, M_pad, rows, tn, rows[0].dtype, precision=HI)

    # site energies + scalar-basis members from the HIGHEST-precision m
    site_ref[:] = (
        jnp.dot(xi_ref[:], m, preferred_element_type=m.dtype, precision=HI)
        + esp_ref[:]
    )
    bm_ref[:] = jnp.dot(
        bm_sel_ref[:], m, preferred_element_type=m.dtype, precision=HI
    )

    # DAG reverse with de = 1 (gamma = dE/d(basic moments))
    dm = xi_ref[:].T * jnp.ones((1, tn), m.dtype)
    for (w0_ref, a1_ref, s3_ref), (p0, p1) in zip(
        reversed(mat_refs), reversed(resid)
    ):
        dc = jnp.dot(s3_ref[:].T, dm, preferred_element_type=dm.dtype, precision=HI)
        dm = dm + jnp.dot(
            w0_ref[:].T, dc * p1, preferred_element_type=dm.dtype, precision=HI
        )
        dm = dm + jnp.dot(
            a1_ref[:].T, dc * p0, preferred_element_type=dm.dtype, precision=HI
        )

    # pair forces (shared tail) + the radial jacobian's pair factor
    # Gmu[mu] = sum_{k: mu_k = mu} gamma_k U_k from the same k loop
    P, Dx, Dy, Dz, Gmu = _pair_force_terms(
        basic, MU, f, fp, inv_d, x, U, Um, lambda k: dm[k][None, :],
        want_gmu=True,
    )
    pair_ref[0] = (P * ux + Dx) * w
    pair_ref[1] = (P * uy + Dy) * w
    pair_ref[2] = (P * uz + Dz) * w

    # radial jacobian rows: rad[s2, mu, r] = sum_j [jt=s2] w cheb_r Gmu
    rad_rows = []
    for s2 in range(S):
        sel = w if S == 1 else jnp.where(jt == s2, 1.0, 0.0).astype(x.dtype) * w
        for mu in range(MU):
            gs = Gmu[mu] * sel if Gmu[mu] is not None else None
            for r in range(RB):
                rad_rows.append(
                    jnp.zeros((tn,), x.dtype)
                    if gs is None
                    else jnp.sum(cheb[r] * gs, axis=0)
                )
    n_rad = rad_ref.shape[0]
    for _ in range(n_rad - len(rad_rows)):
        rad_rows.append(jnp.zeros((tn,), x.dtype))
    rad_ref[:] = jnp.stack(rad_rows, axis=0)


def candidates_mega(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp):
    """Fused grade-step evaluation through the megakernel (window path).

    Returns dict(site_e (N,), basis_members (N, m_scal), rad (N, S*MU*RB),
    pair_tT (3, J, N)) — everything :func:`mtp_tpu.al.grades.
    candidates_and_forces` assembles, minus the force give-back and the
    (itype) block placement, which stay in XLA."""
    tables, B_pad, M, M_pad, mats = _prep_mega(sched)
    basic, S, MU, RB = tables[0], tables[1], tables[2], tables[3]
    J, N = mask.shape
    TN = _tile_n_cand(J)
    dtype = dispT.dtype
    mat_args = _pack_mats(mats, M, M_pad, dtype)

    mapping = np.asarray(sched.mapping)
    m_scal = len(mapping)
    ms_pad = -(-m_scal // 8) * 8
    bm_sel = np.zeros((ms_pad, M_pad), np.float32)
    bm_sel[np.arange(m_scal), mapping] = 1.0
    bm_sel = jnp.asarray(bm_sel, dtype)

    n_rad = S * MU * RB
    nr_pad = -(-n_rad // 8) * 8

    site, bm, rad, pair_t = pl.pallas_call(
        functools.partial(
            _mega_cand_kernel,
            sched_tables=tables,
            n_waves=len(mats),
            M_pad=M_pad,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, N), dtype),
            jax.ShapeDtypeStruct((ms_pad, N), dtype),
            jax.ShapeDtypeStruct((nr_pad, N), dtype),
            jax.ShapeDtypeStruct((3, J, N), dtype),
        ),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((3, J, TN), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mat_args],
        out_specs=(
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ms_pad, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr_pad, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, TN), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full, esp, bm_sel, *mat_args)
    return dict(
        site_e=site[0],
        basis_members=bm[:m_scal].T,
        rad=rad[:n_rad].T,
        pair_tT=pair_t,
    )


def pair_forces_mega(sched, dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full):
    """pair_tT (3, J, N) = d(sum site_e)/d(dispT), WITHOUT the forward energy
    kernel: the backward reconstructs the per-pair stage and the DAG
    residuals from xi itself, so forces never need site energies. MD steps
    use this (the reference's eflag economics, pair_mtp.cpp:72-90: energy is
    an on-demand observable, not a per-step cost) — the forward kernel runs
    its DAG at Precision.HIGHEST for the <1e-6 eV/atom energy gate, which
    costs ~3x its MXU passes and belongs on block boundaries, not in the
    step scan."""
    res = (dispT, mask, itypes, jtypes_t, radial_coeffs, xi_full)
    ones = jnp.ones((dispT.shape[2],), dispT.dtype)
    return _mega_bwd_vjp(sched, res, ones)[0]


# ----------------------------------------------------------------------
# feature-major DAG + readout (XLA; row slices on the leading axis)
# ----------------------------------------------------------------------


def _dag_matrices(sched):
    """Static one-hot matrices per wave: row gathers/scatter-adds become MXU
    matmuls (the TPU-native form of the product DAG — indices are trace-time
    constants, so the matrices are compile-time constants).

    Per wave: contrib = (W0 @ m) * (A1 @ m); m += S3 @ contrib, with the
    integer multiplier folded into W0.
    """
    M = sched.alpha_moments_count
    mats = []
    for wave in sched.waves():
        tw = len(wave)
        w0 = np.zeros((tw, M), np.float64)
        a1m = np.zeros((tw, M), np.float64)
        s3 = np.zeros((M, tw), np.float64)
        for r, (a0, a1, mult, a3) in enumerate(wave):
            w0[r, a0] = mult
            a1m[r, a1] = 1.0
            s3[a3, r] = 1.0
        mats.append((w0, a1m, s3))
    return mats


def contract_dag_t(sched, m_basic_t):
    """Moments (M, N) from basic moments (B, N), wave by wave, as matmuls."""
    N = m_basic_t.shape[1]
    M = sched.alpha_moments_count
    dtype = m_basic_t.dtype
    m = jnp.zeros((M, N), dtype=dtype)
    m = m.at[: sched.basic_count].set(m_basic_t)
    # HIGHEST: on TPU the default MXU precision rounds f32 operands
    # (PARITY.md); this path is the XLA cross-check side of the kernel
    # parity tests, so it must not inherit the same bias it checks for
    hi = jax.lax.Precision.HIGHEST
    for w0, a1m, s3 in _dag_matrices(sched):
        p0 = jnp.matmul(jnp.asarray(w0, dtype), m, precision=hi)
        p1 = jnp.matmul(jnp.asarray(a1m, dtype), m, precision=hi)
        m = m + jnp.matmul(jnp.asarray(s3, dtype), p0 * p1, precision=hi)
    return m


def site_energies_fused(sched, coeffs, dispT, mask, itypes_row, jtypes_t):
    """Per-atom energies via the fused kernel path. Shapes as in
    :func:`basic_moments_fused`; returns (N,)."""
    dtype = dispT.dtype
    mb = basic_moments_fused(
        sched, dispT, mask, itypes_row, jtypes_t, coeffs.radial_coeffs.astype(dtype)
    )
    m = contract_dag_t(sched, mb)
    basis_members = m[sched.mapping]  # (n_scalar, N)
    e = jnp.matmul(
        coeffs.moment_coeffs.astype(dtype),
        basis_members,
        precision=jax.lax.Precision.HIGHEST,
    )
    return e + coeffs.species_coeffs.astype(dtype)[itypes_row[0]]

