"""The MTP model: parameters + schedule + batched energy/force evaluation.

Splits the reference's monolithic pair style into the TPU-idiomatic pieces:

* :class:`MTPCoeffs` — the differentiable coefficient pytree (radial, species,
  linear), the arrays `PairMTP::read_file` loads (pair_mtp.cpp:441-569).
* :class:`MTPSchedule` (ops/moments.py) — the static contraction program
  (alpha tables), a trace-time constant.
* :func:`mtp_energy_forces` — energy, forces, virial over a padded neighbor
  representation; the analog of `PairMTP::compute` (pair_mtp.cpp:72-280) but
  batched over all atoms and differentiated by XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.mtp_file import MTPData
from mtp_tpu.ops.moments import (
    MTPSchedule,
    site_energies,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MTPCoeffs:
    """Differentiable MTP coefficients (a JAX pytree)."""

    radial_coeffs: jax.Array  # (S, S, MU, RB)
    species_coeffs: jax.Array  # (S,)
    moment_coeffs: jax.Array  # (n_scalar,)


@dataclasses.dataclass(frozen=True)
class MTPModel:
    """Bundle of schedule (static) + coefficients (pytree) + AL state."""

    schedule: MTPSchedule
    coeffs: MTPCoeffs
    inverse_active_set: Optional[jax.Array] = None  # (P, P)
    active_set: Optional[np.ndarray] = None
    configuration_mode: bool = False

    @property
    def cutoff(self) -> float:
        return self.schedule.max_dist

    @classmethod
    def from_data(cls, m: MTPData, dtype=jnp.float32) -> "MTPModel":
        sched = MTPSchedule.from_tables(
            species_count=m.species_count,
            radial_basis_size=m.radial_basis_size,
            radial_funcs_count=m.radial_funcs_count,
            min_dist=m.min_dist,
            max_dist=m.max_dist,
            scaling=m.scaling,
            alpha_moments_count=m.alpha_moments_count,
            alpha_index_basic=m.alpha_index_basic,
            alpha_index_times=m.alpha_index_times,
            alpha_moment_mapping=m.alpha_moment_mapping,
        )
        coeffs = MTPCoeffs(
            radial_coeffs=jnp.asarray(m.radial_coeffs, dtype=dtype),
            species_coeffs=jnp.asarray(m.species_coeffs, dtype=dtype),
            moment_coeffs=jnp.asarray(m.moment_coeffs, dtype=dtype),
        )
        inv = act = None
        cfg = False
        if m.mvs is not None:
            inv = jnp.asarray(m.mvs.inverse_active_set, dtype=dtype)
            act = m.mvs.active_set
            cfg = m.mvs.configuration_mode
        return cls(
            schedule=sched,
            coeffs=coeffs,
            inverse_active_set=inv,
            active_set=act,
            configuration_mode=cfg,
        )

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> "MTPModel":
        from mtp_tpu.io.mtp_file import load_mtp

        return cls.from_data(load_mtp(path), dtype=dtype)


def minimum_image(disp, cell, inv_cell):
    """Wrap displacement vectors to the nearest periodic image.

    Valid when the cell is at least twice the cutoff in every perpendicular
    width (the usual MD constraint; the reference inherits it from LAMMPS's
    domain decomposition).

    The 3x3 products are unrolled into per-component elementwise ops: a
    (..., 3) @ (3, 3) matmul uses 3/128 lanes on the MXU, while the unrolled
    form runs full-width on the VPU (~10x faster at N*J scale).
    """
    d = [disp[..., 0], disp[..., 1], disp[..., 2]]
    f = [
        d[0] * inv_cell[0, a] + d[1] * inv_cell[1, a] + d[2] * inv_cell[2, a]
        for a in range(3)
    ]
    f = [fa - jnp.round(fa) for fa in f]
    out = [
        f[0] * cell[0, a] + f[1] * cell[1, a] + f[2] * cell[2, a]
        for a in range(3)
    ]
    return jnp.stack(out, axis=-1)


def _gather_scalar(arr, idx):
    """Gather scalars by index through 8-lane-padded rows (fast TPU path)."""
    a8 = jnp.pad(arr[:, None], ((0, 0), (0, 7)))
    return a8[idx][..., 0]


def _gather_rows3(arr3, idx):
    """Gather (..., 3) rows by flat index, padded to 8 lanes first.

    TPU gathers move 8-lane-aligned (32 B) rows ~10x faster than 3-float
    rows; the pad + slice is fused around the gather.
    """
    a8 = jnp.pad(arr3, ((0, 0), (0, 5)))
    return a8[idx][..., :3]


def gather_displacements(positions, nbr_idx, cell=None, inv_cell=None):
    """disp[i, jj] = x[nbr_idx[i, jj]] - x[i], minimum-imaged if periodic."""
    disp = _gather_rows3(positions, nbr_idx) - positions[:, None, :]
    if cell is not None:
        disp = minimum_image(disp, cell, inv_cell)
    return disp


def gather_displacements_df(positions, nbr_idx, cell=None, inv_cell=None):
    """Exact double-float displacements: (hi, lo) with hi+lo == x_j - x_i
    minus the integer image shift, exactly, given f32 inputs.

    The raw subtraction uses the error-free two_sum; the image SHIFT decision
    is made in f32 (an integer choice, robust far from the wrap boundary —
    the same minimum-image validity constraint as `minimum_image`), and the
    shift correction -s @ cell is applied with exact two_prod accumulation.
    This removes minimum-image f32 rounding (~ulp(box) ~ 1.5e-5 A at 252 A)
    as an input perturbation to the df32 accuracy path — at bench scale that
    rounding alone would exceed the <1e-6 force gate.
    """
    from mtp_tpu.ops import df32 as df

    xj = _gather_rows3(positions, nbr_idx)
    xi = positions[:, None, :]
    hi, lo = df.two_sum(xj, -xi)
    if cell is None:
        return hi, lo
    d = [hi[..., 0], hi[..., 1], hi[..., 2]]
    s = [
        jnp.round(
            d[0] * inv_cell[0, a] + d[1] * inv_cell[1, a] + d[2] * inv_cell[2, a]
        )
        for a in range(3)
    ]
    out_hi, out_lo = [], []
    for a in range(3):
        acc = (hi[..., a], lo[..., a])
        for k in range(3):
            acc = df.add(acc, df.neg(df.prod_ff(s[k], cell[k, a])))
        out_hi.append(acc[0])
        out_lo.append(acc[1])
    return jnp.stack(out_hi, axis=-1), jnp.stack(out_lo, axis=-1)


@partial(
    jax.jit,
    static_argnames=("sched", "remat", "compute_vatom", "backend", "compute_virial"),
)
def mtp_energy_forces(
    sched: MTPSchedule,
    coeffs: MTPCoeffs,
    positions,
    types,
    nbr_idx,
    cell=None,
    nbr_mirror=None,
    *,
    jtypes=None,
    pair_valid=None,
    remat: bool = True,
    compute_vatom: bool = False,
    backend: str = "auto",
    compute_virial: bool = True,
):
    """Energy, forces, virial for one configuration.

    Args:
      positions: (N, 3).
      types: (N,) int32, 0-indexed species.
      nbr_idx: (N, J) int32 padded neighbor indices; padding entries must
        equal the row's own atom index (self-pairs are masked out).
      cell: optional (3, 3) row-vector cell for periodic boundaries.
      jtypes/pair_valid: optional precomputed (N, J) neighbor types and
        non-self-pair mask. These depend only on (types, nbr_idx), which are
        fixed for a whole neighbor-list block — but XLA does NOT hoist the
        (N, J) jtypes gather out of a `lax.scan` (measured ~11 ms/step at
        32k x 48 on v5e), so callers stepping in a scan must precompute them
        outside the loop (Simulation does).
      backend: "pallas" (fused TPU kernels; interpreted on CPU), "xla",
        "auto" (pallas on TPU, xla elsewhere), or "df32" — the double-float
        accuracy mode (ops/moments_df.py): the reference's all-double
        accuracy class (pair_mtp.cpp) on f64-less TPU hardware, ~1e-7 force
        parity vs the f64 oracle at a several-x cost; for validation /
        reference-grade single points, not the MD hot loop.

    Returns dict: energy (scalar), site_energies (N,), forces (N,3),
    virial (6,) in Voigt order (xx,yy,zz,xy,xz,yz), and optionally
    vatom (N,6).
    """
    n = positions.shape[0]
    inv_cell = jnp.linalg.inv(cell) if cell is not None else None
    disp_lo = None
    if backend == "df32":
        disp, disp_lo = gather_displacements_df(positions, nbr_idx, cell, inv_cell)
    else:
        disp = gather_displacements(positions, nbr_idx, cell, inv_cell)
    d2 = jnp.sum(disp * disp, axis=-1)
    if pair_valid is None:
        pair_valid = nbr_idx != jnp.arange(n, dtype=nbr_idx.dtype)[:, None]
    mask = (d2 <= sched.max_dist**2) & pair_valid

    itypes = types
    if jtypes is None:
        jtypes = _gather_scalar(types, nbr_idx)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if backend == "pallas":
        site_e, pair_t = _pallas_site_energy_vjp(
            sched, coeffs, disp, mask, itypes, jtypes
        )
    elif backend == "df32":
        # reference-accuracy-class (all-double, pair_mtp.cpp) evaluation on
        # f64-less TPU hardware: the whole chain in double-float arithmetic
        from mtp_tpu.ops.moments_df import energy_and_pair_forces_df

        site_e, pair_t = energy_and_pair_forces_df(
            sched, coeffs, disp, mask, itypes, jtypes, disp_lo=disp_lo
        )
    else:
        fn = site_energies
        if remat:
            fn = jax.checkpoint(fn, static_argnums=(0,))
        site_e, vjp = jax.vjp(
            lambda d: fn(sched, coeffs, d, mask, itypes, jtypes), disp
        )
        (pair_t,) = vjp(jnp.ones_like(site_e))
        pair_t = pair_t * mask[..., None].astype(pair_t.dtype)

    # Newton's third law (pair_mtp.cpp:248-254): +T to the center, -T to each
    # neighbor. With the flat mirror permutation the give-back is a GATHER of
    # the mirrored pair's T (full lists are symmetric) — scatters serialize
    # on TPU, gathers don't.
    if nbr_mirror is not None:
        flat = pair_t.reshape(-1, 3)
        t_ji = _gather_rows3(flat, nbr_mirror).reshape(pair_t.shape)
        t_ji = t_ji * mask[..., None].astype(pair_t.dtype)
        forces = jnp.sum(pair_t - t_ji, axis=1)
    else:
        forces = jnp.sum(pair_t, axis=1)
        forces = forces.at[nbr_idx.reshape(-1)].add(-pair_t.reshape(-1, 3))

    out = dict(
        energy=jnp.sum(site_e),
        site_energies=site_e,
        forces=forces,
    )
    if compute_virial or compute_vatom:
        # virial tally (pair_mtp.cpp:257-266): W -= sym(T (x) r). Optional,
        # like LAMMPS's vflag: NVE inner steps don't need per-step pressure.
        r = jnp.where(mask[..., None], disp, 0.0)
        vatom = _virial_tally(pair_t, r)
        out["virial"] = jnp.sum(vatom, axis=0)
        if compute_vatom:
            out["vatom"] = vatom
    else:
        out["virial"] = jnp.zeros((6,), dtype=forces.dtype)
    return out


def _virial_tally(pair_t, r):
    """Per-atom virial tally (N, 6) in Voigt order (xx,yy,zz,xy,xz,yz)."""
    vxx = -jnp.sum(pair_t[..., 0] * r[..., 0], axis=1)
    vyy = -jnp.sum(pair_t[..., 1] * r[..., 1], axis=1)
    vzz = -jnp.sum(pair_t[..., 2] * r[..., 2], axis=1)
    vxy = -0.5 * jnp.sum(
        pair_t[..., 0] * r[..., 1] + pair_t[..., 1] * r[..., 0], axis=1
    )
    vxz = -0.5 * jnp.sum(
        pair_t[..., 0] * r[..., 2] + pair_t[..., 2] * r[..., 0], axis=1
    )
    vyz = -0.5 * jnp.sum(
        pair_t[..., 1] * r[..., 2] + pair_t[..., 2] * r[..., 1], axis=1
    )
    return jnp.stack([vxx, vyy, vzz, vxy, vxz, vyz], axis=-1)


def _pallas_site_energy_vjp(sched, coeffs, disp, mask, itypes, jtypes):
    """Site energies + per-pair forces through the fused Pallas kernels.

    Repacks (N, J, ...) pair data to the kernels' lane-major layout
    ((3, J, N) / (J, N), N padded to 128, J to 8), runs the fully-fused
    custom-vjp megakernel, and unpacks pair_T back to (N, J, 3).
    """
    import numpy as _np

    from mtp_tpu.ops.pallas_moments import _tile_n, site_energies_mega

    n, j = mask.shape
    j_pad = (-j) % 8
    n_pad = (-n) % _tile_n(j + j_pad)
    dtype = disp.dtype

    dispT = jnp.moveaxis(disp, (0, 1, 2), (2, 1, 0))  # (3, J, N)
    maskf = mask.astype(dtype).T  # (J, N)
    it_row = itypes[None, :].astype(jnp.int32)
    jt_t = jtypes.T.astype(jnp.int32)
    esp = coeffs.species_coeffs.astype(dtype)[itypes][None, :]  # (1, N)
    if n_pad or j_pad:
        dispT = jnp.pad(dispT, ((0, 0), (0, j_pad), (0, n_pad)))
        maskf = jnp.pad(maskf, ((0, j_pad), (0, n_pad)))
        it_row = jnp.pad(it_row, ((0, 0), (0, n_pad)))
        jt_t = jnp.pad(jt_t, ((0, j_pad), (0, n_pad)))
        esp = jnp.pad(esp, ((0, 0), (0, n_pad)))

    m_total = sched.alpha_moments_count
    m_pad = -(-m_total // 8) * 8
    mapping = _np.asarray(sched.mapping)
    xi_full = (
        jnp.zeros((1, m_pad), dtype)
        .at[0, mapping]
        .set(coeffs.moment_coeffs.astype(dtype))
    )

    site_e, vjp = jax.vjp(
        lambda d: site_energies_mega(
            sched, d, maskf, it_row, jt_t,
            coeffs.radial_coeffs.astype(dtype), xi_full, esp,
        ),
        dispT,
    )
    (pair_tT,) = vjp(jnp.ones_like(site_e))
    site_e = site_e[:n]
    pair_t = jnp.moveaxis(pair_tT, (0, 1, 2), (2, 1, 0))[:n, :j, :]
    return site_e, pair_t


def mtp_energy(sched, coeffs, positions, types, nbr_idx, cell=None):
    """Total potential energy only (no force computation)."""
    n = positions.shape[0]
    inv_cell = jnp.linalg.inv(cell) if cell is not None else None
    disp = gather_displacements(positions, nbr_idx, cell, inv_cell)
    d2 = jnp.sum(disp * disp, axis=-1)
    self_pair = nbr_idx == jnp.arange(n, dtype=nbr_idx.dtype)[:, None]
    mask = (d2 <= sched.max_dist**2) & (~self_pair)
    return jnp.sum(
        site_energies(sched, coeffs, disp, mask, types, types[nbr_idx])
    )


# ----------------------------------------------------------------------
# banded-window force path (bin-sorted, in-kernel disp gather; TPU fast path)
# ----------------------------------------------------------------------


def _window_geometry(sched, positions, cell, swl, pair_valid_t, sorted_io):
    """Shared preamble of every window-path evaluator: sorted/padded
    positions -> in-kernel displacement gather -> the distance+validity
    mask. ONE implementation so the mask convention cannot drift between
    the force, energy, and grade paths (they must stay bitwise consistent
    for the eflag split and AL force refresh to be exact).

    Returns (pos_s (N_pad, 3), dispT (3, J, N_pad), maskf (J, N_pad))."""
    from mtp_tpu.ops.window_disp import window_disp

    n = positions.shape[0]
    n_pad = swl.idx.shape[0]
    pos_s = positions if sorted_io else _gather_rows3(positions, swl.order)
    if n_pad != n:
        pos_s = jnp.pad(pos_s, ((0, n_pad - n), (0, 0)))
    dispT = window_disp(pos_s, swl.window_idx, swl.wl, swl.wl_counts, cell)
    d2 = dispT[0] ** 2 + dispT[1] ** 2 + dispT[2] ** 2
    maskf = jnp.where(
        (d2 <= sched.max_dist**2) & pair_valid_t, 1.0, 0.0
    ).astype(positions.dtype)
    return pos_s, dispT, maskf


def _window_forces_from_pairs(pair_tT, swl):
    """Sorted-space forces (N_pad, 3) from per-pair forces (3, J, N_pad):
    the Newton give-back via the octant-aligned kernel when the list carries
    its metadata, else the flat mirror gather."""
    if swl.gb is not None:
        # in-kernel Newton give-back: no (N*J)-row mirror gather, no
        # moveaxis relayouts (ops/window_giveback.py). pair_tT's masked
        # slots are zero, so plain slot-sums need no extra mask.
        from mtp_tpu.ops.window_giveback import window_giveback

        f_own = jnp.sum(pair_tT, axis=1)  # (3, N_pad)
        f_give = window_giveback(pair_tT, swl.wl, swl.gb)
        return (f_own - f_give).T
    pair_t = jnp.moveaxis(pair_tT, (0, 1, 2), (2, 1, 0))  # (N_pad, J, 3)
    flat = pair_t.reshape(-1, 3)
    # no mask multiply: masked slots of pair_T are already zero, pads
    # mirror among themselves, and the distance mask is bitwise
    # symmetric (antisymmetric min-image disp). Masking by THIS row's
    # maskf would also break the sharded path, where ghost rows must
    # accumulate t_ji from own-centered pairs (their own mask is off).
    t_ji = _gather_rows3(flat, swl.mirror).reshape(pair_t.shape)
    return jnp.sum(pair_t - t_ji, axis=1)  # (N_pad, 3)


@partial(
    jax.jit,
    static_argnames=(
        "sched", "compute_virial", "compute_vatom", "sorted_io",
        "compute_energy",
    ),
)
def mtp_energy_forces_window(
    sched,
    coeffs,
    positions,
    cell,
    swl,
    *,
    it_row,
    jtypes_t,
    pair_valid_t,
    esp,
    xi_full,
    compute_virial: bool = True,
    compute_vatom: bool = False,
    sorted_io: bool = False,
    compute_energy: bool = True,
):
    """Energy/forces/virial through the banded-window kernel path.

    Same math as :func:`mtp_energy_forces` with backend="pallas", but the
    per-pair displacement gather happens inside a Pallas kernel over
    bin-sorted atoms (ops/window_disp.py) instead of the serializing XLA
    row gather. `positions` stays in user order; `swl` is a
    :class:`~mtp_tpu.ops.neighbors.SortedNeighborList`; the (J, N_pad)
    arrays (`it_row`, `jtypes_t`, `pair_valid_t`, `esp`, `xi_full`) are
    rebuild-constant and must be precomputed outside any step scan (XLA
    does not hoist them, see mtp_energy_forces).

    `sorted_io=True`: `positions` are ALREADY in sorted space (row k =
    atom order[k], shape (N, 3)) and forces/site_energies/vatom are
    returned in sorted space too — no per-call order gathers. Step scans
    use this (the two (N,)-row permutes cost ~20 ms/step at 1M; sorting
    once per block and integrating in sorted space makes them per-block).

    `compute_energy=False`: skip the forward energy kernel entirely —
    forces come from the standalone backward (pair_forces_mega), which
    reconstructs everything from xi. The reference's eflag economics
    (pair_mtp.cpp:72-90): MD steps need forces (+virial under NPT), energy
    is an observable computed at block boundaries. The forward's DAG runs
    at Precision.HIGHEST for the <1e-6 eV/atom gate (3x its MXU passes),
    so keeping it out of the step scan is both faster AND lets the energy
    stay exact. energy/site_energies are returned as zeros.
    """
    from mtp_tpu.ops.pallas_moments import pair_forces_mega, site_energies_mega

    n = positions.shape[0]
    n_pad = swl.idx.shape[0]
    dtype = positions.dtype

    _, dispT, maskf = _window_geometry(
        sched, positions, cell, swl, pair_valid_t, sorted_io
    )
    rc = coeffs.radial_coeffs.astype(dtype)
    if compute_energy:
        site_e = site_energies_mega(
            sched, dispT, maskf, it_row, jtypes_t, rc, xi_full, esp
        )
    else:
        site_e = jnp.zeros((n_pad,), dtype)
    pair_tT = pair_forces_mega(
        sched, dispT, maskf, it_row, jtypes_t, rc, xi_full
    )

    forces_s = _window_forces_from_pairs(pair_tT, swl)
    if sorted_io:
        forces = forces_s[:n]
        out = dict(
            energy=jnp.sum(site_e),
            site_energies=site_e[:n],
            forces=forces,
        )
    else:
        forces = _gather_rows3(forces_s, swl.inv_order)  # user order, (N, 3)
        out = dict(
            energy=jnp.sum(site_e),
            site_energies=site_e[swl.inv_order],
            forces=forces,
        )
    if compute_vatom:
        # per-atom tally (v_tally_xyz per pair, pair_mtp_kokkos.cpp:639-643),
        # computed in the transposed layout as J-axis sums — no (N, J, 3)
        # relayout — then gathered back to user order. Matches the XLA
        # path's _virial_tally convention (full-list double count = the
        # half-share each end receives).
        rT = dispT * maskf[None]
        vxx = -jnp.sum(pair_tT[0] * rT[0], axis=0)
        vyy = -jnp.sum(pair_tT[1] * rT[1], axis=0)
        vzz = -jnp.sum(pair_tT[2] * rT[2], axis=0)
        vxy = -0.5 * jnp.sum(pair_tT[0] * rT[1] + pair_tT[1] * rT[0], axis=0)
        vxz = -0.5 * jnp.sum(pair_tT[0] * rT[2] + pair_tT[2] * rT[0], axis=0)
        vyz = -0.5 * jnp.sum(pair_tT[1] * rT[2] + pair_tT[2] * rT[1], axis=0)
        vatom_s = jnp.stack([vxx, vyy, vzz, vxy, vxz, vyz], axis=-1)
        out["vatom"] = (
            vatom_s[:n] if sorted_io else vatom_s[swl.inv_order]
        ).astype(forces.dtype)
        out["virial"] = jnp.sum(vatom_s, axis=0).astype(forces.dtype)
    elif compute_virial:
        # global virial straight from the transposed layouts (the per-atom
        # tally would force (N, J, 3) relayouts the kernel path avoids)
        rT = dispT * maskf[None]
        pxx = -jnp.sum(pair_tT[0] * rT[0])
        pyy = -jnp.sum(pair_tT[1] * rT[1])
        pzz = -jnp.sum(pair_tT[2] * rT[2])
        pxy = -0.5 * jnp.sum(pair_tT[0] * rT[1] + pair_tT[1] * rT[0])
        pxz = -0.5 * jnp.sum(pair_tT[0] * rT[2] + pair_tT[2] * rT[0])
        pyz = -0.5 * jnp.sum(pair_tT[1] * rT[2] + pair_tT[2] * rT[1])
        out["virial"] = jnp.stack([pxx, pyy, pzz, pxy, pxz, pyz]).astype(
            forces.dtype
        )
    else:
        out["virial"] = jnp.zeros((6,), dtype=forces.dtype)
    return out


@partial(jax.jit, static_argnames=("sched", "sorted_io"))
def mtp_energy_window(
    sched,
    coeffs,
    positions,
    cell,
    swl,
    *,
    it_row,
    jtypes_t,
    pair_valid_t,
    esp,
    xi_full,
    sorted_io: bool = False,
):
    """Total potential energy only (forward kernel, Precision.HIGHEST DAG):
    the block-boundary companion of
    ``mtp_energy_forces_window(compute_energy=False)``. ~half a force
    evaluation; runs once per neighbor block, not per step."""
    from mtp_tpu.ops.pallas_moments import site_energies_mega

    dtype = positions.dtype
    _, dispT, maskf = _window_geometry(
        sched, positions, cell, swl, pair_valid_t, sorted_io
    )
    site_e = site_energies_mega(
        sched, dispT, maskf, it_row, jtypes_t,
        coeffs.radial_coeffs.astype(dtype), xi_full, esp,
    )
    return jnp.sum(site_e)


def window_constants(sched, coeffs, types, swl, dtype, center_mask=None):
    """Rebuild-constant (J, N_pad) arrays for the window path: neighbor
    types, self-pair mask, per-atom species energies (zero on padding rows),
    and the padded readout vector. Compute OUTSIDE the step scan.

    `center_mask`: optional (N,) bool in the same (user) order as `types`;
    False rows are excluded as CENTERS — their pairs are masked and their
    species energy zeroed, so site_e and pair_T vanish there. The sharded
    path uses this to restrict the compute to own atoms of the
    halo-extended set (ghost neighborhoods are incomplete; their site
    energies/forces come from the owning shard)."""
    import numpy as _np

    n = types.shape[0]
    n_pad = swl.idx.shape[0]
    types_s = types[swl.order].astype(jnp.int32)
    types_pad = jnp.zeros((n_pad,), jnp.int32).at[:n].set(types_s)
    it_row = types_pad[None, :]
    jtypes_t = _gather_scalar(types_pad, swl.idx).T.astype(jnp.int32)
    rows = jnp.arange(n_pad, dtype=swl.idx.dtype)
    pair_valid_t = (swl.idx != rows[:, None]).T
    center_ok = rows < n
    if center_mask is not None:
        cm_s = center_mask[swl.order]
        center_ok = center_ok & jnp.zeros((n_pad,), bool).at[:n].set(cm_s)
    pair_valid_t = pair_valid_t & center_ok[None, :]
    esp = coeffs.species_coeffs.astype(dtype)[types_pad]
    esp = jnp.where(center_ok, esp, 0.0)[None, :]
    return dict(
        it_row=it_row,
        jtypes_t=jtypes_t,
        pair_valid_t=pair_valid_t,
        esp=esp,
        xi_full=readout_vector(sched, coeffs, dtype),
    )


def readout_vector(sched, coeffs, dtype):
    """(1, M_pad) moment-coefficient vector scattered over the full moment
    axis (zeros at non-scalar moments), the megakernel's readout operand."""
    import numpy as _np

    m_total = sched.alpha_moments_count
    m_pad = -(-m_total // 8) * 8
    mapping = _np.asarray(sched.mapping)
    return (
        jnp.zeros((1, m_pad), dtype)
        .at[0, mapping]
        .set(coeffs.moment_coeffs.astype(dtype))
    )
