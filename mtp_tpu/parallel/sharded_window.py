"""Multi-chip MD with the single-chip Pallas kernel pipeline rank-local.

`make_sharded_md_block` (parallel/sharded_md.py) evaluates forces with the
XLA row-gather path inside one fused block program — correct, but well below
the banded-window pipeline that produces the single-chip headline. This
module runs THAT pipeline unchanged inside `shard_map`, the same design
point as the reference: its Kokkos kernel pipeline runs unchanged on each
MPI rank's local+ghost view (pair_mtp_kokkos.cpp:287-361).

Structure (two SEPARATE dispatches — fusing a neighbor rebuild into the
step-scan program makes the scan ~30% slower, see CLAUDE.md):

* `rebuild`: migrate atoms whose slab changed -> face-shell halo selection
  -> position/type/real exchange (ring ppermute) -> bin-sorted window
  neighbor build over the halo-EXTENDED set (ghost rows get neighbor rows
  too, so the mirror/give-back machinery sees a symmetric list) ->
  rebuild-constant pair tables (types, masks, octant slots, worklists).
* `steps`: a `lax.scan` of integrator steps (NVE / NHC-NVT / iso-MTK NPT /
  aniso+triclinic MTK NPT — the tensor-barostat reductions psum over the
  mesh like the scalar ones);
  each force evaluation is two (H, 3) ppermutes (ghost positions in, ghost
  force contributions out) around :func:`mtp_energy_forces_window` — the
  window displacement kernel + fused megakernel + in-kernel Newton
  give-back, exactly the single-chip fast path.

Ghost centers are masked out of the compute (`center_mask`): a ghost's
neighborhood is incomplete (the halo is one cutoff+skin deep), so its site
energy and pair derivatives are not computable locally — its owner computes
them and receives the mirrored contributions instead. Cross-shard Newton
give-back (LAMMPS reverse comm, pair_mtp.cpp:248-254) is then just the
ghost-row slice of the force array: masked ghost rows accumulate exactly
-sum_j t_{j->ghost} from own-centered pairs, which ppermutes back to the
owner and adds on.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mtp_tpu.md import integrators as itg
from mtp_tpu.models.mtp import (
    MTPModel,
    mtp_energy_forces_window,
    mtp_energy_window,
    readout_vector,
    window_constants,
)
from mtp_tpu.ops.neighbors import SortedNeighborList, build_sorted_neighbor_list
from mtp_tpu.ops.window_disp import TN
from mtp_tpu.parallel.sharded_md import (
    ShardedState,
    _exchange,
    _halo_select,
    _migrate,
)
from mtp_tpu.utils import units


class ShardedRunFlags(NamedTuple):
    """Replicated device-bool flags of a sharded window run."""

    neighbor_overflow: jax.Array  # list/bin/worklist capacity or geometry
    halo_overflow: jax.Array  # face-shell selection exceeded halo capacity
    migrate_overflow: jax.Array  # migration buffers / free slots exceeded
    escape: jax.Array  # an atom jumped past the adjacent slab in one block
    stale: jax.Array  # an atom outran the Verlet skin mid-block

    def any(self):
        return (
            self.neighbor_overflow
            | self.halo_overflow
            | self.migrate_overflow
            | self.escape
            | self.stale
        )


# ctx keys whose arrays are laid out (J, N_pad) / (1, N_pad): sharded along
# the second axis under shard_map
_COL_SHARDED = ("it_row", "jtypes_t", "pair_valid_t", "esp", "gb_ilF", "gb_o2F")


@dataclasses.dataclass(eq=False)
class ShardedSimulation:
    """Host-side controller for multi-chip MD on the window kernel path.

    The per-atom arrays of :class:`ShardedState` are (nd*capacity, ...),
    sharded along the mesh axis. `run` mirrors `Simulation.run_async`:
    a host loop of (rebuild dispatch, steps dispatch) per Verlet block,
    flags checked once at the end.
    """

    model: MTPModel
    mesh: object
    capacity: int
    max_neighbors: int
    grid: tuple
    skin: float = 0.5
    steps_per_rebuild: int = 10
    halo_capacity: Optional[int] = None
    migrate_capacity: Optional[int] = None
    giveback: str | bool = "auto"
    slab_axis: int = 0
    compute_virial: bool = False

    def __post_init__(self):
        mesh = self.mesh
        self.axis = mesh.axis_names[0]
        self.nd = mesh.devices.size
        C = self.capacity
        if self.max_neighbors % 8:
            raise ValueError("max_neighbors must be a multiple of 8")
        if min(self.grid) < 3:
            raise ValueError(
                f"window path needs >=3 bins per dim, grid={self.grid}; "
                "use make_sharded_md_block for small boxes"
            )
        self.H = (
            self.halo_capacity
            if self.halo_capacity is not None
            else (C if self.nd > 1 else 0)
        )
        self.E = (
            self.migrate_capacity
            if self.migrate_capacity is not None
            else max(8, C // 8)
        )
        self.NE = C + 2 * self.H
        self.n_pad = -(-self.NE // TN) * TN
        ncells = int(np.prod(self.grid))
        # each shard's extended set is a SUBSET of the global atom set per
        # bin (ghosts are other slabs' atoms at their original coords), so
        # the single-chip uniform-density cap applies; overflow is flagged
        self.bin_cap = max(1, int(np.ceil(2.2 * self.nd * C / ncells))) + 12
        self.w_cut = self.model.cutoff + self.skin
        if self.giveback == "auto":
            # same policy as the single-chip Simulation: the in-kernel
            # give-back beats the flat mirror at every measured size once
            # the octant classes have full capacity (J/8 >= 8); J=56's
            # capacity-7 classes spill ~5x more and can overflow the
            # per-row spill budget at 300 K
            self.gb_on = self.max_neighbors >= 64
        else:
            self.gb_on = bool(self.giveback)
        self.perm_fwd = [(i, (i + 1) % self.nd) for i in range(self.nd)]
        self.perm_bwd = [(i, (i - 1) % self.nd) for i in range(self.nd)]
        self._comm = dict(
            axis=self.axis, nd=self.nd,
            perm_fwd=self.perm_fwd, perm_bwd=self.perm_bwd,
        )
        self._rebuild_fn = None
        self._steps_cache = {}

    # ------------------------------------------------------------ rebuild

    def _make_rebuild(self):
        C, H, NE = self.capacity, self.H, self.NE
        model, grid, w_cut = self.model, self.grid, self.w_cut
        sched, coeffs = model.schedule, model.coeffs
        gb_on, bin_cap = self.gb_on, self.bin_cap
        axis = self.axis

        def rebuild_shard(pos, vel, f, types, masses, real, ids, cell):
            inv_cell = jnp.linalg.inv(cell)
            (pos, vel, f, types, masses, real, ids), (mig_ovf, escape) = (
                _migrate(
                    pos, vel, f, types, masses, real, ids, inv_cell,
                    E=self.E, slab_axis=self.slab_axis, **self._comm,
                )
            )
            sel_r, val_r, sel_l, val_l, halo_ovf = _halo_select(
                pos, real, inv_cell,
                H=H, w_cut=w_cut, slab_axis=self.slab_axis, **self._comm,
            )

            def exch(x, fill):
                return _exchange(
                    x, sel_r, val_r, sel_l, val_l, fill, H=H, **self._comm
                )

            ext_pos = exch(pos, jnp.asarray(0.0, pos.dtype))
            ext_types = exch(types, jnp.asarray(0, types.dtype))
            ext_real = exch(real, False)
            swl = build_sorted_neighbor_list(
                ext_pos, cell, w_cut,
                max_neighbors=self.max_neighbors, grid=grid,
                align_slots=gb_on, real=ext_real, bin_capacity=bin_cap,
            )
            own_mask = (jnp.arange(NE) < C) & ext_real
            consts = window_constants(
                sched, coeffs, ext_types, swl, pos.dtype,
                center_mask=own_mask,
            )
            consts.pop("xi_full")  # replicated constant; closed over in steps
            ctx = dict(
                order=swl.order, inv_order=swl.inv_order, idx=swl.idx,
                window_idx=swl.window_idx, wl=swl.wl,
                wl_counts=swl.wl_counts, mirror=swl.mirror,
                sel_r=sel_r, val_r=val_r, sel_l=sel_l, val_l=val_l,
                **consts,
            )
            if gb_on:
                for k in ("bases", "off", "ilF", "o2F", "sp_dst", "sp_src"):
                    ctx["gb_" + k] = swl.gb[k]
            flags = (
                jax.lax.pmax(swl.overflow, axis),
                jax.lax.pmax(halo_ovf, axis),
                jax.lax.pmax(mig_ovf, axis),
                jax.lax.pmax(escape, axis),
            )
            return (pos, vel, f, types, masses, real, ids), ctx, flags

        axis_p = P(self.axis)
        ctx_specs = dict(
            order=axis_p, inv_order=axis_p, idx=axis_p, window_idx=axis_p,
            wl=axis_p, wl_counts=axis_p, mirror=axis_p,
            sel_r=axis_p, val_r=axis_p, sel_l=axis_p, val_l=axis_p,
            it_row=P(None, self.axis), jtypes_t=P(None, self.axis),
            pair_valid_t=P(None, self.axis), esp=P(None, self.axis),
        )
        if gb_on:
            ctx_specs.update(
                gb_bases=axis_p, gb_off=axis_p,
                gb_ilF=P(None, self.axis), gb_o2F=P(None, self.axis),
                gb_sp_dst=axis_p, gb_sp_src=axis_p,
            )
        sharded = jax.shard_map(
            rebuild_shard,
            mesh=self.mesh,
            in_specs=(axis_p,) * 7 + (P(),),
            out_specs=(
                (axis_p,) * 7,
                ctx_specs,
                (P(), P(), P(), P()),
            ),
            check_vma=False,
        )
        return jax.jit(sharded)

    def rebuild(self, state: ShardedState):
        """Migration + halo selection + window neighbor build as one
        dispatch. Returns (state, ctx, flags4)."""
        if self._rebuild_fn is None:
            self._rebuild_fn = self._make_rebuild()
        (pos, vel, f, types, masses, real, ids), ctx, flags = self._rebuild_fn(
            state.positions, state.velocities, state.forces, state.types,
            state.masses, state.real, state.ids, state.cell,
        )
        state = dataclasses.replace(
            state, positions=pos, velocities=vel, forces=f, types=types,
            masses=masses, real=real, ids=ids,
        )
        return state, ctx, flags

    # -------------------------------------------------------------- steps

    def _make_steps(self, key):
        (ensemble, n_steps, dt, temperature, pressure, tdamp, pdamp,
         refresh) = key
        C, H, NE = self.capacity, self.H, self.NE
        model = self.model
        sched, coeffs = model.schedule, model.coeffs
        axis = self.axis
        nd = self.nd
        gb_on = self.gb_on
        aniso = ensemble in ("npt-aniso", "npt-tri")
        couple = "tri" if ensemble == "npt-tri" else "aniso"
        cv = self.compute_virial or ensemble == "npt" or aniso
        cut_skin = self.w_cut
        skin = self.skin
        perm_fwd, perm_bwd = self.perm_fwd, self.perm_bwd
        half = 0.5 * dt * units.FTM2A

        def steps_shard(pos, vel, f, masses, real, cell, thermo, pe_in, vir_in, ctx):
            dtype = pos.dtype
            xi_full = readout_vector(sched, coeffs, dtype)
            gb = None
            if gb_on:
                gb = {
                    k: ctx["gb_" + k]
                    for k in ("bases", "off", "ilF", "o2F", "sp_dst", "sp_src")
                }
            swl = SortedNeighborList(
                order=ctx["order"], inv_order=ctx["inv_order"],
                idx=ctx["idx"], mirror=ctx["mirror"],
                window_idx=ctx["window_idx"], wl=ctx["wl"],
                wl_counts=ctx["wl_counts"],
                overflow=jnp.zeros((), bool),
                reference_positions=jnp.zeros((1, 3), dtype),
                reference_cell=cell, rev=None, aligned=None, gb=gb,
            )
            sel_r, val_r = ctx["sel_r"], ctx["val_r"]
            sel_l, val_l = ctx["sel_l"], ctx["val_l"]
            consts = dict(
                it_row=ctx["it_row"], jtypes_t=ctx["jtypes_t"],
                pair_valid_t=ctx["pair_valid_t"], esp=ctx["esp"],
                xi_full=xi_full,
            )

            def exch(x, fill):
                return _exchange(
                    x, sel_r, val_r, sel_l, val_l, fill, H=H, **self._comm
                )

            def force_eval(pos, cell, compute_energy=False):
                # compute_energy=False in the step scan: energy is an
                # observable, refreshed once per block below (the eflag
                # economics — the forward kernel's HIGHEST-precision DAG
                # stays off the hot loop). pe then psums to 0 and the
                # block-end refresh overwrites it.
                ext_pos = exch(pos, jnp.asarray(0.0, dtype))
                out = mtp_energy_forces_window(
                    sched, coeffs, ext_pos, cell, swl,
                    compute_virial=cv, compute_energy=compute_energy,
                    **consts,
                )
                f_ext = out["forces"]
                fo = f_ext[:C]
                if nd > 1:
                    # ghost rows hold -sum_j t_{j->ghost}: ship back to the
                    # owner and ADD (the cross-shard Newton give-back;
                    # LAMMPS reverse comm analog)
                    back_r = jax.lax.ppermute(f_ext[C : C + H], axis, perm_bwd)
                    back_l = jax.lax.ppermute(f_ext[C + H :], axis, perm_fwd)
                    fo = fo.at[sel_r].add(
                        jnp.where(val_r[:, None], back_r, 0.0)
                    )
                    fo = fo.at[sel_l].add(
                        jnp.where(val_l[:, None], back_l, 0.0)
                    )
                pe = jax.lax.psum(out["energy"], axis)
                vir = jax.lax.psum(out["virial"], axis)
                return fo, pe, vir

            mass_col = masses[:, None]
            n_total = jax.lax.psum(jnp.sum(real), axis)
            ndof = 3.0 * n_total
            kt = units.KB * temperature
            q1 = ndof * kt * tdamp**2
            q2 = kt * tdamp**2
            p_ext = pressure / units.EVA3_TO_BAR
            w_b, qb1, qb2 = itg._npt_masses(ndof, kt, tdamp, pdamp)
            # aniso/tri MTK: the barostat momentum is a symmetric tensor
            # (Voigt-6 in thermo[8:14]); n_modes thermostatted modes
            n_modes = 6 if couple == "tri" else 3
            qb1_a = n_modes * qb1
            eye3 = jnp.eye(3, dtype=dtype)

            def ke2_of(vel):
                return jax.lax.psum(
                    jnp.sum(
                        jnp.where(real[:, None], mass_col * vel * vel, 0.0)
                    )
                    * units.MVV2E,
                    axis,
                )

            def nhc_half(vel, xi, eta):
                scale, xi, eta = itg._nhc_chain_half(
                    ke2_of(vel), ndof, xi, eta, dt, kt, q1=q1, q2=q2
                )
                return vel * scale, xi, eta

            def baro_chain_half(bv, bxi, beta):
                scale, bxi, beta = itg._nhc_chain_half(
                    w_b * bv**2, 1.0, bxi, beta, dt, kt, q1=qb1, q2=qb2
                )
                return bv * scale, bxi, beta

            def omega_dot_half(vel, vir, cell, bv):
                vol = jnp.abs(jnp.linalg.det(cell))
                w_tr = vir[0] + vir[1] + vir[2]
                ke2 = ke2_of(vel)
                p_int = (ke2 + w_tr) / (3.0 * vol)
                g = (3.0 * vol * (p_int - p_ext) + (3.0 / ndof) * ke2) / w_b
                return bv + 0.5 * dt * g

            # ---- aniso/tri MTK pieces (tensor barostat, Voigt-6 state);
            # the per-shard math mirrors integrators.npt_aniso_step with the
            # two scalar reductions (KE tensor, virial) psum'd over shards
            def _couple6(bv6):
                if couple == "tri":
                    return bv6
                return bv6 * jnp.asarray([1, 1, 1, 0, 0, 0], dtype)

            def baro_chain_half_a(bv6, bxi, beta):
                sumsq = jnp.sum(bv6[:3] * bv6[:3]) + 2.0 * jnp.sum(
                    bv6[3:] * bv6[3:]
                )
                scale, bxi, beta = itg._nhc_chain_half(
                    w_b * sumsq, n_modes, bxi, beta, dt, kt, q1=qb1_a, q2=qb2
                )
                return bv6 * scale, bxi, beta

            def omega_dot_half_a(vel, vir, cell, bv6):
                vol = jnp.abs(jnp.linalg.det(cell))
                mv = jnp.where(real[:, None], mass_col * vel, 0.0)
                # HIGHEST: default MXU precision rounds the f32 operands of
                # this (3,N)@(N,3) reduction (scratch/probe_precision.py)
                mvv = units.MVV2E * jax.lax.psum(
                    jnp.matmul(
                        mv.T, vel, precision=jax.lax.Precision.HIGHEST
                    ),
                    axis,
                )
                p_int = (mvv + itg._voigt_to_tensor(vir)) / vol
                ke2 = ke2_of(vel)
                g = (vol * (p_int - p_ext * eye3) + (ke2 / ndof) * eye3) / w_b
                g = 0.5 * (g + g.T)
                g6 = jnp.asarray(
                    [g[0, 0], g[1, 1], g[2, 2], g[0, 1], g[0, 2], g[1, 2]]
                )
                return bv6 + _couple6(0.5 * dt * g6)

            def v_press_half_a(vel, bv6):
                pg = itg._voigt_to_tensor(bv6)
                alpha = itg._sym_expm(
                    -0.5 * dt * (pg + (jnp.trace(pg) / ndof) * eye3)
                )
                return itg._xm3(vel, alpha)

            # Verlet-staleness reference (non-affine displacement + shrink
            # term, same criterion as Simulation._scan_steps)
            ref_pos, ref_cell = pos, cell
            inv_ref = jnp.linalg.inv(ref_cell)
            ref_frac = jnp.stack(
                [
                    ref_pos[:, 0] * inv_ref[0, a]
                    + ref_pos[:, 1] * inv_ref[1, a]
                    + ref_pos[:, 2] * inv_ref[2, a]
                    for a in range(3)
                ],
                axis=-1,
            )
            ref_widths = 1.0 / jnp.linalg.norm(inv_ref, axis=1)

            def staleness(pos, cell, stale):
                scaled_ref = jnp.stack(
                    [
                        ref_frac[:, 0] * cell[0, a]
                        + ref_frac[:, 1] * cell[1, a]
                        + ref_frac[:, 2] * cell[2, a]
                        for a in range(3)
                    ],
                    axis=-1,
                )
                d = pos - scaled_ref
                d2 = jnp.where(real, jnp.sum(d * d, axis=-1), 0.0)
                max_d = jnp.sqrt(jnp.max(d2))
                widths = 1.0 / jnp.linalg.norm(jnp.linalg.inv(cell), axis=1)
                s_min = jnp.min(widths / ref_widths)
                budget = 2.0 * max_d + jnp.maximum(0.0, 1.0 - s_min) * cut_skin
                return stale | (budget > skin)

            if refresh:
                f0, pe0, vir0 = force_eval(pos, cell)
            else:
                # carried forces/pe/virial from the previous block's last
                # step are position-consistent (the new list contains every
                # in-cutoff pair the old one did) — no redundant refresh
                f0, pe0, vir0 = f, pe_in, vir_in

            def one(carry, _):
                pos, vel, f, cell, pe, vir, th, stale = carry
                xi, eta = th[:2], th[2:4]
                bxi, beta, bv = th[4:6], th[6:8], th[8]
                bv6 = th[8:14]
                if ensemble in ("nvt", "npt") or aniso:
                    vel, xi, eta = nhc_half(vel, xi, eta)
                if ensemble == "npt":
                    bv, bxi, beta = baro_chain_half(bv, bxi, beta)
                    bv = omega_dot_half(vel, vir, cell, bv)
                    alpha = jnp.exp(-0.5 * dt * (1.0 + 3.0 / ndof) * bv)
                    vel = vel * alpha
                if aniso:
                    bv6, bxi, beta = baro_chain_half_a(bv6, bxi, beta)
                    bv6 = omega_dot_half_a(vel, vir, cell, bv6)
                    vel = v_press_half_a(vel, bv6)
                vel = vel + half * f / mass_col
                if ensemble == "npt":
                    # exact MTK position map (series-expanded sinh ratio)
                    x = dt * bv
                    s = jnp.exp(x)
                    x2 = (0.5 * x) ** 2
                    sinh_ratio = 1.0 + x2 / 6.0 + x2**2 / 120.0
                    pos = pos * s + dt * vel * jnp.exp(0.5 * x) * sinh_ratio
                    cell = cell * s
                elif aniso:
                    # matrix analog of the exact iso map (series-evaluated,
                    # all factors commute; integrators.npt_aniso_step)
                    a = dt * itg._voigt_to_tensor(bv6)
                    e_full = itg._sym_expm(a)
                    e_half = itg._sym_expm(0.5 * a)
                    f_sinh = itg._sinh_ratio_m(a)
                    pos = itg._xm3(pos, e_full) + dt * itg._xm3(
                        vel, itg._mm3(e_half, f_sinh)
                    )
                    cell = itg._mm3(cell, e_full)
                else:
                    pos = pos + dt * vel
                f, pe, vir = force_eval(pos, cell)
                vel = vel + half * f / mass_col
                if ensemble == "npt":
                    vel = vel * alpha
                    bv = omega_dot_half(vel, vir, cell, bv)
                    bv, bxi, beta = baro_chain_half(bv, bxi, beta)
                if aniso:
                    vel = v_press_half_a(vel, bv6)
                    bv6 = omega_dot_half_a(vel, vir, cell, bv6)
                    bv6, bxi, beta = baro_chain_half_a(bv6, bxi, beta)
                if ensemble in ("nvt", "npt") or aniso:
                    vel, xi, eta = nhc_half(vel, xi, eta)
                stale = staleness(pos, cell, stale)
                if aniso:
                    th = jnp.concatenate([xi, eta, bxi, beta, bv6])
                else:
                    th = jnp.concatenate([xi, eta, bxi, beta, bv[None], th[9:]])
                return (pos, vel, f, cell, pe, vir, th, stale), None

            carry0 = (
                pos, vel, f0, cell, pe0, vir0, thermo, jnp.zeros((), bool)
            )
            (pos, vel, f, cell, pe, vir, thermo, stale), _ = jax.lax.scan(
                one, carry0, None, length=n_steps
            )
            # block-boundary energy refresh (forward kernel, HIGHEST DAG)
            ext_pos = exch(pos, jnp.asarray(0.0, dtype))
            pe = jax.lax.psum(
                mtp_energy_window(sched, coeffs, ext_pos, cell, swl, **consts),
                axis,
            )
            return pos, vel, f, cell, pe, vir, thermo, jax.lax.pmax(stale, axis)

        axis_p = P(self.axis)
        ctx_specs = {
            k: (P(None, self.axis) if k in _COL_SHARDED else axis_p)
            for k in self._ctx_keys()
        }
        sharded = jax.shard_map(
            steps_shard,
            mesh=self.mesh,
            in_specs=(
                axis_p, axis_p, axis_p, axis_p, axis_p, P(), P(), P(), P(),
                ctx_specs,
            ),
            out_specs=(
                axis_p, axis_p, axis_p, P(), P(), P(), P(), P(),
            ),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _ctx_keys(self):
        keys = [
            "order", "inv_order", "idx", "window_idx", "wl", "wl_counts",
            "mirror", "sel_r", "val_r", "sel_l", "val_l",
            "it_row", "jtypes_t", "pair_valid_t", "esp",
        ]
        if self.gb_on:
            keys += [
                "gb_bases", "gb_off", "gb_ilF", "gb_o2F",
                "gb_sp_dst", "gb_sp_src",
            ]
        return keys

    def steps(
        self, state: ShardedState, ctx, n_steps, *,
        ensemble="nve", dt=0.001, temperature=300.0, pressure=0.0,
        tdamp=0.1, pdamp=1.0, refresh=False,
    ):
        """`n_steps` integrator steps with the frozen block context, as one
        dispatch. Returns (state, stale)."""
        key = (
            ensemble, int(n_steps), float(dt), float(temperature),
            float(pressure), float(tdamp), float(pdamp), bool(refresh),
        )
        fn = self._steps_cache.get(key)
        if fn is None:
            fn = self._steps_cache[key] = self._make_steps(key)
        pos, vel, f, cell, pe, vir, thermo, stale = fn(
            state.positions, state.velocities, state.forces, state.masses,
            state.real, state.cell, state.thermo, state.potential_energy,
            state.virial, ctx,
        )
        state = dataclasses.replace(
            state, positions=pos, velocities=vel, forces=f, cell=cell,
            potential_energy=pe, virial=vir, thermo=thermo,
        )
        return state, stale

    # ---------------------------------------------------------------- run

    def run(
        self, state: ShardedState, n_steps, *,
        ensemble="nve", dt=0.001, temperature=300.0, pressure=0.0,
        tdamp=0.1, pdamp=1.0, refresh=True,
    ):
        """Host loop: (rebuild, steps) per Verlet block, flags accumulated
        on device and returned as :class:`ShardedRunFlags` (check after a
        final sync; bool(flags.any()) syncs)."""
        flags = None
        stale_any = jnp.zeros((), bool)
        done = 0
        first = refresh
        while done < n_steps:
            k = min(self.steps_per_rebuild, n_steps - done)
            state, ctx, f4 = self.rebuild(state)
            flags = (
                f4
                if flags is None
                else tuple(a | b for a, b in zip(flags, f4))
            )
            state, stale = self.steps(
                state, ctx, k, ensemble=ensemble, dt=dt,
                temperature=temperature, pressure=pressure, tdamp=tdamp,
                pdamp=pdamp, refresh=first,
            )
            first = False
            stale_any = stale_any | stale
            done += k
        if flags is None:
            flags = (jnp.zeros((), bool),) * 4
        return state, ShardedRunFlags(*flags, stale_any)
