"""Multi-chip MD: shard_map over a 1-D device mesh with ring halo exchange.

TPU-native replacement for the reference's LAMMPS/MPI layer (SURVEY.md §2.3):

* spatial data parallelism -> atoms sharded along the mesh axis (slabs);
* per-step ghost-position forward comm -> two ring `ppermute`s over ICI;
* Newton force give-back (LAMMPS reverse comm, pair_mtp.cpp:248-254 across
  ranks) -> gradient contributions to ghost slots ppermuted back and added;
* `MPI_Allreduce` of energies/grades -> `psum`/`pmax` over the mesh axis.

Model parameters are closed over (replicated), the analog of the reference's
`MPI_Bcast` of the model (pair_mtp.cpp:572-652).

Layout inside a shard: extended array ``[own (C) | left ghosts (C) | right
ghosts (C)]``; requires slab width >= cutoff + skin so adjacent slabs contain
all neighbors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtp_tpu.md.state import MDState
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.moments import site_energies
from mtp_tpu.ops.neighbors import build_neighbor_list
from mtp_tpu.parallel.domain import SlabPartition
from mtp_tpu.utils import units


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "atoms") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                f"({devs[0].platform}); for CPU testing set "
                "jax.config.update('jax_platforms','cpu') and "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedState:
    """Per-atom arrays are (n_shards*capacity, ...), sharded on axis 0."""

    positions: jax.Array
    velocities: jax.Array
    forces: jax.Array
    types: jax.Array
    masses: jax.Array
    real: jax.Array
    cell: jax.Array  # replicated
    potential_energy: jax.Array  # replicated scalar
    virial: jax.Array  # replicated (6,)

    @classmethod
    def from_partition(cls, part: SlabPartition, cell, mesh: Mesh, dtype=jnp.float32):
        axis = mesh.axis_names[0]
        sh = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        put = lambda a, s: jax.device_put(jnp.asarray(a), s)
        return cls(
            positions=put(jnp.asarray(part.positions, dtype), sh),
            velocities=put(jnp.asarray(part.velocities, dtype), sh),
            forces=put(jnp.zeros_like(jnp.asarray(part.positions, dtype)), sh),
            types=put(part.types, sh),
            masses=put(jnp.asarray(part.masses, dtype), sh),
            real=put(part.real, sh),
            cell=put(jnp.asarray(cell, dtype), rep),
            potential_energy=put(jnp.zeros((), dtype), rep),
            virial=put(jnp.zeros((6,), dtype), rep),
        )


def make_sharded_md_block(
    model: MTPModel,
    mesh: Mesh,
    *,
    capacity: int,
    max_neighbors: int,
    grid: tuple,
    skin: float = 0.5,
    n_steps: int = 10,
    dt: float = 0.001,
    remat: bool = True,
):
    """Build a jitted multi-chip NVE block: halo exchange + neighbor rebuild +
    `n_steps` velocity-Verlet steps.

    Returns ``block(state: ShardedState) -> (ShardedState, overflow)``.
    """
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    sched = model.schedule
    coeffs = model.coeffs
    cutoff = model.cutoff
    # Ghost slabs by ring size: nd>=3 needs both neighbors; on a 2-device
    # mesh left and right are the SAME slab (one deduplicated copy — two
    # copies would double-count every cross-slab pair); one device has no
    # ghosts at all (minimum image covers the box, like single-chip).
    perm_fwd = [(i, (i + 1) % nd) for i in range(nd)]  # send right
    perm_bwd = [(i, (i - 1) % nd) for i in range(nd)]  # send left
    ghost_perms = [perm_fwd, perm_bwd] if nd >= 3 else ([perm_fwd] if nd == 2 else [])
    n_ghost = len(ghost_perms)

    def exchange_positions(pos):
        """own (C,3) -> extended ((1+n_ghost)C, 3): [own, ghost slabs...]."""
        if not ghost_perms:
            return pos
        return jnp.concatenate(
            [pos] + [jax.lax.ppermute(pos, axis, p) for p in ghost_perms], axis=0
        )

    def giveback_forces(f_ext):
        """Return ghost-slot gradient contributions to their owners and add."""
        C = capacity
        out = f_ext[:C]
        # ghost block k arrived via ghost_perms[k]; send its gradient back
        # along the inverse permutation (for nd==2 fwd == bwd)
        inv = {id(perm_fwd): perm_bwd, id(perm_bwd): perm_fwd}
        for k, p in enumerate(ghost_perms):
            blk = f_ext[(k + 1) * C : (k + 2) * C]
            out = out + jax.lax.ppermute(blk, axis, inv[id(p)])
        return out

    def compute_forces(pos, ext_types, ext_real, nbr_idx, cell):
        """Forces on own atoms + (energy, virial) shard contributions."""
        from mtp_tpu.models.mtp import _gather_rows3, _gather_scalar, minimum_image

        ext_pos = exchange_positions(pos)
        inv_cell = jnp.linalg.inv(cell)
        disp = _gather_rows3(ext_pos, nbr_idx) - ext_pos[:capacity, None, :]
        disp = minimum_image(disp, cell, inv_cell)
        d2 = jnp.sum(disp * disp, axis=-1)
        self_pair = nbr_idx == jnp.arange(capacity, dtype=nbr_idx.dtype)[:, None]
        mask = (
            (d2 <= cutoff**2)
            & (~self_pair)
            & _gather_scalar(ext_real, nbr_idx)
            & ext_real[:capacity, None]
        )
        itypes = ext_types[:capacity]
        jtypes = _gather_scalar(ext_types, nbr_idx)

        fn = site_energies
        if remat:
            fn = jax.checkpoint(fn, static_argnums=(0,))
        site_e, vjp = jax.vjp(
            lambda d: fn(sched, coeffs, d, mask, itypes, jtypes), disp
        )
        (pair_t,) = vjp(jnp.ones_like(site_e))
        pair_t = pair_t * mask[..., None].astype(pair_t.dtype)

        f_ext = jnp.zeros_like(ext_pos)
        f_ext = f_ext.at[:capacity].add(jnp.sum(pair_t, axis=1))
        f_ext = f_ext.at[nbr_idx.reshape(-1)].add(-pair_t.reshape(-1, 3))
        forces = giveback_forces(f_ext)

        site_e = jnp.where(ext_real[:capacity], site_e, 0.0)
        pe = jax.lax.psum(jnp.sum(site_e), axis)
        r = jnp.where(mask[..., None], disp, 0.0)
        w = -jnp.einsum("nja,njb->ab", pair_t, r)
        w = 0.5 * (w + w.T)
        vir = jax.lax.psum(
            jnp.stack([w[0, 0], w[1, 1], w[2, 2], w[0, 1], w[0, 2], w[1, 2]]),
            axis,
        )
        return forces, pe, vir

    def block_shard(pos, vel, f, types, masses, real, cell):
        # --- neighbor rebuild on the halo-extended set ---
        ext_pos = exchange_positions(pos)
        ext_types = exchange_positions(types)
        ext_real = exchange_positions(real)
        # atoms occupy ~(1+n_ghost)/nd of the box's bins inside a shard, so
        # scale the per-bin capacity estimate accordingly
        ncells = int(np.prod(grid))
        bin_cap = max(1, int(np.ceil(4.0 * nd * capacity / ncells))) + 8
        nl = build_neighbor_list(
            ext_pos,
            cell,
            cutoff + skin,
            max_neighbors=max_neighbors,
            grid=grid,
            centers=capacity,
            real=ext_real,
            bin_capacity=bin_cap,
        )
        overflow = jax.lax.pmax(nl.overflow, axis)

        mass_col = masses[:, None]
        half = 0.5 * dt * units.FTM2A

        # refresh forces for the new neighbor list (matches the single-chip
        # block; incoming f may be stale or zero)
        f, _, _ = compute_forces(pos, ext_types, ext_real, nl.idx, cell)

        def one(carry, _):
            pos, vel, f = carry
            vel = vel + half * f / mass_col
            pos = pos + dt * vel
            f, pe, vir = compute_forces(pos, ext_types, ext_real, nl.idx, cell)
            vel = vel + half * f / mass_col
            return (pos, vel, f), (pe, vir)

        (pos, vel, f), (pes, virs) = jax.lax.scan(
            one, (pos, vel, f), None, length=n_steps
        )
        return pos, vel, f, pes[-1], virs[-1], overflow

    sharded = jax.shard_map(
        block_shard,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def block(state: ShardedState):
        pos, vel, f, pe, vir, overflow = sharded(
            state.positions,
            state.velocities,
            state.forces,
            state.types,
            state.masses,
            state.real,
            state.cell,
        )
        return (
            dataclasses.replace(
                state,
                positions=pos,
                velocities=vel,
                forces=f,
                potential_energy=pe,
                virial=vir,
            ),
            overflow,
        )

    return block


def make_sharded_grades(
    model: MTPModel,
    mesh: Mesh,
    *,
    capacity: int,
    max_neighbors: int,
    grid: tuple,
):
    """Multi-chip extrapolation grades: per-shard candidate vectors with halo
    exchange, then the reference's grade collectives as mesh reductions —
    `psum` of summed candidate vectors in configuration mode /
    `pmax` of per-atom grades in neighborhood mode
    (MPI_Allreduce SUM/MAX, pair_mtp_extrapolation.cpp:363-382).

    Returns grades_fn(state: ShardedState) -> (max_grade, per_atom_grades)
    with per-atom grades sharded like the atoms (zero on padding slots;
    None-equivalent zeros in configuration mode).
    """
    if model.inverse_active_set is None:
        raise ValueError("model has no MVS selection state")
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    sched = model.schedule
    coeffs = model.coeffs
    cutoff = model.cutoff
    inv_a = model.inverse_active_set
    cfg_mode = model.configuration_mode
    perm_fwd = [(i, (i + 1) % nd) for i in range(nd)]
    perm_bwd = [(i, (i - 1) % nd) for i in range(nd)]
    # same nd<=2 dedup as make_sharded_md_block
    ghost_perms = [perm_fwd, perm_bwd] if nd >= 3 else ([perm_fwd] if nd == 2 else [])

    def shard_fn(pos, types, real, cell):
        from mtp_tpu.ops.moments import basic_moments, contract_dag, readout

        def exch(x):
            if not ghost_perms:
                return x
            return jnp.concatenate(
                [x] + [jax.lax.ppermute(x, axis, p) for p in ghost_perms]
            )

        ext_pos = exch(pos)
        ext_types = exch(types)
        ext_real = exch(real)
        nl = build_neighbor_list(
            ext_pos, cell, cutoff,
            max_neighbors=max_neighbors, grid=grid,
            centers=capacity, real=ext_real,
            bin_capacity=max(1, int(4.0 * nd * capacity / int(np.prod(grid)))) + 8,
        )
        # local candidate vectors over the halo-extended set
        from mtp_tpu.models.mtp import minimum_image

        inv_cell = jnp.linalg.inv(cell)
        disp = ext_pos[nl.idx] - ext_pos[:capacity, None, :]
        disp = minimum_image(disp, cell, inv_cell)
        d2 = jnp.sum(disp * disp, axis=-1)
        self_pair = nl.idx == jnp.arange(capacity, dtype=nl.idx.dtype)[:, None]
        mask = (
            (d2 <= cutoff**2) & (~self_pair)
            & ext_real[nl.idx] & ext_real[:capacity, None]
        )
        itypes = ext_types[:capacity]
        jtypes = ext_types[nl.idx]

        mb, aux = basic_moments(sched, coeffs, disp, mask, itypes, jtypes)
        dtype = mb.dtype

        def site_e_of(mbv):
            e, _ = readout(sched, coeffs, contract_dag(sched, mbv), itypes)
            return jnp.sum(jnp.where(real, e, 0.0))

        gamma = jax.grad(site_e_of)(mb)
        _, basis_members = readout(sched, coeffs, contract_dag(sched, mb), itypes)

        S = sched.species_count
        MU = sched.radial_funcs_count
        RB = sched.radial_basis_size
        w = jnp.where(mask, jnp.asarray(1.0, dtype), 0.0)
        jt_onehot = jax.nn.one_hot(jtypes, S, dtype=dtype) * w[..., None]
        mu_onehot = jnp.asarray(
            np.eye(MU)[sched.basic[:, 0]], dtype
        )
        gU = jnp.einsum("nk,njk,km->njm", gamma, aux["U"], mu_onehot)
        rad = jnp.einsum("njm,njs,njr->nsmr", gU, jt_onehot, aux["cheb"])
        it_onehot = jax.nn.one_hot(itypes, S, dtype=dtype) * real[:, None].astype(dtype)
        b = jnp.concatenate(
            [
                jnp.einsum("nt,nsmr->ntsmr", it_onehot, rad).reshape(
                    capacity, S * S * MU * RB
                ),
                it_onehot,
                basis_members * real[:, None].astype(dtype),
            ],
            axis=1,
        )

        if cfg_mode:
            bsum = jax.lax.psum(jnp.sum(b, axis=0), axis)
            natoms = jax.lax.psum(jnp.sum(real), axis)
            g = jnp.max(jnp.abs(inv_a.astype(dtype) @ bsum)) / jnp.maximum(natoms, 1)
            return g, jnp.zeros((capacity,), dtype), nl.overflow
        grades = jnp.max(jnp.abs(b @ inv_a.astype(dtype).T), axis=-1)
        grades = jnp.where(real, grades, 0.0)
        gmax = jax.lax.pmax(jnp.max(grades), axis)
        return gmax, grades, jax.lax.pmax(nl.overflow, axis)

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )

    @jax.jit
    def grades_fn(state: ShardedState):
        return sharded(state.positions, state.types, state.real, state.cell)

    return grades_fn


def compute_sharded_forces(model: MTPModel, mesh: Mesh, *, capacity, max_neighbors, grid, skin=0.0):
    """One-shot sharded force/energy evaluation (for tests and AL hooks)."""
    blk = make_sharded_md_block(
        model,
        mesh,
        capacity=capacity,
        max_neighbors=max_neighbors,
        grid=grid,
        skin=skin,
        n_steps=1,
        dt=0.0,
    )

    def fn(state: ShardedState):
        out, overflow = blk(state)
        return out, overflow

    return fn
