"""Observables for sharded runs: the same output surface as single-chip.

The reference's thermo/dump plumbing is rank-transparent — LAMMPS gathers
per-atom data for dumps and reduces scalars for thermo rows regardless of
the MPI decomposition. Here:

* scalar observables (T, KE, P, E) are computed directly on the sharded
  arrays (XLA inserts the cross-shard reductions; padding slots masked by
  ``real``), no host gather;
* :func:`gather_md_state` performs the id-ordered host gather (the
  MPI_Scan/Send/Recv funnel analog, pair_mtp_extrapolation.cpp:415-474)
  into a plain :class:`MDState`, so every single-chip writer — ThermoLogger,
  XYZDumpWriter, save_checkpoint — works unchanged on multi-chip runs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.state import MDState
from mtp_tpu.parallel.sharded_md import ShardedState
from mtp_tpu.utils import units


def sharded_kinetic_energy(sstate: ShardedState):
    """Total kinetic energy [eV] (device scalar; padding slots masked)."""
    v = sstate.velocities
    return 0.5 * units.MVV2E * jnp.sum(
        jnp.where(sstate.real[:, None], sstate.masses[:, None] * v * v, 0.0)
    )


def sharded_temperature(sstate: ShardedState, n_atoms: int):
    """Instantaneous temperature [K] (device scalar)."""
    return (
        2.0 * sharded_kinetic_energy(sstate) / (3.0 * n_atoms * units.KB)
    )


def sharded_pressure(sstate: ShardedState):
    """Scalar pressure [bar] from the replicated virial + sharded KE."""
    vol = jnp.abs(jnp.linalg.det(sstate.cell))
    w_tr = sstate.virial[0] + sstate.virial[1] + sstate.virial[2]
    return (
        (2.0 * sharded_kinetic_energy(sstate) + w_tr)
        / (3.0 * vol)
        * units.EVA3_TO_BAR
    )


def gather_md_state(sstate: ShardedState, n_atoms: int, step: int = 0) -> MDState:
    """Id-ordered host gather of a ShardedState into a plain MDState.

    Valid after migration (ids travel with the atoms). The result feeds any
    single-chip consumer: ThermoLogger, XYZDumpWriter, save_checkpoint, or
    a single-chip Simulation (engine hand-off)."""
    pos = sstate.gather(np.asarray(sstate.positions), n_atoms)
    dtype = pos.dtype
    return MDState(
        positions=jnp.asarray(pos),
        velocities=jnp.asarray(
            sstate.gather(np.asarray(sstate.velocities), n_atoms)
        ),
        forces=jnp.asarray(sstate.gather(np.asarray(sstate.forces), n_atoms)),
        masses=jnp.asarray(sstate.gather(np.asarray(sstate.masses), n_atoms)),
        types=jnp.asarray(
            sstate.gather(np.asarray(sstate.types), n_atoms), jnp.int32
        ),
        cell=jnp.asarray(np.asarray(sstate.cell), dtype),
        potential_energy=jnp.asarray(
            np.asarray(sstate.potential_energy), dtype
        ),
        virial=jnp.asarray(np.asarray(sstate.virial), dtype),
        step=jnp.asarray(step),
    )
