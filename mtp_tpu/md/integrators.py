"""Time integrators: velocity-Verlet NVE, Langevin (BAOAB), Nose-Hoover-chain
NVT, and isotropic MTK NPT.

The reference relies on LAMMPS fixes for all of these (`fix 1 all nve`,
reference README.md:149; NPT enabled by the pair style's virial support,
pair_mtp.cpp:256-277). Here each integrator is a pure function
``(state, aux) -> (state, aux)`` suitable for `jax.lax.scan`.

The force evaluation is injected as ``force_fn(positions, types, cell) ->
(forces, potential_energy, virial)`` so integrators stay independent of the
potential and of neighbor-list management.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mtp_tpu.md.state import (
    MDState,
    kinetic_energy,
    temperature_of,
    volume_of,
)
from mtp_tpu.utils import units

ForceFn = Callable


def _half_kick(state: MDState, dt):
    dv = (0.5 * dt * units.FTM2A) * state.forces / state.masses[:, None]
    return dataclasses.replace(state, velocities=state.velocities + dv)


def _drift(state: MDState, dt):
    return dataclasses.replace(
        state, positions=state.positions + dt * state.velocities
    )


def _with_forces(state: MDState, force_fn) -> MDState:
    f, pe, vir = force_fn(state.positions, state.types, state.cell)
    return dataclasses.replace(
        state, forces=f, potential_energy=pe, virial=vir
    )


# ----------------------------------------------------------------- NVE ----


def nve_step(state: MDState, force_fn: ForceFn, dt: float) -> MDState:
    """One velocity-Verlet step."""
    state = _half_kick(state, dt)
    state = _drift(state, dt)
    state = _with_forces(state, force_fn)
    state = _half_kick(state, dt)
    return dataclasses.replace(state, step=state.step + 1)


# ------------------------------------------------------------- Langevin ----


class LangevinAux(NamedTuple):
    key: jax.Array


def langevin_step(
    state: MDState,
    aux: LangevinAux,
    force_fn: ForceFn,
    dt: float,
    temperature: float,
    damping: float,
):
    """BAOAB Langevin dynamics; `damping` is the relaxation time [ps]."""
    key, sub = jax.random.split(aux.key)
    state = _half_kick(state, dt)
    state = _drift(state, 0.5 * dt)
    # O: Ornstein-Uhlenbeck exact update
    gamma = 1.0 / damping
    c1 = jnp.exp(-gamma * dt)
    sigma = jnp.sqrt(
        units.KB * temperature / (state.masses * units.MVV2E) * (1 - c1**2)
    )
    noise = jax.random.normal(sub, state.velocities.shape, state.velocities.dtype)
    v = c1 * state.velocities + sigma[:, None] * noise
    state = dataclasses.replace(state, velocities=v)
    state = _drift(state, 0.5 * dt)
    state = _with_forces(state, force_fn)
    state = _half_kick(state, dt)
    return dataclasses.replace(state, step=state.step + 1), LangevinAux(key)


# ------------------------------------------------------ Nose-Hoover NVT ----


class NHCAux(NamedTuple):
    """Nose-Hoover chain variables (length-2 chain)."""

    xi: jax.Array  # (2,) thermostat velocities
    eta: jax.Array  # (2,) thermostat positions (for the conserved quantity)


def nhc_init(dtype=jnp.float32) -> NHCAux:
    return NHCAux(xi=jnp.zeros(2, dtype), eta=jnp.zeros(2, dtype))


def _nhc_half(state: MDState, aux: NHCAux, dt, temperature, tdamp):
    """Half-step (dt/2 total) of a 2-chain Nose-Hoover thermostat.

    Standard MTK operator splitting: update chain-2, damp+drive chain-1,
    scale particle velocities by exp(-xi1*dt/2), then mirror the chain
    updates. `xi` are thermostat velocities, `eta` their positions (used in
    the conserved quantity).
    """
    n = state.n_atoms
    ndof = 3 * n
    kt = units.KB * temperature
    q1 = ndof * kt * tdamp**2
    q2 = kt * tdamp**2
    dt2, dt4, dt8 = 0.5 * dt, 0.25 * dt, 0.125 * dt

    ke2 = 2.0 * kinetic_energy(state)
    xi, eta = aux.xi, aux.eta

    g2 = (q1 * xi[0] ** 2 - kt) / q2
    xi = xi.at[1].add(g2 * dt4)
    xi = xi.at[0].multiply(jnp.exp(-xi[1] * dt8))
    g1 = (ke2 - ndof * kt) / q1
    xi = xi.at[0].add(g1 * dt4)
    xi = xi.at[0].multiply(jnp.exp(-xi[1] * dt8))

    scale = jnp.exp(-xi[0] * dt2)
    v = state.velocities * scale
    ke2 = ke2 * scale**2
    eta = eta + dt2 * xi

    xi = xi.at[0].multiply(jnp.exp(-xi[1] * dt8))
    g1 = (ke2 - ndof * kt) / q1
    xi = xi.at[0].add(g1 * dt4)
    xi = xi.at[0].multiply(jnp.exp(-xi[1] * dt8))
    g2 = (q1 * xi[0] ** 2 - kt) / q2
    xi = xi.at[1].add(g2 * dt4)

    return dataclasses.replace(state, velocities=v), NHCAux(xi=xi, eta=eta)


def nvt_step(
    state: MDState,
    aux: NHCAux,
    force_fn: ForceFn,
    dt: float,
    temperature: float,
    tdamp: float,
):
    """Nose-Hoover-chain NVT step (thermostat half, NVE core, thermostat half)."""
    state, aux = _nhc_half(state, aux, dt, temperature, tdamp)
    state = nve_step(state, force_fn, dt)
    state, aux = _nhc_half(state, aux, dt, temperature, tdamp)
    return state, aux


# ----------------------------------------------------------- MTK NPT -------


class NPTAux(NamedTuple):
    thermo: NHCAux
    baro_v: jax.Array  # () cell strain-rate variable (isotropic)


def npt_init(dtype=jnp.float32) -> NPTAux:
    return NPTAux(thermo=nhc_init(dtype), baro_v=jnp.zeros((), dtype))


def npt_step(
    state: MDState,
    aux: NPTAux,
    force_fn: ForceFn,
    dt: float,
    temperature: float,
    pressure: float,
    tdamp: float,
    pdamp: float,
):
    """Isotropic Martyna-Tobias-Klein NPT step.

    `pressure` in bar. The cell is scaled isotropically; the barostat momentum
    is thermostatted by the same NHC chain (simplified single-chain coupling).
    """
    n = state.n_atoms
    ndof = 3 * n
    kt = units.KB * temperature
    p_ext = pressure / units.EVA3_TO_BAR  # eV/A^3
    w = (ndof + 3) * kt * pdamp**2  # barostat mass

    def baro_half(state, aux):
        vol = volume_of(state)
        w_tr = state.virial[0] + state.virial[1] + state.virial[2]
        ke2 = 2.0 * kinetic_energy(state)
        p_int = (ke2 + w_tr) / (3.0 * vol)
        g = (3.0 * vol * (p_int - p_ext) + (3.0 / ndof) * ke2) / w
        baro_v = aux.baro_v + 0.25 * dt * g  # quarter? use half below
        baro_v = baro_v + 0.25 * dt * g
        return NPTAux(thermo=aux.thermo, baro_v=baro_v)

    # thermostat half
    state, thermo = _nhc_half(state, aux.thermo, dt, temperature, tdamp)
    aux = NPTAux(thermo=thermo, baro_v=aux.baro_v)
    # barostat half
    aux = baro_half(state, aux)

    # velocity scaling from barostat coupling + half kick
    alpha = jnp.exp(-0.5 * dt * (1.0 + 3.0 / ndof) * aux.baro_v)
    state = dataclasses.replace(state, velocities=state.velocities * alpha)
    state = _half_kick(state, dt)

    # drift with cell scaling
    s = jnp.exp(dt * aux.baro_v)
    state = dataclasses.replace(
        state,
        positions=state.positions * s + dt * state.velocities,
        cell=state.cell * s,
    )

    state = _with_forces(state, force_fn)
    state = _half_kick(state, dt)
    alpha = jnp.exp(-0.5 * dt * (1.0 + 3.0 / ndof) * aux.baro_v)
    state = dataclasses.replace(
        state, velocities=state.velocities * alpha, step=state.step + 1
    )

    aux = baro_half(state, aux)
    state, thermo = _nhc_half(state, aux.thermo, dt, temperature, tdamp)
    return state, NPTAux(thermo=thermo, baro_v=aux.baro_v)
