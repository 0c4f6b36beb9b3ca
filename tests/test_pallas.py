"""Fused Pallas kernel parity vs the XLA path (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import MTPModel, mtp_energy_forces
from mtp_tpu.ops.neighbors import build_neighbor_list_bruteforce


@pytest.mark.parametrize(
    "fixture,pattern",
    [("mtp_level8", (0,)), ("mtp_level12", (0,)), ("mtp_level8_2spec", (0, 1))],
)
def test_pallas_matches_xla(fixture, pattern, rng, request):
    m = request.getfixturevalue(fixture)
    model = MTPModel.from_data(m, dtype=jnp.float64)
    pos, types, cell = make_lattice("fcc", 4.0, (3, 3, 3), type_pattern=pattern)
    pos = pos + rng.normal(scale=0.1, size=pos.shape)
    nl = build_neighbor_list_bruteforce(
        jnp.asarray(pos), jnp.asarray(cell), model.cutoff, max_neighbors=48
    )
    args = (
        model.schedule,
        model.coeffs,
        jnp.asarray(pos),
        jnp.asarray(types),
        nl.idx,
        jnp.asarray(cell),
    )
    a = mtp_energy_forces(*args, backend="xla")
    b = mtp_energy_forces(*args, backend="pallas")
    assert abs(float(a["energy"] - b["energy"])) < 1e-10
    np.testing.assert_allclose(
        np.asarray(b["forces"]), np.asarray(a["forces"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(b["virial"]), np.asarray(a["virial"]), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(b["site_energies"]), np.asarray(a["site_energies"]), atol=1e-12
    )


def test_pallas_padding_paths(mtp_level8, rng):
    """N not a multiple of 128 and J not a multiple of 8 exercise padding."""
    m = mtp_level8
    model = MTPModel.from_data(m, dtype=jnp.float64)
    from conftest import scatter_cluster

    n = 13
    pos = scatter_cluster(n, rng)
    types = np.zeros(n, dtype=np.int32)
    nl = build_neighbor_list_bruteforce(
        jnp.asarray(pos), None, model.cutoff, max_neighbors=11
    )
    args = (
        model.schedule,
        model.coeffs,
        jnp.asarray(pos),
        jnp.asarray(types),
        nl.idx,
    )
    a = mtp_energy_forces(*args, backend="xla")
    b = mtp_energy_forces(*args, backend="pallas")
    assert abs(float(a["energy"] - b["energy"])) < 1e-10
    np.testing.assert_allclose(
        np.asarray(b["forces"]), np.asarray(a["forces"]), atol=1e-12
    )

