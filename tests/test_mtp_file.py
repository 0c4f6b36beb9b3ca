"""Round-trip and validation tests for the .mtp file format."""

import numpy as np
import pytest

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.io.mtp_file import (
    MTPFileError,
    MVSData,
    dumps_mtp,
    loads_mtp,
)


def test_roundtrip_single_species(mtp_level8):
    m = mtp_level8
    m2 = loads_mtp(dumps_mtp(m))
    assert m2.species_count == m.species_count
    assert m2.radial_basis_size == m.radial_basis_size
    assert m2.scaling == m.scaling
    np.testing.assert_array_equal(m2.alpha_index_basic, m.alpha_index_basic)
    np.testing.assert_array_equal(m2.alpha_index_times, m.alpha_index_times)
    np.testing.assert_array_equal(m2.alpha_moment_mapping, m.alpha_moment_mapping)
    np.testing.assert_allclose(m2.radial_coeffs, m.radial_coeffs)
    np.testing.assert_allclose(m2.moment_coeffs, m.moment_coeffs)
    np.testing.assert_allclose(m2.species_coeffs, m.species_coeffs)


def test_roundtrip_two_species(mtp_level8_2spec):
    m2 = loads_mtp(dumps_mtp(mtp_level8_2spec))
    np.testing.assert_allclose(m2.radial_coeffs, mtp_level8_2spec.radial_coeffs)


def test_roundtrip_with_mvs(mtp_level8, rng):
    m = mtp_level8
    P = m.coeff_count
    A = rng.normal(size=(P, P))
    m.mvs = MVSData(
        energy_weight=0.0,
        force_weight=0.0,
        stress_weight=0.0,
        site_en_weight=1.0,
        weight_scaling=2.0,
        active_set=A,
        inverse_active_set=np.linalg.inv(A),
    )
    m2 = loads_mtp(dumps_mtp(m))
    assert m2.mvs is not None
    assert not m2.mvs.configuration_mode
    np.testing.assert_allclose(m2.mvs.active_set, A)
    np.testing.assert_allclose(m2.mvs.inverse_active_set, np.linalg.inv(A))
    m.mvs = None


def test_rejects_bad_header():
    with pytest.raises(MTPFileError):
        loads_mtp(b"EAM\nversion = 1.1.0\n")
    with pytest.raises(MTPFileError):
        loads_mtp(b"MTP\nversion = 2.0.0\n")


def test_rejects_bad_mvs_mode(mtp_level8, rng):
    m = mtp_level8
    P = m.coeff_count
    m.mvs = MVSData(1.0, 0.0, 0.0, 1.0, 1.0, np.eye(P), np.eye(P))
    blob = dumps_mtp(m)
    m.mvs = None
    with pytest.raises(MTPFileError):
        loads_mtp(blob)


def test_coeff_count(mtp_level8_2spec):
    m = mtp_level8_2spec
    expected = (
        m.species_count**2 * m.radial_funcs_count * m.radial_basis_size
        + m.species_count
        + len(m.alpha_moment_mapping)
    )
    assert m.coeff_count == expected
