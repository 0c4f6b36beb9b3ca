"""Keep-alive parity tests for the modular kernel path (basic-moments kernel
+ feature-major XLA DAG) — the building blocks for future fused AL grades."""

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import MTPModel
from mtp_tpu.ops.moments import basic_moments, contract_dag
from mtp_tpu.ops.neighbors import build_neighbor_list_bruteforce
from mtp_tpu.ops.pallas_moments import basic_moments_fused, contract_dag_t


def test_basic_moments_kernel_and_dag_t(mtp_level12, rng):
    m = mtp_level12
    model = MTPModel.from_data(m, dtype=jnp.float64)
    sched = model.schedule
    pos, types, cell = make_lattice("fcc", 4.0, (3, 3, 3))
    pos = pos + rng.normal(scale=0.05, size=pos.shape)
    nl = build_neighbor_list_bruteforce(
        jnp.asarray(pos), jnp.asarray(cell), model.cutoff, max_neighbors=48
    )
    n = len(pos)
    disp = jnp.asarray(pos)[nl.idx] - jnp.asarray(pos)[:, None, :]
    inv = jnp.linalg.inv(jnp.asarray(cell))
    f = disp @ inv
    f -= jnp.round(f)
    disp = f @ jnp.asarray(cell)
    d2 = (disp**2).sum(-1)
    mask = (d2 <= model.cutoff**2) & (nl.idx != jnp.arange(n)[:, None])

    # XLA reference
    mb_ref, _ = basic_moments(
        sched, model.coeffs, disp, mask, jnp.asarray(types), jnp.asarray(types)[nl.idx]
    )
    mom_ref = contract_dag(sched, mb_ref)

    # kernel path (interpret mode on CPU), lane-major layout
    from mtp_tpu.ops.pallas_moments import _tile_n

    j = nl.idx.shape[1]
    j_pad = (-j) % 8
    n_pad = (-n) % _tile_n(j + j_pad)
    dispT = jnp.pad(jnp.moveaxis(disp, (0, 1, 2), (2, 1, 0)), ((0, 0), (0, j_pad), (0, n_pad)))
    maskf = jnp.pad(mask.astype(jnp.float64).T, ((0, j_pad), (0, n_pad)))
    it = jnp.pad(jnp.asarray(types)[None, :].astype(jnp.int32), ((0, 0), (0, n_pad)))
    jt = jnp.pad(jnp.asarray(types)[nl.idx].T.astype(jnp.int32), ((0, j_pad), (0, n_pad)))
    mb = basic_moments_fused(
        sched, dispT, maskf, it, jt, model.coeffs.radial_coeffs
    )[:, :n]
    np.testing.assert_allclose(np.asarray(mb), np.asarray(mb_ref).T, atol=1e-12)

    mom_t = contract_dag_t(sched, mb)
    np.testing.assert_allclose(
        np.asarray(mom_t), np.asarray(mom_ref).T, atol=1e-11
    )
