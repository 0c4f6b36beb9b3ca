"""In-kernel Newton give-back (ops/window_giveback.py): parity with the
XLA mirror gather on realistic configs (CPU interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops.window_disp import num_tiles
from mtp_tpu.ops.window_giveback import (
    giveback_metadata,
    giveback_reference,
    window_giveback,
)


def _swl(reps=(8, 8, 8), sigma=0.1, seed=4):
    pos, types, cell = make_lattice("fcc", 4.0, reps)
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(pos + rng.normal(0, sigma, pos.shape))
    cell = jnp.asarray(cell)
    grid = grid_shape(np.asarray(cell), 5.6)
    swl = build_sorted_neighbor_list(
        pos, cell, 5.6, max_neighbors=64, grid=grid, align_slots=True
    )
    assert not bool(swl.overflow)
    return swl


def test_giveback_kernel_matches_reference():
    swl = _swl()
    n_pad, j = swl.idx.shape
    meta = giveback_metadata(swl.idx, swl.window_idx, swl.rev, num_tiles(n_pad), swl.wl)
    assert bool(meta["covered"])
    rng = np.random.default_rng(0)
    pair_T = jnp.asarray(rng.normal(size=(3, j, n_pad)))
    # masked (pad) slots carry zeros, as the megakernel backward guarantees
    rows = jnp.arange(n_pad)[:, None]
    real = (swl.idx != rows).T[None]
    pair_T = pair_T * real
    got = window_giveback(pair_T, swl.wl, meta)
    want = giveback_reference(pair_T, swl.idx, swl.rev)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 1e-12, err


def test_giveback_equals_mirror_gather():
    """The reference itself agrees with the production flat-mirror path."""
    swl = _swl(seed=5)
    n_pad, j = swl.idx.shape
    rng = np.random.default_rng(1)
    pair_T = jnp.asarray(rng.normal(size=(3, j, n_pad)))
    rows = jnp.arange(n_pad)[:, None]
    real = swl.idx != rows  # (N, J)
    pair_T = pair_T * real.T[None]
    # production fallback: flat mirror permutation on (N*J, 3) rows
    pair_t = jnp.moveaxis(pair_T, (0, 1, 2), (2, 1, 0))  # (N, J, 3)
    flat = pair_t.reshape(-1, 3)
    t_ji = flat[swl.mirror].reshape(pair_t.shape)
    give_mirror = jnp.sum(t_ji * real[..., None], axis=1).T  # (3, N)
    want = giveback_reference(pair_T, swl.idx, swl.rev)
    np.testing.assert_allclose(
        np.asarray(give_mirror), np.asarray(want), atol=1e-12
    )
