"""Spill repair (ops/slot_repair.py): relocating octant-overflow pairs onto
complementary-sublane pads must preserve the pair set and every structural
invariant the window/giveback kernels rely on, while driving the residual
spill count to ~0 at J=64."""

import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.ops.neighbors import build_sorted_neighbor_list, grid_shape
from mtp_tpu.ops.slot_repair import repair_spills
from mtp_tpu.ops.window_disp import TN


def _build(repair, seed=7, reps=(8, 8, 8), sigma=0.12):
    pos, types, cell = make_lattice("fcc", 4.0, reps)
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(pos + rng.normal(0, sigma, pos.shape))
    cell = jnp.asarray(cell)
    grid = grid_shape(np.asarray(cell), 5.6)
    swl = build_sorted_neighbor_list(
        pos, cell, 5.6, max_neighbors=64, grid=grid, align_slots=True,
        repair=repair,
    )
    assert not bool(swl.overflow)
    return swl


def _pair_set(idx):
    n_pad, j = idx.shape
    rows = np.arange(n_pad)[:, None]
    idx = np.asarray(idx)
    real = idx != rows
    i, s = np.nonzero(real)
    return set(zip(i.tolist(), idx[i, s].tolist()))


def _spill_count(idx, rev):
    rows = jnp.arange(idx.shape[0], dtype=jnp.int32)[:, None]
    s8 = (jnp.arange(idx.shape[1], dtype=jnp.int32) % 8)[None, :]
    real = idx != rows
    elig = real & ((rev % 8) == (7 - s8))
    return int(jnp.sum(real & ~elig)), int(jnp.sum(real))


def test_repair_invariants():
    swl0 = _build(repair=False)
    n = swl0.reference_positions.shape[0]
    idx_r, widx_r, rev_r, mirror_r = repair_spills(
        swl0.idx, swl0.window_idx, swl0.rev, n
    )
    n_pad, j = swl0.idx.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]

    # the directed pair set is exactly preserved
    assert _pair_set(idx_r) == _pair_set(swl0.idx)

    # rev consistency: the twin of (i, s) points back at slot s
    real = idx_r != rows
    flat = jnp.reshape(idx_r, (-1,)) * j + jnp.reshape(rev_r, (-1,))
    back = jnp.reshape(jnp.reshape(idx_r, (-1,))[flat], (n_pad, j))
    assert bool(jnp.all(jnp.where(real, back == rows, True)))

    # mirror identity mirror[p] = idx_flat[p]*J + rev_flat[p], and it is an
    # involution on real slots (twin-of-twin = self)
    assert bool(jnp.all(mirror_r == flat))
    p = jnp.arange(n_pad * j, dtype=jnp.int32)
    assert bool(jnp.all(jnp.where(real.reshape(-1), mirror_r[mirror_r] == p, True)))

    # window_idx: real slots carry the true neighbor, vacated/pad slots the
    # tile-first retarget (worklist invariance)
    tile_first = jnp.minimum((rows // TN) * TN, n - 1)
    want = jnp.where(real, idx_r, jnp.broadcast_to(tile_first, (n_pad, j)))
    assert bool(jnp.all(widx_r == want))

    # spills actually shrink to (near) zero at J=64
    before, total = _spill_count(swl0.idx, swl0.rev)
    after, total2 = _spill_count(idx_r, rev_r)
    assert total == total2
    assert before > 0  # the config genuinely exercises the pass
    assert after <= max(2, before // 20), (before, after)


def test_repair_default_on_in_build():
    """build_sorted_neighbor_list(align_slots=True) repairs by default and
    the residual fits the tightened spill budget (covered flag stays up)."""
    swl = _build(repair=True)
    after, _ = _spill_count(swl.idx, swl.rev)
    n_pad = swl.idx.shape[0]
    assert after <= n_pad // 8
    assert not bool(swl.overflow)
