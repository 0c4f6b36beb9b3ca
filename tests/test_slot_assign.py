"""Octant-aligned slot assignment (ops/slot_assign.py) invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import gather_displacements
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape
from mtp_tpu.ops.slot_assign import assign_slots, octant_classes, reverse_slots


def _thermal_config(sigma=0.1, dtype=jnp.float32):
    pos, types, cell = make_lattice("fcc", 4.0, (8, 8, 8))
    rng = np.random.default_rng(3)
    pos = jnp.asarray(pos + rng.normal(0, sigma, pos.shape), dtype)
    cell = jnp.asarray(cell, dtype)
    grid = grid_shape(np.asarray(cell), 5.6)
    nl = build_neighbor_list(pos, cell, 5.6, max_neighbors=56, grid=grid)
    assert not bool(nl.overflow)
    idx = jnp.sort(nl.idx, axis=1)
    disp = gather_displacements(pos, idx, cell, jnp.linalg.inv(cell))
    return pos, cell, idx, disp


def test_octant_classes_antisymmetric():
    """Both ends of every real pair see complementary classes (f32: relies
    on bitwise antisymmetry of minimum-image displacements)."""
    pos, cell, idx, disp = _thermal_config()
    cls = np.asarray(octant_classes(disp, idx))
    _, r = reverse_slots(idx)
    r = np.asarray(r)
    idxn = np.asarray(idx)
    n, j = idxn.shape
    rows = np.arange(n)[:, None]
    real = idxn != rows
    a = np.broadcast_to(rows, idxn.shape)[real]
    s = np.broadcast_to(np.arange(j)[None, :], idxn.shape)[real]
    jj = idxn[real]
    np.testing.assert_array_equal(cls[jj, r[a, s]], 7 - cls[a, s])


def test_assign_slots_permutation_and_alignment():
    pos, cell, idx, disp = _thermal_config()
    cls = octant_classes(disp, idx)
    perm, aligned = assign_slots(idx, cls)
    permn = np.asarray(perm)
    n, j = permn.shape
    # perm is a permutation of 0..J-1 per row
    assert (np.sort(permn, axis=1) == np.arange(j)[None, :]).all()
    # aligned pairs sit at slots congruent to their class
    cls_new = np.asarray(jnp.take_along_axis(cls, perm, axis=1))
    al = np.asarray(aligned)
    s8 = np.broadcast_to(np.arange(j)[None, :] % 8, al.shape)
    assert (cls_new[al] % 8 == s8[al]).all()
    # pads are never "aligned"
    assert not (al & (cls_new == 8)).any()
    # most directions align at both ends on a thermal config
    new_idx = jnp.take_along_axis(idx, perm, axis=1)
    _, r = reverse_slots(new_idx)
    rows = np.arange(n)[:, None]
    real = np.asarray(new_idx) != rows
    rn = np.asarray(r)
    both = al & al[np.asarray(new_idx), rn] & real
    assert (rn[both] % 8 == 7 - s8[both]).all()
    frac = both.sum() / real.sum()
    assert frac > 0.85, frac


def test_assign_slots_apply_matches_gather_form():
    """The sort-with-payload fast path (assign_slots_apply) must produce
    exactly the layout of take_along_axis(x, assign_slots(...)[0]) — same
    class-major order, same leftover policy (round-4: per-row take_along
    is a ~1 s scalar gather at 1M x 64 on v5e; the sort form is ~50 ms)."""
    from mtp_tpu.ops.slot_assign import assign_slots_apply

    pos, cell, idx, disp = _thermal_config()
    cls = octant_classes(disp, idx)
    perm, aligned_ref = assign_slots(idx, cls)
    idx_ref = jnp.take_along_axis(idx, perm, axis=1)
    widx = idx * 7 + 3  # any co-permuted payload
    widx_ref = jnp.take_along_axis(widx, perm, axis=1)

    idx_new, widx_new, aligned_new = assign_slots_apply(idx, widx, cls)
    np.testing.assert_array_equal(np.asarray(idx_new), np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(widx_new), np.asarray(widx_ref))
    np.testing.assert_array_equal(
        np.asarray(aligned_new), np.asarray(aligned_ref)
    )


def test_reverse_slots_roundtrip():
    pos, cell, idx, disp = _thermal_config()
    cls = octant_classes(disp, idx)
    perm, _ = assign_slots(idx, cls)
    new_idx = np.asarray(jnp.take_along_axis(idx, perm, axis=1))
    mirror, r = reverse_slots(jnp.asarray(new_idx))
    n, j = new_idx.shape
    rows = np.arange(n)[:, None]
    real = new_idx != rows
    a = np.broadcast_to(rows, new_idx.shape)[real]
    s = np.broadcast_to(np.arange(j)[None, :], new_idx.shape)[real]
    jj = new_idx[real]
    rn = np.asarray(r)
    # the reverse slot of (a, s) holds a in row j
    np.testing.assert_array_equal(new_idx[jj, rn[a, s]], a)
    # mirror is an involution mapping (a->j) to (j->a)
    m = np.asarray(mirror)
    np.testing.assert_array_equal(m[m], np.arange(n * j))
    flat_dst = new_idx.reshape(-1)
    src = np.repeat(np.arange(n), j)
    np.testing.assert_array_equal(src[m], flat_dst)
