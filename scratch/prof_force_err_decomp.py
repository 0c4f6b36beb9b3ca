"""Decompose the fp32 force error: per-pair-TERM rounding vs J-SUM rounding.

VERDICT r3 item 4 asks whether compensated (Kahan) accumulation in the
pair-force J-reduction can tighten the fp32 force gate. This measures where
the error actually lives, on the XLA CPU path (no TPU/MXU effects):

  * f32 TERMS + f64 sum  -> isolates the fp32 moment-DAG chain error
  * f64 terms (rounded once to f32) + f32 sum -> isolates the J-sum error

Result (4k thermal fcc, level-16, 2026-08-19):
  full f32 path:            max|dF| = 8.0e-6
  f32 TERMS, f64 sum:       max|dF| = 7.6e-6   <- ~all of it
  f64 terms->f32, f32 sum:  max|dF| = 1.0e-7   <- negligible
So Kahan/two-sum in the J-reduction buys nothing: the error is the fp32
backward DAG itself. Beating the ~1.4e-5 floor (32k, accuracy_gate
--fp32-cpu) requires f32x2 through the whole chain (3-10x cost) — the f64
CPU path remains the reference-grade option (PARITY.md).

Run: JAX_PLATFORMS=cpu python scratch/prof_force_err_decomp.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from mtp_tpu.io.basis_gen import make_mtp
from mtp_tpu.md.simulation import make_lattice
from mtp_tpu.models.mtp import MTPModel, gather_displacements, mtp_energy_forces
from mtp_tpu.ops.neighbors import build_neighbor_list, grid_shape

m = make_mtp(16, species_count=1, seed=0)
pos, types, cell = make_lattice("fcc", 4.0, (10, 10, 10))
rng = np.random.default_rng(0)
pos = pos + rng.normal(scale=0.07, size=pos.shape)
n = len(pos)
grid = grid_shape(cell, 5.0)
model64 = MTPModel.from_data(m, dtype=jnp.float64)
nl = build_neighbor_list(
    jnp.asarray(pos), jnp.asarray(cell), model64.cutoff,
    max_neighbors=64, grid=grid, with_reverse=True,
)
assert not bool(nl.overflow)
out64 = mtp_energy_forces(
    model64.schedule, model64.coeffs, jnp.asarray(pos),
    jnp.asarray(types, jnp.int32), nl.idx, jnp.asarray(cell),
    nl.mirror, backend="xla",
)
F64 = np.asarray(out64["forces"], np.float64)
model32 = MTPModel.from_data(m, dtype=jnp.float32)
tj = jnp.asarray(types, jnp.int32)


def pair_terms(model, dtype):
    """g[i, jj] = dE/d disp[i, jj] via vjp of the site-energy map."""
    import mtp_tpu.ops.moments as om

    pj = jnp.asarray(pos, dtype)
    cj = jnp.asarray(cell, dtype)
    disp = gather_displacements(pj, nl.idx, cell=cj, inv_cell=jnp.linalg.inv(cj))
    mask = nl.idx != jnp.arange(n)[:, None]
    jtypes = tj[nl.idx]
    _, vjp_fn = jax.vjp(
        lambda d: om.site_energies(model.schedule, model.coeffs, d, mask, tj, jtypes),
        disp,
    )
    (g,) = vjp_fn(jnp.ones((n,), dtype))
    return g


def forces_from(g, dtype):
    """F_i = sum_j (g_ij - g_ji) (Newton give-back via the mirror)."""
    g = g.astype(dtype)
    t_ji = g.reshape(-1, 3)[nl.mirror].reshape(n, -1, 3)
    return np.asarray(jnp.sum(g - t_ji, axis=1), np.float64)


g64 = pair_terms(model64, jnp.float64)
g32 = pair_terms(model32, jnp.float32)
print("sanity f64 terms+sum:     max|dF| =", np.abs(forces_from(g64, jnp.float64) - F64).max())
print("f32 TERMS, f64 sum:       max|dF| =", np.abs(forces_from(g32, jnp.float64) - F64).max())
print("f64 terms->f32, f32 sum:  max|dF| =", np.abs(forces_from(g64.astype(jnp.float32), jnp.float32) - F64).max())
