"""Chebyshev radial basis on a scaled interval with smooth-cutoff envelope.

Matches the reference RBChebyshev (mtp_rb_chevbyshev_basis.cpp:29-38):

    xi      = (2 d - (Rmin + Rmax)) / (Rmax - Rmin)
    T_0     = scaling * (d - Rmax)^2
    T_1     = xi * T_0
    T_k     = 2 xi T_{k-1} - T_{k-2}

The (d - Rmax)^2 envelope drives every basis function (and its derivative)
smoothly to zero at the outer cutoff. Derivatives are obtained by JAX autodiff
rather than the reference's hand-written recurrence
(mtp_rb_chevbyshev_basis.cpp:40-54) — same values, no dual bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp


def chebyshev_basis(dist, size: int, min_dist, max_dist, scaling=1.0):
    """Radial basis values, stacked on a new trailing axis.

    Args:
      dist: distances, any shape (...,).
      size: number of basis functions (static; >= 2).
      min_dist/max_dist/scaling: basis hyperparameters.

    Returns:
      (..., size) array of basis values.
    """
    if size < 2:
        raise ValueError("radial_basis_size must be >= 2")
    ksi = (2.0 * dist - (min_dist + max_dist)) / (max_dist - min_dist)
    env = scaling * (dist - max_dist) ** 2
    vals = [env, ksi * env]
    for _ in range(2, size):
        vals.append(2.0 * ksi * vals[-1] - vals[-2])
    return jnp.stack(vals, axis=-1)
