"""Parallel multi-alpha line search with adaptive rho regularization.

Re-design of gato/bsqp/kernels/line_search.cuh:12-98. Per lane:
  - pick alpha* = argmin_alpha merit(alpha) (first minimum on ties, matching
    the reference's strict-less tree reduction),
  - success iff min merit < previous baseline merit,
  - adapt rho (settings.h:18-21 constants):
      success: drho = min(drho/1.2, 1/1.2); rho = clip(rho*drho, 1e-8, 10)
      failure: drho = max(drho*1.2, 1.2);   rho = clip(rho*drho, 1e-8, 10)
    on failure, if rho exceeds RHO_MAX it resets to RHO_INIT
    (line_search.cuh:76-80; only reachable with adaptation disabled),
  - on success update the trajectory in place and the baseline merit;
    on failure report step = -1 and leave the trajectory untouched.
"""

from __future__ import annotations

import jax.numpy as jnp

from .schur import RHO_FACTOR, RHO_INIT, RHO_MAX, RHO_MIN


def line_search_update(
    merits,  # (A,) merit per alpha
    merit_baseline,  # scalar: previous accepted merit
    alphas,  # (A,)
    X, U, dZX, dZU,
    rho, drho,
    adapt_rho: bool,
):
    # non-finite candidate merits (diverged PCG -> NaN dz -> NaN merit) are
    # masked to +inf so they can never win the argmin over a finite
    # alternative, and never count as an improvement
    merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
    j = jnp.argmin(merits)
    min_merit = merits[j]
    success = min_merit < merit_baseline

    if adapt_rho:
        mult = jnp.where(
            success,
            jnp.minimum(drho / RHO_FACTOR, 1.0 / RHO_FACTOR),
            jnp.maximum(drho * RHO_FACTOR, RHO_FACTOR),
        )
        drho = mult
        rho = jnp.clip(rho * mult, RHO_MIN, RHO_MAX)

    rho = jnp.where(jnp.logical_and(~success, rho > RHO_MAX), RHO_INIT, rho)

    step = jnp.where(success, alphas[j], -1.0)
    # where-select, NOT X + 0*dZ: the reference leaves the trajectory
    # genuinely untouched on failure (line_search.cuh:90-97), and a NaN step
    # from a diverged PCG would survive a multiply-by-zero (0 * NaN = NaN)
    # and contaminate the rejected trajectory.
    X_new = jnp.where(success, X + alphas[j] * dZX, X)
    U_new = jnp.where(success, U + alphas[j] * dZU, U)
    merit_new = jnp.where(success, min_merit, merit_baseline)
    return X_new, U_new, merit_new, step, rho, drho
