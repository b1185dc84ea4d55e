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
    a = jnp.where(success, alphas[j], 0.0)
    X_new = X + a * dZX
    U_new = U + a * dZU
    merit_new = jnp.where(success, min_merit, merit_baseline)
    return X_new, U_new, merit_new, step, rho, drho
