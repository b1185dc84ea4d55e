"""On-device (jittable) 6D external-wrench estimator.

Pure-function mirror of api/force_estimator.py (itself the semantic port of
the reference's examples/force_estimator.py:100-136): lane 0 = smoothed
estimate, lane 1 = zero, lane 2 = estimate + momentum, lanes 3.. =
Fibonacci-sphere exploration at an adaptive radius under a per-update random
rotation. As a pytree + pure step functions it runs INSIDE a jitted rollout
scan (api/rollout.py::closed_loop_rollout_estimator) — a capability beyond
the reference, whose estimator lives host-side between solver calls; on this
image's tunneled runtime each host hop costs ~25 ms, so on-device estimation
is what makes force-adaptive MPC evaluable at rate.

Parity with the numpy class is exact (tests/test_force_estimator_device.py
drives both with identical rotation draws).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FEState:
    """Estimator state (all float32; shapes fixed)."""

    estimate: jax.Array  # (6,)
    momentum: jax.Array  # (6,)
    smoothed: jax.Array  # (6,)
    radius: jax.Array  # ()
    confidence: jax.Array  # ()
    err_hist: jax.Array  # (5,) rolling, newest last
    err_count: jax.Array  # () int32
    rotation: jax.Array  # (3, 3)


def fibonacci_sphere(n: int) -> np.ndarray:
    """Static exploration directions (api/force_estimator.py:38-48)."""
    if n == 0:
        return np.zeros((0, 3), np.float32)
    pts = np.zeros((n, 3), np.float32)
    golden = (1 + np.sqrt(5)) / 2
    for i in range(n):
        y = 1 - 2 * i / (n - 1) if n > 1 else 0.0
        r = np.sqrt(max(0.0, 1 - y * y))
        th = 2 * np.pi * i / golden
        pts[i] = [r * np.cos(th), y, r * np.sin(th)]
    return pts


def fe_init(initial_radius=10.0) -> FEState:
    f32 = jnp.float32
    z6 = jnp.zeros(6, f32)
    return FEState(estimate=z6, momentum=z6, smoothed=z6,
                   radius=jnp.asarray(initial_radius, f32),
                   confidence=jnp.asarray(0.0, f32),
                   err_hist=jnp.zeros(5, f32),
                   err_count=jnp.asarray(0, jnp.int32),
                   rotation=jnp.eye(3, dtype=f32))


def rotation_from_uniforms(u):
    """Uniform random rotation from 3 U(0,1) draws (Shoemake; identical
    formula to api/force_estimator.py:50-62)."""
    u1, u2, u3 = u[0], u[1], u[2]
    a, b = jnp.sqrt(1 - u1), jnp.sqrt(u1)
    x, y = a * jnp.sin(2 * jnp.pi * u2), a * jnp.cos(2 * jnp.pi * u2)
    z, w = b * jnp.sin(2 * jnp.pi * u3), b * jnp.cos(2 * jnp.pi * u3)
    return jnp.array(
        [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
         [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
         [2 * (x * z - w * y), 2 * (y * z + w * x),
          1 - 2 * (x * x + y * y)]], dtype=jnp.float32)


def fe_generate(state: FEState, dirs) -> jax.Array:
    """(B, 6) hypothesis batch; dirs: (B-3, 3) static sphere directions."""
    base = 0.7 * state.smoothed[:3] + 0.3 * state.estimate[:3]
    expl_f = base[None, :] + state.radius * (dirs @ state.rotation.T)
    expl = jnp.concatenate(
        [expl_f, jnp.tile(state.smoothed[3:][None], (dirs.shape[0], 1))],
        axis=1)
    head = jnp.stack([state.smoothed,
                      jnp.zeros(6, expl.dtype),
                      state.smoothed + 0.5 * state.momentum])
    return jnp.concatenate([head, expl], axis=0)


def fe_update(state: FEState, dirs, best_idx, prediction_errors, u,
              alpha=0.5, beta=0.8, min_radius=1.0, max_radius=100.0,
              smoothing_factor=0.3) -> FEState:
    """One estimator update (api/force_estimator.py:76-106). `u`: (3,)
    uniform draws for the next exploration rotation (injectable so the
    numpy-class parity test can drive both with identical randomness)."""
    err_hist = jnp.concatenate(
        [state.err_hist[1:], jnp.min(prediction_errors)[None]])
    err_count = state.err_count + 1

    best_force = fe_generate(state, dirs)[best_idx]
    delta = best_force - state.estimate
    momentum = beta * state.momentum + (1 - beta) * delta
    raw = alpha * best_force + (1 - alpha) * state.estimate
    estimate = 0.8 * state.estimate + 0.2 * (raw + 0.5 * momentum)
    smoothed = ((1 - smoothing_factor) * state.smoothed
                + smoothing_factor * estimate)

    exploit = best_idx < 3
    radius = state.radius * jnp.where(exploit, 0.95, 1.05)
    confidence = jnp.where(exploit,
                           jnp.minimum(1.0, state.confidence + 0.05),
                           jnp.maximum(0.0, state.confidence - 0.1))
    radius = jnp.clip(radius, min_radius, max_radius)

    # error-history adaptation engages once more than 5 updates recorded
    recent, last = err_hist, err_hist[-1]
    stag = jnp.std(recent) < 0.01
    spike = last > 1.5 * jnp.mean(recent[:-1])
    have5 = err_count > 5
    radius = jnp.where(have5 & stag, radius * 0.9,
                       jnp.where(have5 & spike, radius * 1.3, radius))
    confidence = jnp.where(have5 & ~stag & spike, confidence * 0.5,
                           confidence)
    radius = jnp.clip(radius, min_radius, max_radius)

    return FEState(estimate=estimate, momentum=momentum, smoothed=smoothed,
                   radius=radius, confidence=confidence, err_hist=err_hist,
                   err_count=err_count,
                   rotation=rotation_from_uniforms(u))


def observer_update(pred_fn, w_est, x_meas, lam_rel=1e-3, max_step=20.0):
    """Gauss-Newton wrench observer — BEYOND the reference's random search.

    The one-step state transition is (near-)linear in the external wrench
    (qdd = M^-1(tau - bias + J^T f)), so one damped least-squares step on
    the measured transition recovers it directly:

        G = d pred(w) / d w   (12 x 6, by forward-mode AD through the
                               integrator + frame transform),
        w <- w + (G^T G + lam I)^-1 G^T (x_meas - pred(w)),
        lam = lam_rel * diag(G^T G)   (Marquardt diagonal damping: the
              state is ~1000x more sensitive to EE torque than force —
              wrist inertia is tiny — so scalar damping crushes the force
              dimensions; per-dimension damping keeps all 6 observable),

    clipped to `max_step` per update for robustness to contact transients.
    `pred_fn(w)` must roll the PREVIOUS cycle's (state, control) forward
    under world-frame wrench hypothesis w with the plant's own integrator.
    Converges in a handful of cycles where the sphere search plateaus.
    """
    r = x_meas - pred_fn(w_est)
    G = jax.jacfwd(pred_fn)(w_est)  # (nx, 6)
    # exact-f32 contractions: the TPU dot_general bf16 default corrupts the
    # normal equations (CLAUDE.md precision note)
    hi = jax.lax.Precision.HIGHEST
    GtG = jax.lax.dot_general(G, G, (((0,), (0,)), ((), ())), precision=hi)
    lam = lam_rel * jnp.diag(GtG) + 1e-12
    A = GtG + jnp.diag(lam)
    b = jax.lax.dot_general(G, r, (((0,), (0,)), ((), ())), precision=hi)
    step = jnp.linalg.solve(A, b)
    nrm = jnp.linalg.norm(step)
    step = step * jnp.minimum(1.0, max_step / jnp.maximum(nrm, 1e-9))
    return w_est + step
