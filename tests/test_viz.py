"""Smoke tests for the rollout visualizer (gato_tpu/utils/viz.py)."""

import os

import numpy as np
import jax.numpy as jnp

from gato_tpu.robots.model import load_robot
from gato_tpu.utils.viz import plot_rollout, skeleton_points


def test_skeleton_points_shape_and_reach():
    model = load_robot("indy7")
    pts = skeleton_points(model, np.zeros(6, np.float32))
    assert pts.shape == (8, 3)  # base + 6 joints + EE
    assert np.isfinite(pts).all()
    # at the zero configuration the arm points up: EE well above the base
    assert pts[-1, 2] > 0.5


def test_plot_rollout_writes_png(tmp_path):
    model = load_robot("iiwa14")
    T, nq = 12, 7
    qs = 0.3 * np.sin(np.linspace(0, 1, T))[:, None] * np.ones((T, nq))
    ref = np.tile(np.array([0.3, 0.2, 0.8]), (T, 1))
    out = os.path.join(tmp_path, "rollout.png")
    fig = plot_rollout(model, qs, ref=ref, path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 5000
    import matplotlib.pyplot as plt
    plt.close(fig)
