"""The Pallas RK4 sim kernel's channelized core vs the spatial-algebra RK4.

The pallas_call itself only compiles on TPU (interpret mode is impractically
slow for this kernel); these tests exercise `rk4_channels` — the exact
function the kernel body runs — on plain batched arrays. The on-TPU kernel
was additionally validated against rk4_step for both plants (max err 3e-5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu.api.common import rk4_step
from gato_tpu.ops.merit_fast import _get_cd
from gato_tpu.ops.pallas_sim import rk4_channels
from gato_tpu.robots.model import load_robot


@pytest.mark.parametrize("key", ["indy7", "iiwa14"])
@pytest.mark.parametrize("with_fe", [False, True])
def test_rk4_channels_matches_rk4_step(key, with_fe):
    model = load_robot(key)
    cd = _get_cd(model.key)
    nq = model.nq
    rng = np.random.default_rng(3)
    B = 4
    x = jnp.asarray(rng.uniform(-1, 1, (B, 2 * nq)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-20, 20, (B, nq)).astype(np.float32))
    fe = (jnp.asarray(rng.uniform(-5, 5, (B, 6)).astype(np.float32))
          if with_fe else None)
    dt = jnp.float32(0.01)

    q = [x[:, i] for i in range(nq)]
    qd = [x[:, nq + i] for i in range(nq)]
    uc = [u[:, i] for i in range(nq)]
    fec = [fe[:, i] for i in range(6)] if with_fe else None
    qo, qdo = jax.jit(
        lambda q, qd, uc, fec: rk4_channels(cd, q, qd, uc, fec, dt, 2)
    )(q, qd, uc, fec)
    out = jnp.stack(list(qo) + list(qdo), axis=1)

    if with_fe:
        from gato_tpu.dynamics.algorithms import fd

        def deriv(xk, uk, fek):
            return jnp.concatenate(
                [xk[nq:], fd(model, xk[:nq], xk[nq:], uk, f_ext=fek)])

        def one_rk4(xk, uk, fek):
            h = dt / 2

            def one(xx, _):
                k1 = deriv(xx, uk, fek)
                k2 = deriv(xx + 0.5 * h * k1, uk, fek)
                k3 = deriv(xx + 0.5 * h * k2, uk, fek)
                k4 = deriv(xx + h * k3, uk, fek)
                return xx + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

            return jax.lax.scan(one, xk, None, length=2)[0]

        one_rk4 = jax.jit(one_rk4)
        ref = jnp.stack([one_rk4(x[i], u[i], fe[i]) for i in range(B)])
    else:
        step1 = jax.jit(lambda xk, uk: rk4_step(model, xk, uk, dt, substeps=2))
        ref = jnp.stack([step1(x[i], u[i]) for i in range(B)])

    assert float(jnp.abs(ref - out).max()) < 2e-4
