"""Spatial (Plücker) algebra primitives in JAX.

TPU-native counterpart of the reference's generated spatial helpers
(`dot_prod`, `mx*`, `fx*` in indy7_grid.cuh:109-891). Conventions follow
Featherstone: motion vectors are [w; v], force vectors are [n; f]. Transforms
are carried as (E, r) pairs — rotation child<-parent and child origin in the
parent frame — instead of materialized 6x6 Plücker matrices, which keeps the
op count minimal for the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.batch_linalg import mm, mtv, mv


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(axis, q):
    """Rotation matrix about a fixed unit axis by angle q. Shapes broadcast:
    axis (..., 3), q (...) -> (..., 3, 3)."""
    c = jnp.cos(q)[..., None, None]
    s = jnp.sin(q)[..., None, None]
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * mm(K, K)


def xm_apply(E, r, m):
    """Motion transform child<-parent applied to a motion vector.
    X = [[E, 0], [-E skew(r), E]]  =>  [E w ; E (v - r x w)]."""
    w, v = m[..., :3], m[..., 3:]
    Ew = mv(E, w)
    Ev = mv(E, v - jnp.cross(r, w))
    return jnp.concatenate([Ew, Ev], axis=-1)


def xf_apply_T(E, r, f):
    """Force accumulation to the parent: X^T f (X the motion transform
    child<-parent). n_p = E^T n + r x (E^T f);  f_p = E^T f."""
    n, fl = f[..., :3], f[..., 3:]
    Etf = mtv(E, fl)
    Etn = mtv(E, n)
    return jnp.concatenate([Etn + jnp.cross(r, Etf), Etf], axis=-1)


def crm(v, m):
    """Motion cross product v x m = [w x mw ; w x mv + vl x mw]."""
    w, vl = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vl, mw)], axis=-1
    )


def crf(v, f):
    """Force cross product v x* f = [w x n + vl x fl ; w x fl]."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def imul(I6, v):
    """Spatial inertia times motion vector."""
    return mv(I6, v)


def xform_to_parent_inertia(E, r, I6):
    """X^T I X with X the motion transform child<-parent: expresses a child
    spatial inertia in the parent frame (used by CRBA composite buildup)."""
    X = jnp.zeros(I6.shape[:-2] + (6, 6), dtype=I6.dtype)
    X = X.at[..., :3, :3].set(E)
    X = X.at[..., 3:, :3].set(-mm(E, skew(r)))
    X = X.at[..., 3:, 3:].set(E)
    return mm(mm(jnp.swapaxes(X, -1, -2), I6), X)
