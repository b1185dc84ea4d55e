"""Rigid-body dynamics algorithms in pure JAX, jit-specialized per robot.

TPU-native replacement for the reference's GRiD-generated CUDA
(indy7_grid.cuh / iiwa14_grid.cuh): RNEA inverse dynamics, CRBA mass matrix,
forward dynamics, analytical dynamics gradients, and end-effector kinematics.
Joint loops are unrolled at trace time (nq is 6/7 and static), so under vmap
every per-joint op becomes a wide batched VPU op — the JAX analogue of GRiD's
"one thread block per (knot, solve)" with fully unrolled joint code.

External wrench semantics mirror the reference's `*_fext.cuh` variants: a 6D
spatial force subtracted from the end-effector link's net spatial force in the
RNEA pass (indy7_fext.cuh:137-142), expressed in the EE link frame with
[moment; force] ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.batch_linalg import chol_factor, chol_solve, mm, mv
from ..robots.model import RobotModel
from .spatial import crf, crm, imul, rodrigues, skew, xf_apply_T, xm_apply


def joint_transforms(model: RobotModel, q):
    """Per-joint motion transform (E, r): child<-parent at configuration q.

    E_i = (R_tree_i @ R_axis(q_i))^T,  r_i = p_tree_i.
    Also returns the world pose (R_w, p_w) of every link frame (FK).
    """
    Rj = rodrigues(model.axis, q)  # (nq, 3, 3)
    R_link = mm(model.R_tree, Rj)  # rotation child-in-parent
    E = jnp.swapaxes(R_link, -1, -2)
    r = model.p_tree
    return E, r, R_link


def fk(model: RobotModel, q, R_link=None):
    """World pose of each link frame: returns (R_w (nq,3,3), p_w (nq,3))."""
    if R_link is None:
        _, _, R_link = joint_transforms(model, q)
    Rs, ps = [], []
    Rw = jnp.eye(3, dtype=q.dtype)
    pw = jnp.zeros(3, dtype=q.dtype)
    for i in range(model.nq):
        pw = pw + mv(Rw, model.p_tree[i])
        Rw = mm(Rw, R_link[i])
        Rs.append(Rw)
        ps.append(pw)
    return jnp.stack(Rs), jnp.stack(ps)


def ee_position(model: RobotModel, q):
    """6D end-effector pose [x, y, z, roll, pitch, yaw] of the last joint
    frame. Matches the reference's generated `end_effector_positions`
    (indy7_grid.cuh:1834-1911): the trailing fixed tool offset is NOT applied,
    and rpy uses the same atan2 extraction."""
    Rs, ps = fk(model, q)
    R, p = Rs[-1], ps[-1]
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    pitch = -jnp.arctan2(R[2, 0], jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2))
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    return jnp.concatenate([p, jnp.stack([roll, pitch, yaw])])


def ee_xyz_jacobian(model: RobotModel, q):
    """Analytic Jacobian of the EE xyz position wrt q: (3, nq).
    Column i = w_i x (p_ee - p_i) with w_i the world-frame joint axis."""
    return ee_position_and_jacobian(model, q)[1]


def ee_position_and_jacobian(model: RobotModel, q):
    """EE xyz and its Jacobian from a single FK pass: (3,), (3, nq)."""
    Rs, ps = fk(model, q)
    p_ee = ps[-1]
    cols = []
    for i in range(model.nq):
        w = mv(Rs[i], model.axis[i])
        cols.append(jnp.cross(w, p_ee - ps[i]))
    return p_ee, jnp.stack(cols, axis=-1)


def _base_gravity_accel(model: RobotModel, dtype):
    """RNEA gravity trick: base acceleration +g z (world is z-up)."""
    a0 = jnp.zeros(6, dtype=dtype)
    return a0.at[5].set(model.gravity.astype(dtype))


def rnea(model: RobotModel, q, qd, qdd, f_ext=None, gravity: bool = True,
         transforms=None):
    """Recursive Newton-Euler inverse dynamics: tau(q, qd, qdd).

    f_ext: optional 6D spatial wrench [n; f] in the EE link frame, subtracted
    from the last link's net spatial force (mirrors indy7_fext.cuh:137-142).
    transforms: optional precomputed (E, r) to share FK work across calls.
    """
    E, r = transforms if transforms is not None else joint_transforms(model, q)[:2]
    nq = model.nq
    S = jnp.concatenate([model.axis, jnp.zeros_like(model.axis)], axis=-1)

    v_list, a_list, f_list = [], [], []
    v_par = jnp.zeros(6, dtype=q.dtype)
    a_par = _base_gravity_accel(model, q.dtype) if gravity else jnp.zeros(6, dtype=q.dtype)
    for i in range(nq):
        vJ = S[i] * qd[i]
        v = xm_apply(E[i], r[i], v_par) + vJ
        a = xm_apply(E[i], r[i], a_par) + S[i] * qdd[i] + crm(v, vJ)
        f = imul(model.inertia[i], a) + crf(v, imul(model.inertia[i], v))
        v_list.append(v)
        a_list.append(a)
        f_list.append(f)
        v_par, a_par = v, a

    if f_ext is not None:
        f_list[-1] = f_list[-1] - f_ext

    tau = [None] * nq
    for i in reversed(range(nq)):
        tau[i] = S[i] @ f_list[i]
        if i > 0:
            f_list[i - 1] = f_list[i - 1] + xf_apply_T(E[i], r[i], f_list[i])
    return jnp.stack(tau)


def crba(model: RobotModel, q, transforms=None):
    """Composite rigid body algorithm: joint-space mass matrix M(q)."""
    E, r = transforms if transforms is not None else joint_transforms(model, q)[:2]
    nq = model.nq
    S = jnp.concatenate([model.axis, jnp.zeros_like(model.axis)], axis=-1)

    Ic = [model.inertia[i] for i in range(nq)]
    M = jnp.zeros((nq, nq), dtype=q.dtype)
    for i in reversed(range(nq)):
        if i > 0:
            # X^T Ic X: push composite inertia to the parent
            X = jnp.zeros((6, 6), dtype=q.dtype)
            X = X.at[:3, :3].set(E[i])
            X = X.at[3:, :3].set(-mm(E[i], skew(r[i])))
            X = X.at[3:, 3:].set(E[i])
            Ic[i - 1] = Ic[i - 1] + mm(mm(X.T, Ic[i]), X)
        F = imul(Ic[i], S[i])
        M = M.at[i, i].set(S[i] @ F)
        j = i
        while j > 0:
            F = xf_apply_T(E[j], r[j], F)
            j -= 1
            val = F @ S[j]
            M = M.at[i, j].set(val)
            M = M.at[j, i].set(val)
    return M


def mass_matrix_cholesky(model: RobotModel, q, transforms=None):
    return chol_factor(crba(model, q, transforms=transforms))


def fd(model: RobotModel, q, qd, tau, f_ext=None, transforms=None):
    """Forward dynamics qdd = M(q)^-1 (tau - c(q, qd) + J^T f_ext effects).
    Mirrors the reference composition: direct Minv + RNEA bias + finish
    (indy7_plant.cuh:150-173)."""
    c = rnea(model, q, qd, jnp.zeros_like(q), f_ext=f_ext, transforms=transforms)
    L = mass_matrix_cholesky(model, q, transforms=transforms)
    return chol_solve(L, tau - c)


def fd_and_grad(model: RobotModel, q, qd, tau, f_ext=None):
    """Forward dynamics with analytical gradients.

    Returns (qdd, dqdd_dq, dqdd_dqd, dqdd_dtau), using the standard identity
      d qdd / dz = -Minv * d ID(q, qd, qdd*)/dz,   d qdd / dtau = Minv,
    the same structure as the reference's forwardDynamicsAndGradient
    (indy7_plant.cuh:180-217). The inverse-dynamics partials are exact
    (forward-mode through the unrolled RNEA).
    """
    c = rnea(model, q, qd, jnp.zeros_like(q), f_ext=f_ext)
    L = mass_matrix_cholesky(model, q)
    qdd = chol_solve(L, tau - c)

    did_dq, did_dqd = jax.jacfwd(
        lambda q_, qd_: rnea(model, q_, qd_, qdd, f_ext=f_ext), argnums=(0, 1)
    )(q, qd)
    Minv = chol_solve(L, jnp.eye(model.nq, dtype=q.dtype))
    dqdd_dq = -mm(Minv, did_dq)
    dqdd_dqd = -mm(Minv, did_dqd)
    return qdd, dqdd_dq, dqdd_dqd, Minv


def kinetic_energy(model: RobotModel, q, qd):
    M = crba(model, q)
    return 0.5 * qd @ M @ qd


def potential_energy(model: RobotModel, q):
    """Sum of m g z_com over links (z-up world)."""
    Rs, ps = fk(model, q)
    pe = jnp.asarray(0.0, dtype=q.dtype)
    for i in range(model.nq):
        I6 = model.inertia[i]
        m = I6[5, 5]
        # m * com = unskew of the upper-right block
        mc = jnp.stack([I6[2, 4], I6[0, 5], I6[1, 3]])
        com_w = ps[i] + mv(Rs[i], mc / jnp.maximum(m, 1e-12))
        pe = pe + m * model.gravity * com_w[2]
    return pe


def id_so_derivatives(model: RobotModel, q, qd, qdd):
    """Second-order inverse-dynamics derivatives d2tau/d(q,qd)^2.

    Capability parity with the reference's generated `idsva_so_inner`
    (iiwa14_grid.cuh:7956) — produced there by codegen, here by forward-over-
    forward AD through the unrolled RNEA. Returns a nested jacobian pytree
    (((d2tau/dqdq, d2tau/dqdqd), (d2tau/dqddq, d2tau/dqddqd)))."""
    f = lambda q_, qd_: rnea(model, q_, qd_, qdd)
    return jax.jacfwd(jax.jacfwd(f, argnums=(0, 1)), argnums=(0, 1))(q, qd)


def fd_so_derivatives(model: RobotModel, q, qd, tau):
    """Second-order forward-dynamics derivatives (fdsva_so_inner analogue,
    iiwa14_grid.cuh:8813)."""
    f = lambda q_, qd_, t_: fd(model, q_, qd_, t_)
    return jax.jacfwd(jax.jacfwd(f, argnums=(0, 1, 2)), argnums=(0, 1, 2))(
        q, qd, tau)


def ee_pose_grad_hess(model: RobotModel, q):
    """EE 6D pose gradient and Hessian wrt q (parity with the generated
    `end_effector_pose_gradient[_hessian]`, iiwa14_grid.cuh header :46-59)."""
    J = jax.jacfwd(lambda q_: ee_position(model, q_))(q)
    H = jax.jacfwd(jax.jacfwd(lambda q_: ee_position(model, q_)))(q)
    return J, H


def aba(model: RobotModel, q, qd, tau, f_ext=None):
    """Articulated-body algorithm: O(n) forward dynamics without forming M.

    Capability parity with the reference's generated `aba` (iiwa14_grid.cuh
    :6674, :7427 — generated but unused by its solver). Featherstone ch. 7.
    f_ext follows the same EE-link convention as rnea().
    """
    E, r, _ = joint_transforms(model, q)
    nq = model.nq
    S = jnp.concatenate([model.axis, jnp.zeros_like(model.axis)], axis=-1)

    # pass 1: velocities and bias terms
    v = []
    c = []
    v_par = jnp.zeros(6, dtype=q.dtype)
    for i in range(nq):
        vJ = S[i] * qd[i]
        vi = xm_apply(E[i], r[i], v_par) + vJ
        v.append(vi)
        c.append(crm(vi, vJ))
        v_par = vi

    IA = [model.inertia[i] for i in range(nq)]
    pA = [crf(v[i], imul(model.inertia[i], v[i])) for i in range(nq)]
    if f_ext is not None:
        pA[-1] = pA[-1] - f_ext

    # pass 2: articulated inertias up the chain
    U = [None] * nq
    d = [None] * nq
    u_ = [None] * nq
    for i in reversed(range(nq)):
        U[i] = imul(IA[i], S[i])
        d[i] = S[i] @ U[i]
        u_[i] = tau[i] - S[i] @ pA[i]
        if i > 0:
            Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
            pa = pA[i] + imul(Ia, c[i]) + U[i] * (u_[i] / d[i])
            X = jnp.zeros((6, 6), dtype=q.dtype)
            X = X.at[:3, :3].set(E[i])
            X = X.at[3:, :3].set(-mm(E[i], skew(r[i])))
            X = X.at[3:, 3:].set(E[i])
            IA[i - 1] = IA[i - 1] + mm(mm(X.T, Ia), X)
            pA[i - 1] = pA[i - 1] + xf_apply_T(E[i], r[i], pa)

    # pass 3: accelerations down the chain
    a_par = _base_gravity_accel(model, q.dtype)
    qdd = [None] * nq
    for i in range(nq):
        a_p = xm_apply(E[i], r[i], a_par) + c[i]
        qdd[i] = (u_[i] - U[i] @ a_p) / d[i]
        a_par = a_p + S[i] * qdd[i]
    return jnp.stack(qdd)
