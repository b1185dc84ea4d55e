"""Closed-loop MPC layer: figure-8 tracking, goal sequences, batched
force-hypothesis selection, and pendulum-payload robustness experiments.

Re-design of python/bsqp/mpc_controller.py (MPC_GATO). Differences from the
reference, forced by the TPU-native stack:
  - the simulator is the framework's own JAX RK4 dynamics instead of
    Pinocchio (common.py:49-91 -> api/common.rk4_step); the pendulum payload
    is modeled as a 3-revolute (x,y,z) gimbal at the EE instead of a
    Pinocchio spherical joint — equivalent dynamics away from gimbal lock;
  - external wrenches are specified in the world frame and re-expressed in
    the EE link frame each step (physically constant disturbance), rather
    than the reference's constant-in-local-frame pin.Force.

Real-time emulation matches the reference (mpc_controller.py:189-216): the
simulation advances by the measured wall-clock solve time each MPC cycle,
stepping controls along the current plan.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..robots.model import RobotModel
from .common import rk4_step, world_wrench_to_ee_frame
from .config import DEFAULT_SOLVER_PARAMS
from .force_estimator import ForceEstimator
from .interface import BSQP


def add_pendulum(model: RobotModel, mass=15.0, length=0.3):
    """Append a spherical-pendulum payload as a 3-revolute gimbal at the EE
    (mirrors _add_pendulum_to_model, mpc_controller.py:340-359; sim model
    only — the solver keeps the robot-only model)."""
    import numpy as onp

    dtype = np.float32
    eye = onp.eye(3, dtype=dtype)
    zeros3 = onp.zeros(3, dtype=dtype)
    axes = onp.stack([eye[0], eye[1], eye[2]])  # x, y, z gimbal
    R_tree = onp.tile(eye, (3, 1, 1))
    p_tree = onp.tile(zeros3, (3, 1))

    from ..robots.urdf import spatial_inertia

    bob = spatial_inertia(mass, onp.array([0.0, 0.0, -length]),
                          onp.diag([1e-3, 1e-3, 1e-3]))
    # Small armature inertia on the (otherwise massless) gimbal links keeps
    # the mass matrix nonsingular at the y = +-pi/2 gimbal-lock configuration
    # (the Pinocchio spherical joint the reference uses has no such
    # singularity; this is the standard regularization for the 3R substitute).
    armature = onp.zeros((6, 6))
    armature[:3, :3] = onp.eye(3) * 5e-3
    inertias = onp.stack([armature, armature, bob])

    wide = onp.tile(onp.array([-1e3, 1e3], dtype=dtype), (3, 1))
    cat = lambda a, b: jnp.concatenate([a, jnp.asarray(b, a.dtype)], axis=0)
    aug = RobotModel(
        R_tree=cat(model.R_tree, R_tree),
        p_tree=cat(model.p_tree, p_tree),
        axis=cat(model.axis, axes),
        inertia=cat(model.inertia, inertias),
        joint_limits=cat(model.joint_limits, wide),
        velocity_limits=cat(model.velocity_limits, wide),
        effort_limits=cat(model.effort_limits, wide),
        R_ee=model.R_ee, p_ee=model.p_ee, gravity=model.gravity,
        key=f"{model.key}+pendulum(m={mass},l={length})",
    )
    # register trace-time constants for codegen-style paths
    from ..robots.urdf import ParsedRobot
    from ..robots.model import register_parsed
    register_parsed(aug.key, ParsedRobot(
        name=aug.key, nq=aug.nq, joint_names=[],
        R_tree=onp.asarray(aug.R_tree, onp.float64),
        p_tree=onp.asarray(aug.p_tree, onp.float64),
        axis=onp.asarray(aug.axis, onp.float64),
        inertia=onp.asarray(aug.inertia, onp.float64),
        joint_limits=onp.asarray(aug.joint_limits, onp.float64),
        velocity_limits=onp.asarray(aug.velocity_limits, onp.float64),
        effort_limits=onp.asarray(aug.effort_limits, onp.float64),
        R_ee=onp.asarray(aug.R_ee, onp.float64),
        p_ee=onp.asarray(aug.p_ee, onp.float64),
    ))
    return aug


class MPC_GATO:
    """Closed-loop MPC controller (mpc_controller.py:17-599 analogue)."""

    def __init__(
        self,
        model=None,
        model_path=None,
        N=32,
        dt=0.03125,
        batch_size=1,
        constant_f_ext=None,
        track_full_stats=False,
        plant_type="indy7",
        pendulum_config=None,
        solver_params=None,
        realtime=False,
        control_dt=None,
        seed=0,
        estimator="sphere",
    ):
        """Per MPC cycle the simulation advances by:
          - the measured solve time if `realtime=True` (the reference's
            emulation, mpc_controller.py:189-216). The solver's sustained
            per-solve DEVICE time is calibrated once at the start
            (BSQP.calibrate_device_time) and used from then on — the
            wall-clock time on this image's tunneled TPU is dominated by
            ~25 ms transfer latency and would be meaningless;
          - else `control_dt` seconds if given (deterministic stand-in for
            the reference's ~1-3 ms solve times), defaulting to `dt`."""
        solver_cfg = dict(DEFAULT_SOLVER_PARAMS)
        if solver_params:
            solver_cfg.update(solver_params)

        self.solver = BSQP(
            model_path=model_path, batch_size=batch_size, N=N, dt=dt,
            plant_type=plant_type,
            max_sqp_iters=solver_cfg["max_sqp_iters"],
            kkt_tol=solver_cfg["kkt_tol"],
            max_pcg_iters=solver_cfg["max_pcg_iters"],
            pcg_tol=solver_cfg["pcg_tol"],
            solve_ratio=solver_cfg["solve_ratio"],
            mu=solver_cfg["mu"],
            q_cost=solver_cfg["q_cost"],
            qd_cost=solver_cfg["qd_cost"],
            u_cost=solver_cfg["u_cost"],
            N_cost=solver_cfg["N_cost"],
            q_lim_cost=solver_cfg["q_lim_cost"],
            vel_lim_cost=solver_cfg["vel_lim_cost"],
            ctrl_lim_cost=solver_cfg["ctrl_lim_cost"],
            rho=solver_cfg["rho"],
        )
        self.solver_params = solver_cfg
        self.solver_model = self.solver.model

        self.pendulum_config = pendulum_config
        self.has_pendulum = pendulum_config is not None
        if self.has_pendulum:
            self.sim_model = add_pendulum(
                self.solver_model,
                mass=pendulum_config.get("mass", 15.0),
                length=pendulum_config.get("length", 0.3),
            )
        else:
            self.sim_model = self.solver_model

        self.nq_robot = self.solver_model.nq
        self.nv_robot = self.solver_model.nv
        self.nq_sim = self.sim_model.nq
        self.nx = self.solver.nx
        self.nu = self.solver.nu
        self.N = N
        self.dt = dt
        self.batch_size = batch_size
        self.track_full_stats = track_full_stats
        self.realtime = realtime
        self.control_dt = control_dt
        self.rng = np.random.default_rng(seed)

        self.constant_f_ext_world = (
            np.asarray(constant_f_ext, np.float32)
            if constant_f_ext is not None else np.zeros(6, np.float32)
        )
        self._sim_fext = (
            jnp.asarray(self.constant_f_ext_world)
            if np.any(self.constant_f_ext_world) else None
        )

        # estimator="sphere": the reference's random-search ForceEstimator;
        # "observer": the Gauss-Newton wrench observer
        # (api/force_estimator_device.py — converges where the sphere
        # search plateaus). Both need B > 1 hypothesis lanes.
        self.estimator_mode = estimator
        self._w_obs = np.zeros(6, np.float32)
        self._obs_step = None
        if batch_size > 1 and estimator == "observer":
            self.force_estimator = None
            from .common import rk4_step as _rk4s
            from .force_estimator_device import observer_update

            def _obs(w, x_last, u_last, x_meas, dt_cycle):
                def pred(wh):
                    return _rk4s(self.solver_model, x_last, u_last, dt_cycle,
                                 f_ext_world=wh, substeps=2)
                return observer_update(pred, w, x_meas)

            self._obs_step = jax.jit(_obs)
        elif batch_size > 1:
            self.force_estimator = ForceEstimator(
                batch_size=batch_size, initial_radius=5.0, min_radius=2.0,
                max_radius=20.0, smoothing_factor=0.5, seed=seed,
            )
        else:
            self.force_estimator = None

        # jitted simulator step specialized per sim model; `substeps` static
        # so a whole constant-control span is ONE dispatch (each host->device
        # hop on this image's tunneled runtime costs ~25 ms)
        self._sim_step = jax.jit(
            lambda x, u, h, substeps=1: rk4_step(self.sim_model, x, u, h,
                                                 f_ext_world=self._sim_fext,
                                                 substeps=substeps),
            static_argnames=("substeps",),
        )
        # one dispatch for the whole hypothesis batch (instead of B eager
        # FK transforms per cycle)
        self._wrench_tf_batch = jax.jit(
            lambda q, W: jax.vmap(
                lambda w: world_wrench_to_ee_frame(self.solver_model, q, w)
            )(W)
        )

    # ---- helpers ----

    def _sim_control(self, u_robot, xsim):
        """Augment robot torques with pendulum damping (mpc_controller.py:472-479)."""
        if not self.has_pendulum:
            return u_robot
        damping = self.pendulum_config.get("damping", 0.4)
        qd_pend = xsim[self.nq_sim + self.nv_robot:]
        return jnp.concatenate([u_robot, -damping * qd_pend])

    def _robot_state(self, xsim):
        # one device->host read, then slice on host (each read costs ~25 ms
        # on this image's tunneled runtime)
        x = np.asarray(xsim)
        q = x[: self.nq_robot]
        dq = x[self.nq_sim: self.nq_sim + self.nv_robot]
        return np.concatenate([q, dq])

    def _initial_sim_state(self, x_start):
        if not self.has_pendulum:
            return jnp.asarray(x_start, jnp.float32)
        nqs, nvs = self.nq_sim, self.sim_model.nv
        x = np.zeros(nqs + nvs, np.float32)
        x[: self.nq_robot] = x_start[: self.nq_robot]
        init = self.pendulum_config.get("initial_angle", np.array([0.3, 0.0, 0.0]))
        x[self.nq_robot: self.nq_robot + 3] = init
        x[nqs: nqs + self.nv_robot] = x_start[self.nq_robot:]
        return jnp.asarray(x)

    def update_force_batch(self, q):
        """Generate wrench hypotheses and hand them to the solver in the EE
        frame (mpc_controller.py:279-292)."""
        if self.batch_size == 1:
            return
        if self.estimator_mode == "observer":
            # lane 0 = observer estimate, lane 1 = zero (safety), rest copy
            batch = np.tile(self._w_obs, (self.batch_size, 1))
            batch[1] = 0.0
        elif self.force_estimator is None:
            return
        else:
            batch = self.force_estimator.generate_batch()
        out = np.asarray(self._wrench_tf_batch(
            jnp.asarray(q[: self.nq_robot], jnp.float32),
            jnp.asarray(batch, jnp.float32)))
        self.solver.set_f_ext_B(out)

    def transform_force_to_gato_frame(self, q, f_world):
        """World wrench -> the solver's EE-frame [n; f] spatial force
        (mpc_controller.py:311-338 analogue, via our own FK)."""
        w = world_wrench_to_ee_frame(
            self.solver_model, jnp.asarray(q[: self.nq_robot], jnp.float32),
            jnp.asarray(f_world, jnp.float32),
        )
        return np.asarray(w)

    def evaluate_best_trajectory(self, x_last, u_last, x_curr, dt):
        """Pick the hypothesis whose one-step rollout best matches the
        measured state (mpc_controller.py:294-309)."""
        if self.batch_size == 1 or (self.force_estimator is None
                                    and self._obs_step is None):
            return 0
        x_next = self.solver.sim_forward(x_last, u_last, dt)
        errors = np.linalg.norm(x_next - np.asarray(x_curr)[None, :], axis=1)
        # a dead lane (diverged solve) predicts NaN; np.argmin would SELECT
        # the NaN lane — mask non-finite errors out of the competition
        errors = np.where(np.isfinite(errors), errors, np.inf)
        best = int(np.argmin(errors))
        if self.estimator_mode == "observer":
            self._w_obs = np.asarray(self._obs_step(
                jnp.asarray(self._w_obs),
                jnp.asarray(x_last, jnp.float32),
                jnp.asarray(u_last, jnp.float32),
                jnp.asarray(x_curr, jnp.float32),
                jnp.float32(dt)), np.float32)
        else:
            self.force_estimator.update(best, errors, alpha=0.6, beta=0.5)
        return best

    def _cycle_timestep(self, solve_time):
        """Seconds the plant advances per MPC cycle. In realtime mode the
        calibrated device time wins over the tunnel-polluted wall clock."""
        if not self.realtime:
            return self.control_dt or self.dt
        dev = self.solver.device_solve_time_us
        return dev * 1e-6 if dev else solve_time

    def _maybe_calibrate(self, x_curr, ee_g_batch, XU_batch):
        """One-time device-time calibration for realtime emulation."""
        if self.realtime and self.solver.device_solve_time_us is None:
            self.solver.calibrate_device_time(
                np.tile(x_curr, (self.batch_size, 1)), ee_g_batch, XU_batch)

    def _simulate(self, xsim, XU_best, timestep, sim_dt):
        """Advance the sim by `timestep`, stepping controls along the plan.

        Consecutive substeps that apply the SAME plan control are batched
        into one jitted dispatch (static substep count): on this image's
        tunneled TPU each dispatch costs ~25 ms, so per-substep stepping
        dominated the host loop. Pendulum-damping torques are refreshed per
        dispatch group (the on-device rollouts hold them constant per cycle,
        api/rollout.py)."""
        nsteps = max(1, int(round(timestep / sim_dt)))
        i = 0
        while i < nsteps:
            offset = int(i / (self.dt / sim_dt))
            j = i + 1
            while (j < nsteps and int(j / (self.dt / sim_dt)) == offset):
                j += 1
            u_idx = self.nx + (self.nx + self.nu) * min(offset, self.N - 1)
            u = jnp.asarray(XU_best[u_idx: u_idx + self.nu])
            # rk4_step integrates `dt` total over `substeps` sub-intervals:
            # a group of (j - i) substeps advances (j - i) * sim_dt
            xsim = self._sim_step(xsim, self._sim_control(u, xsim),
                                  jnp.float32((j - i) * sim_dt),
                                  substeps=j - i)
            i = j
        return xsim, nsteps * sim_dt

    # ---- main entry points ----

    def run_mpc_fig8(self, x_start, fig8_traj, sim_dt=0.001, sim_time=5.0):
        """Figure-8 tracking MPC (mpc_controller.py:136-277). Returns
        (None, stats) like the reference."""
        stats = {
            "timestamps": [], "solve_times": [], "goal_distances": [],
            "ee_actual": [], "joint_positions": [], "joint_velocities": [],
        }
        if self.track_full_stats:
            stats["sqp_iters"] = []

        fig8_traj = np.asarray(fig8_traj, np.float32).reshape(-1)
        B, N = self.batch_size, self.N
        total_sim_time = 0.0

        xsim = self._initial_sim_state(np.asarray(x_start, np.float32))
        x_curr = self._robot_state(xsim)

        ee_g = fig8_traj[: 6 * N]
        ee_g_batch = np.tile(ee_g, (B, 1))
        XU = np.zeros(N * (self.nx + self.nu) - self.nu, np.float32)
        for i in range(N):
            XU[i * (self.nx + self.nu): i * (self.nx + self.nu) + self.nx] = x_curr
        XU_batch = np.tile(XU, (B, 1))

        self.solver.reset_dual()
        self.update_force_batch(x_curr[: self.nq_robot])
        XU_batch, _ = self.solver.solve(np.tile(x_curr, (B, 1)), ee_g_batch, XU_batch)
        XU_best = XU_batch[0]
        self._maybe_calibrate(x_curr, ee_g_batch, XU_batch)

        solve_time = self.dt
        while total_sim_time < sim_time:
            x_last = x_curr
            u_last = XU_best[self.nx: self.nx + self.nu]

            timestep = self._cycle_timestep(solve_time)
            xsim, advanced = self._simulate(xsim, XU_best, timestep, sim_dt)
            total_sim_time += advanced
            x_curr = self._robot_state(xsim)

            eepos_offset = int(total_sim_time / self.dt)
            if eepos_offset >= len(fig8_traj) / 6 - 6 * N:
                break

            ee_g = fig8_traj[6 * eepos_offset: 6 * (eepos_offset + N)]
            ee_g_batch[:, :] = ee_g
            XU_batch[:, : self.nx] = x_curr

            self.update_force_batch(x_curr[: self.nq_robot])
            self.solver.reset_rho()
            t0 = time.perf_counter()
            XU_batch_new, gpu_us = self.solver.solve(
                np.tile(x_curr, (B, 1)), ee_g_batch, XU_batch
            )
            solve_time = time.perf_counter() - t0

            best = self.evaluate_best_trajectory(
                x_last, u_last, x_curr,
                max(sim_dt, round(timestep / sim_dt) * sim_dt),
            )
            XU_best = XU_batch_new[best]
            XU_batch[:, :] = XU_best

            ee = self.solver.ee_pos(x_curr[: self.nq_robot])
            stats["timestamps"].append(total_sim_time)
            stats["solve_times"].append(gpu_us / 1000.0)
            stats["goal_distances"].append(float(np.linalg.norm(ee - ee_g[6:9])))
            stats["ee_actual"].append(ee.copy())
            stats["joint_positions"].append(x_curr[: self.nq_robot].copy())
            stats["joint_velocities"].append(x_curr[self.nq_robot:].copy())
            if self.track_full_stats:
                stats["sqp_iters"].append(int(self.solver.stats["sqp_iters"][0]))

        for k in stats:
            if isinstance(stats[k], list) and stats[k]:
                stats[k] = np.array(stats[k])
        if len(np.atleast_1d(stats["goal_distances"])):
            print(f"Avg error: {np.mean(stats['goal_distances']):.4f}m")
            print(f"Avg solve time: {np.mean(stats['solve_times']):.3f}ms")
        return None, stats

    def run_mpc_goals(self, x_start, goals, sim_dt=0.001, goal_timeout=5.0,
                      goal_threshold=0.05, velocity_threshold=1.0):
        """Waypoint-sequence MPC with reached/timeout outcomes
        (mpc_controller.py:361-599)."""
        B, N = self.batch_size, self.N
        stats = {
            "timestamps": [], "solve_times": [], "goal_distances": [],
            "ee_actual": [], "joint_positions": [], "joint_velocities": [],
            "best_trajectory_id": [],
            "goal_outcomes": ["not_reached"] * len(goals),
            "goal_reached_times": [None] * len(goals),
            "time_to_all_reached": None,
        }
        if self.track_full_stats:
            stats["sqp_iters"] = []
            stats["pcg_iters"] = []

        total_sim_time = 0.0
        xsim = self._initial_sim_state(np.asarray(x_start, np.float32))
        x_curr = self._robot_state(xsim)

        goal_idx = 0
        goal = np.asarray(goals[goal_idx], np.float32)
        ee_g = np.tile(np.concatenate([goal, np.zeros(3, np.float32)]), N)
        ee_g_batch = np.tile(ee_g, (B, 1))

        XU = np.zeros(N * (self.nx + self.nu) - self.nu, np.float32)
        for i in range(N):
            XU[i * (self.nx + self.nu): i * (self.nx + self.nu) + self.nx] = x_curr
        XU_batch = np.tile(XU, (B, 1))
        self.solver.reset_dual()
        self.update_force_batch(x_curr[: self.nq_robot])
        XU_batch, _ = self.solver.solve(np.tile(x_curr, (B, 1)), ee_g_batch, XU_batch)
        XU_best = XU_batch[0]
        self._maybe_calibrate(x_curr, ee_g_batch, XU_batch)

        goal_start_time = total_sim_time
        solve_time = self.dt
        while total_sim_time < goal_timeout * len(goals):
            x_last = x_curr
            u_last = XU_best[self.nx: self.nx + self.nu]

            timestep = self._cycle_timestep(solve_time)
            xsim, advanced = self._simulate(xsim, XU_best, timestep, sim_dt)
            total_sim_time += advanced
            x_curr = self._robot_state(xsim)

            ee = self.solver.ee_pos(x_curr[: self.nq_robot])
            dist = float(np.linalg.norm(ee - goal))
            vel = float(np.linalg.norm(x_curr[self.nq_robot:], ord=1))
            reached = dist < goal_threshold and vel < velocity_threshold
            timeout = (total_sim_time - goal_start_time) >= goal_timeout

            if reached or timeout:
                stats["goal_outcomes"][goal_idx] = "reached" if reached else "timeout"
                if reached:
                    stats["goal_reached_times"][goal_idx] = total_sim_time
                goal_idx += 1
                if goal_idx >= len(goals):
                    break
                goal = np.asarray(goals[goal_idx], np.float32)
                ee_g = np.tile(np.concatenate([goal, np.zeros(3, np.float32)]), N)
                goal_start_time = total_sim_time
                self.solver.reset_rho()

            ee_g_batch[:, :] = ee_g
            XU_batch[:, : self.nx] = x_curr
            self.update_force_batch(x_curr[: self.nq_robot])
            self.solver.reset_rho()
            t0 = time.perf_counter()
            XU_batch_new, gpu_us = self.solver.solve(
                np.tile(x_curr, (B, 1)), ee_g_batch, XU_batch
            )
            solve_time = time.perf_counter() - t0

            best = self.evaluate_best_trajectory(
                x_last, u_last, x_curr,
                max(sim_dt, round(timestep / sim_dt) * sim_dt),
            )
            XU_best = XU_batch_new[best]
            XU_batch[:, :] = XU_best

            stats["timestamps"].append(total_sim_time)
            stats["solve_times"].append(gpu_us / 1000.0)
            stats["goal_distances"].append(dist)
            stats["ee_actual"].append(ee.copy())
            stats["joint_positions"].append(x_curr[: self.nq_robot].copy())
            stats["joint_velocities"].append(x_curr[self.nq_robot:].copy())
            stats["best_trajectory_id"].append(best)
            if self.track_full_stats:
                stats["sqp_iters"].append(int(self.solver.stats["sqp_iters"][0]))
                pcg = self.solver.stats.get("pcg_iters", np.zeros((0, 0)))
                stats["pcg_iters"].append(int(pcg[0, 0]) if pcg.size else 0)

        for k, v in stats.items():
            if isinstance(v, list) and v and k not in (
                "goal_outcomes", "goal_reached_times", "time_to_all_reached",
            ):
                try:
                    stats[k] = np.array(v)
                except (ValueError, TypeError):
                    pass
        if all(o == "reached" for o in stats["goal_outcomes"]):
            ts = [t for t in stats["goal_reached_times"] if t is not None]
            if len(ts) == len(goals):
                stats["time_to_all_reached"] = float(np.max(ts))
        reached_n = sum(1 for o in stats["goal_outcomes"] if o == "reached")
        print(f"Goals reached: {reached_n}/{len(goals)}")
        return None, stats
