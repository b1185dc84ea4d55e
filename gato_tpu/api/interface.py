"""BSQP solver facade: the user-facing API, surface-compatible with the
reference's Python interface (python/bsqp/interface.py).

Where the reference dynamically imports a per-(N, plant) compiled module and
looks up a per-batch-size class (interface.py:44-59), here the same
specialization happens through jit: (plant, N, B, max iters) select a compiled
XLA program, cached per shape. Stats keys match bindings.cu:96-147 /
interface.py:97-208.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.algorithms import ee_position as _ee_position
from ..ops.cost import CostParams
from ..robots.model import RobotModel, load_robot
from ..solver.bsqp import solve_batched_jit, sim_forward_batched
from ..solver.types import BSQPSettings, HyperParams


class BSQP:
    """Batched SQP solver for EE-tracking MPC.

    Matches the reference constructor signature (interface.py:7-32); accepts
    either a URDF path or a built-in plant name for `model_path`.
    """

    def __init__(
        self,
        model_path=None,
        batch_size=1,
        N=32,
        dt=0.01,
        max_sqp_iters=10,
        kkt_tol=1e-4,
        max_pcg_iters=100,
        pcg_tol=1e-4,
        solve_ratio=1.0,
        mu=1.0,
        q_cost=2.0,
        qd_cost=1e-4,
        u_cost=1e-6,
        N_cost=50.0,
        q_lim_cost=1e-3,
        vel_lim_cost=0.0,
        ctrl_lim_cost=0.0,
        rho=0.0,
        rho_batch=None,
        mu_batch=None,
        pcg_tol_batch=None,
        adapt_rho=True,
        plant_type="indy7",
        f_ext_in_ee_frame=True,
        precision="float",
    ):
        # precision: "float" (f32, the production TPU path) or "double" —
        # the CPU-only analogue of the reference's BSQP_{B}_double class
        # registrations (python/bindings.cu:253-264). TPUs have no f64
        # arithmetic, so "double" requires the CPU backend (it exists for
        # oracle/debug runs, same as the reference's double instantiations).
        # The caller must enable x64 themselves: jax_enable_x64 is a
        # PROCESS-GLOBAL flag, and flipping it here would silently change
        # dtype/weak-type semantics (and force recompiles) for every other
        # JAX computation in the process, including f32 BSQP instances.
        if precision not in ("float", "double"):
            raise ValueError(f"precision must be 'float'|'double', got {precision!r}")
        if precision == "double":
            if jax.default_backend() == "tpu":
                raise RuntimeError(
                    "precision='double' needs the CPU backend (TPU has no "
                    "f64); jax.config.update('jax_platforms', 'cpu') and "
                    "enable x64 first")
            if not jax.config.jax_enable_x64:
                raise RuntimeError(
                    "precision='double' requires x64 to be enabled by the "
                    "caller — jax.config.update('jax_enable_x64', True) "
                    "(process-global; BSQP will not flip it for you)")
        self.precision = precision
        self._dtype = jnp.float64 if precision == "double" else jnp.float32
        self._np_dtype = np.float64 if precision == "double" else np.float32
        if plant_type is None:
            plant_type = "iiwa14" if (model_path and "iiwa" in str(model_path).lower()) else "indy7"
        self.plant_type = plant_type
        source = model_path if model_path else plant_type
        # built-in names win over paths for the two bundled plants
        if plant_type in ("indy7", "iiwa14") and model_path is None:
            source = plant_type
        try:
            self.model: RobotModel = load_robot(source, dtype=self._dtype)
        except FileNotFoundError:
            self.model = load_robot(plant_type, dtype=self._dtype)

        self.batch_size = int(batch_size)
        self.N = int(N)
        self.dt = float(dt)
        self.nq = self.model.nq
        self.nv = self.model.nv
        self.nx = self.model.nx
        self.nu = self.model.nu

        self.settings = BSQPSettings(
            N=self.N,
            max_sqp_iters=int(max_sqp_iters),
            max_pcg_iters=int(max_pcg_iters),
            solve_ratio=float(solve_ratio),
            adapt_rho=bool(adapt_rho),
            kkt_tol=float(kkt_tol),
        )
        self.cost_params = CostParams.create(
            q_cost=q_cost, qd_cost=qd_cost, u_cost=u_cost, N_cost=N_cost,
            q_lim_cost=q_lim_cost, vel_lim_cost=vel_lim_cost,
            ctrl_lim_cost=ctrl_lim_cost, dtype=self._dtype,
        )
        B = self.batch_size
        self._hp_init = HyperParams.create(B, rho=rho, mu=mu, pcg_tol=pcg_tol,
                                           dtype=self._dtype)
        if rho_batch is not None:
            arr = jnp.asarray(np.asarray(rho_batch, self._np_dtype).reshape(B))
            self._hp_init = HyperParams(arr, self._hp_init.drho, self._hp_init.mu,
                                        self._hp_init.pcg_tol)
        if mu_batch is not None:
            arr = jnp.asarray(np.asarray(mu_batch, self._np_dtype).reshape(B))
            self._hp_init = HyperParams(self._hp_init.rho, self._hp_init.drho,
                                        arr, self._hp_init.pcg_tol)
        if pcg_tol_batch is not None:
            arr = jnp.asarray(np.asarray(pcg_tol_batch, self._np_dtype).reshape(B))
            self._hp_init = HyperParams(self._hp_init.rho, self._hp_init.drho,
                                        self._hp_init.mu, arr)
        self.hp = self._hp_init

        self.lam = jnp.zeros((B, self.N, self.nx), self._dtype)
        self.f_ext_B = jnp.zeros((B, 6), self._dtype)
        self._f_ext_in_ee_frame = f_ext_in_ee_frame

        self.XU_B = np.zeros((B, self.N * (self.nx + self.nu) - self.nu),
                             dtype=self._np_dtype)
        self._stats = {}
        self._stats_raw = None
        # sustained on-device per-solve time (us), set by
        # calibrate_device_time(); wall-clock sqp_time_us on this runtime
        # includes ~25 ms of tunnel latency and cannot time sub-ms solves
        self.device_solve_time_us = None

    # ---- trajectory layout helpers (reference flat XU layout,
    # constants.h:22: [x_0, u_0, x_1, u_1, ..., x_{N-1}]) ----

    def _unflatten(self, XU_B):
        B, N, nx, nu = self.batch_size, self.N, self.nx, self.nu
        XU = XU_B.reshape(B, -1)
        stride = nx + nu
        pad = np.zeros((B, nu), dtype=XU.dtype)
        full = np.concatenate([XU, pad], axis=1).reshape(B, N, stride)
        X = full[:, :, :nx]
        U = full[:, :-1, nx:]
        return jnp.asarray(X, self._dtype), jnp.asarray(U, self._dtype)

    def _flatten(self, X, U):
        # concatenate ON DEVICE and pull once: each separate device->host
        # read on this image's tunneled runtime costs ~25 ms, and the host
        # MPC loop calls this every cycle
        B, N, nx, nu = self.batch_size, self.N, self.nx, self.nu
        X = jnp.asarray(X)
        U = jnp.asarray(U)
        full = jnp.concatenate(
            [X, jnp.concatenate([U, jnp.zeros((B, 1, nu), X.dtype)], axis=1)],
            axis=2,
        ).reshape(B, N * (nx + nu))
        # np.array (owned copy), not np.asarray: the latter is a READ-ONLY
        # zero-copy view of the device buffer on CPU backends, and callers
        # (the host MPC loop) mutate the returned warm start in place
        return np.array(full[:, : N * (nx + nu) - nu], self._np_dtype)

    # ---- main entry points ----

    def solve(self, xcur_B, eepos_goals_B, XU_B=None):
        """One batched BSQP solve (interface.py:122-210). Returns
        (XU_B, solve_time_us) and fills `self.stats`."""
        B = self.batch_size
        xcur_B = np.asarray(xcur_B, self._np_dtype).reshape(B, self.nx)
        ref = np.asarray(eepos_goals_B, self._np_dtype).reshape(B, self.N, 6)
        if XU_B is None:
            XU_B = self.XU_B
        XU_B = np.asarray(XU_B, self._np_dtype).reshape(B, -1).copy()
        XU_B[:, : self.nx] = xcur_B  # pin warm start to measured state

        X, U = self._unflatten(XU_B)
        t0 = time.perf_counter()
        Xo, Uo, lam, hp, st = solve_batched_jit(
            self.model, self.settings, self.cost_params, self.hp,
            X, U, self.lam, jnp.asarray(xcur_B), jnp.asarray(ref),
            self.f_ext_B, self._dtype(self.dt),
        )
        jax.block_until_ready(Xo)
        solve_time_us = int((time.perf_counter() - t0) * 1e6)

        self.lam = lam
        self.hp = hp
        self.XU_B = self._flatten(Xo, Uo)

        # stats materialization is LAZY: pulling the ~8 per-iteration stat
        # arrays costs a ~25 ms tunnel read EACH on this runtime, and the
        # host MPC loop only reads stats when track_full_stats is set
        self._stats_raw = (st, solve_time_us)
        return self.XU_B, solve_time_us

    @property
    def stats(self):
        if self._stats_raw is not None:
            st, solve_time_us = self._stats_raw
            self._stats_raw = None
            self._stats = self._materialize_stats(st, solve_time_us)
        return self._stats

    @stats.setter
    def stats(self, value):
        self._stats = value
        self._stats_raw = None

    def _materialize_stats(self, st, solve_time_us):
        n_run = int(st.num_iters_run)
        pcg_iters = np.asarray(st.pcg_iters)[:n_run]
        min_merit = np.asarray(st.ls_min_merit)[:n_run]
        step_size = np.asarray(st.ls_step_size)[:n_run]
        initial_merit = np.asarray(st.initial_merit)
        stats = {
            "sqp_time_us": solve_time_us,
            "sqp_time_us_device": self.device_solve_time_us,
            "sqp_iters": np.asarray(st.sqp_iters, np.int32),
            "kkt_converged": np.asarray(st.kkt_converged, np.int32),
            "final_merit": np.asarray(st.final_merit, np.float32),
            "initial_merit": initial_merit.astype(np.float32),
            "best_initial_merit": float(initial_merit.min()) if initial_merit.size else np.array([]),
            "ls_num_iters": n_run,
            "pcg_iters": pcg_iters.astype(np.int32),
            # zeros by contract: the reference also hardcodes PCG stage time
            # to 0 (its cudaEvent pair is commented out, bsqp.cuh:125-138);
            # per-stage device timing lives in tools/profile_stages.py, and
            # whole-solve device time in stats['sqp_time_us_device']
            "pcg_times_us": np.zeros(n_run, np.float32),
            "min_merit": min_merit.astype(np.float32),
            "step_size": step_size.astype(np.float32),
        }
        best_per_iter = min_merit.min(axis=1) if min_merit.size else np.array([], np.float32)
        stats["best_merit_per_iter"] = best_per_iter
        stats["best_merit_iter1"] = float(best_per_iter[0]) if best_per_iter.size else float("nan")
        denom = stats["best_initial_merit"]
        if np.size(denom) and denom:
            stats["best_merit_per_iter_normalized"] = best_per_iter / float(denom)
        else:
            stats["best_merit_per_iter_normalized"] = best_per_iter
        return stats

    def calibrate_device_time(self, xcur_B, eepos_goals_B, XU_B=None):
        """Measure the sustained per-solve DEVICE time for this
        (plant, N, B, settings) by chaining k warm-started re-solves inside
        one jitted fori_loop and taking the slope between two chain lengths
        (utils/timing.py:time_loop_fn — the only trustworthy method on the
        tunneled runtime, where block_until_ready does not wait and every
        dispatch carries 50-400us of jitter). The result is cached, reported
        as stats['sqp_time_us_device'] by subsequent solve() calls, and used
        by the MPC realtime emulation instead of the tunnel-polluted wall
        clock. Costs a few hundred chained solves once."""
        from ..solver.bsqp import solve_batched
        from ..utils.timing import time_loop_fn

        B = self.batch_size
        xcur_B = np.asarray(xcur_B, self._np_dtype).reshape(B, self.nx)
        ref = np.asarray(eepos_goals_B, self._np_dtype).reshape(B, self.N, 6)
        if XU_B is None:
            XU_B = self.XU_B
        XU_B = np.asarray(XU_B, self._np_dtype).reshape(B, -1).copy()
        XU_B[:, : self.nx] = xcur_B
        X, U = self._unflatten(XU_B)
        lam = self.lam
        model, settings, cpar, hp = (self.model, self.settings,
                                     self.cost_params, self.hp)
        x_s = jnp.asarray(xcur_B)
        refj = jnp.asarray(ref)
        fe = self.f_ext_B
        dtj = self._dtype(self.dt)

        def cycle(c):
            Xc, Uc, lamc = c
            Xo, Uo, lamo, _, _ = solve_batched(
                model, settings, cpar, hp, Xc, Uc, lamc, x_s, refj, fe, dtj)
            return (Xo.at[:, 0, :].set(x_s), Uo, lamo)

        @jax.jit
        def run_k(Xc, Uc, lamc, k):
            return jax.lax.fori_loop(0, k, lambda _, c: cycle(c),
                                     (Xc, Uc, lamc))[0]

        t = time_loop_fn(lambda k: run_k(X, U, lam, jnp.int32(k)))
        self.device_solve_time_us = float(t * 1e6)
        return self.device_solve_time_us

    def sim_forward(self, xk, uk, sim_dt):
        """Batched one-step rollout of (xk, uk) under each lane's f_ext
        hypothesis (interface.py:221-224)."""
        xk = jnp.asarray(np.asarray(xk, self._np_dtype).reshape(self.nx))
        uk = jnp.asarray(np.asarray(uk, self._np_dtype).reshape(self.nu))
        out = sim_forward_batched(self.model, xk, uk, self.f_ext_B,
                                  self._dtype(sim_dt))
        return np.asarray(out)

    def ee_pos(self, q):
        """EE position via the framework's own FK (the reference used
        Pinocchio here, interface.py:212-214). Jitted per instance: eager FK
        costs ~100 dispatches per call on the tunneled TPU runtime."""
        if not hasattr(self, "_ee_pos_jit"):
            self._ee_pos_jit = jax.jit(
                lambda q: _ee_position(self.model, q)[:3])
        q = jnp.asarray(np.asarray(q, self._np_dtype).reshape(self.nq))
        return np.asarray(self._ee_pos_jit(q))

    # ---- state management (interface.py:216-234, bsqp.cuh:63-89) ----

    def set_rho_penalty_batch(self, rho_batch, set_as_reset_default=True):
        arr = jnp.asarray(np.asarray(rho_batch, self._np_dtype).reshape(self.batch_size))
        self.hp = HyperParams(arr, self.hp.drho, self.hp.mu, self.hp.pcg_tol)
        if set_as_reset_default:
            self._hp_init = HyperParams(arr, self._hp_init.drho,
                                        self._hp_init.mu, self._hp_init.pcg_tol)

    def set_drho_batch(self, drho_batch, set_as_reset_default=True):
        arr = jnp.asarray(np.asarray(drho_batch, self._np_dtype).reshape(self.batch_size))
        self.hp = HyperParams(self.hp.rho, arr, self.hp.mu, self.hp.pcg_tol)
        if set_as_reset_default:
            self._hp_init = HyperParams(self._hp_init.rho, arr,
                                        self._hp_init.mu, self._hp_init.pcg_tol)

    def set_mu_batch(self, mu_batch):
        arr = jnp.asarray(np.asarray(mu_batch, self._np_dtype).reshape(self.batch_size))
        self.hp = HyperParams(self.hp.rho, self.hp.drho, arr, self.hp.pcg_tol)

    def set_pcg_tol_batch(self, pcg_tol_batch):
        arr = jnp.asarray(np.asarray(pcg_tol_batch, self._np_dtype).reshape(self.batch_size))
        self.hp = HyperParams(self.hp.rho, self.hp.drho, self.hp.mu, arr)

    def set_rho_adaptation(self, enabled: bool):
        """Toggle line-search rho adaptation (recompiles on first use with a
        new setting, mirroring set_rho_adaptation, bsqp.cuh:89)."""
        import dataclasses
        self.settings = dataclasses.replace(self.settings,
                                            adapt_rho=bool(enabled))

    def set_f_ext_B(self, f_ext_B):
        self.f_ext_B = jnp.asarray(
            np.asarray(f_ext_B, self._np_dtype).reshape(self.batch_size, 6)
        )

    def reset_rho(self):
        self.hp = HyperParams(self._hp_init.rho, self._hp_init.drho,
                              self.hp.mu, self.hp.pcg_tol)

    def reset_dual(self):
        self.lam = jnp.zeros_like(self.lam)

    def reset(self):
        self.reset_dual()
        self.set_f_ext_B(np.zeros((self.batch_size, 6)))
        self.XU_B = np.zeros_like(self.XU_B)

    def get_stats(self):
        return self.stats
