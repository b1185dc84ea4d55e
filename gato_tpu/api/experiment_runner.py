"""Batch-size sweep experiment harness.

Re-design of python/bsqp/experiment_runner.py: runs the fig-8 MPC task over a
list of batch sizes, aggregates tracking error / solve-time stats, and
pickles results for plotting.
"""

from __future__ import annotations

import pickle
import time

import numpy as np

from .common import figure8
from .config import (DEFAULT_SOLVER_PARAMS, EXPERIMENT_BATCH_SIZES,
                     FIG8_DEFAULT_PARAMS, INDY7_START_CONFIGS)
from .mpc import MPC_GATO


class ExperimentRunner:
    def __init__(self, plant_type="indy7", N=32, dt=0.01,
                 batch_sizes=None, solver_params=None,
                 constant_f_ext=None, sim_time=5.0, sim_dt=0.001,
                 fig8_params=None):
        self.plant_type = plant_type
        self.N = N
        self.dt = dt
        self.batch_sizes = batch_sizes or list(EXPERIMENT_BATCH_SIZES)
        self.solver_params = dict(DEFAULT_SOLVER_PARAMS)
        if solver_params:
            self.solver_params.update(solver_params)
        self.constant_f_ext = constant_f_ext
        self.sim_time = sim_time
        self.sim_dt = sim_dt
        self.fig8_params = dict(FIG8_DEFAULT_PARAMS)
        if fig8_params:
            self.fig8_params.update(fig8_params)
        self.results = {}

    def _start_state(self):
        if self.plant_type == "indy7":
            q0 = INDY7_START_CONFIGS["ready"]
        else:
            q0 = np.zeros(7)
        return np.concatenate([q0, np.zeros_like(q0)]).astype(np.float32)

    def run_batch_experiments(self, verbose=True):
        traj = figure8(self.dt, **{k: v for k, v in self.fig8_params.items()
                                   if k != "cycles"},
                       cycles=self.fig8_params.get("cycles", 5))
        x0 = self._start_state()
        for B in self.batch_sizes:
            if verbose:
                print(f"== batch size {B} ==")
            mpc = MPC_GATO(
                plant_type=self.plant_type, N=self.N, dt=self.dt,
                batch_size=B, constant_f_ext=self.constant_f_ext,
                solver_params=self.solver_params,
            )
            t0 = time.perf_counter()
            _, stats = mpc.run_mpc_fig8(x0, traj, sim_dt=self.sim_dt,
                                        sim_time=self.sim_time)
            wall = time.perf_counter() - t0
            self.results[B] = {
                "stats": stats,
                "wall_time_s": wall,
                "avg_error_m": float(np.mean(stats["goal_distances"]))
                if np.size(stats["goal_distances"]) else float("nan"),
                "avg_solve_ms": float(np.mean(stats["solve_times"]))
                if np.size(stats["solve_times"]) else float("nan"),
            }
        return self.results

    def summary(self):
        rows = []
        base = None
        for B in self.batch_sizes:
            if B not in self.results:
                continue
            r = self.results[B]
            if base is None:
                base = r["avg_solve_ms"]
            rows.append({
                "batch_size": B,
                "avg_error_m": r["avg_error_m"],
                "avg_solve_ms": r["avg_solve_ms"],
                "throughput_solves_per_s": B / (r["avg_solve_ms"] / 1000.0)
                if r["avg_solve_ms"] else float("nan"),
                "speedup_vs_b1": base / r["avg_solve_ms"] * B
                if r["avg_solve_ms"] else float("nan"),
            })
        return rows

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump({"results": self.results,
                         "batch_sizes": self.batch_sizes,
                         "N": self.N, "dt": self.dt,
                         "plant_type": self.plant_type}, f)

    @staticmethod
    def load(path):
        with open(path, "rb") as f:
            return pickle.load(f)


def run_standard_benchmark(plant_type="indy7", N=32, batch_sizes=None,
                           sim_time=5.0, save_path=None):
    """experiment_runner.py:175-208 analogue."""
    runner = ExperimentRunner(plant_type=plant_type, N=N,
                              batch_sizes=batch_sizes, sim_time=sim_time)
    runner.run_batch_experiments()
    if save_path:
        runner.save(save_path)
    return runner
