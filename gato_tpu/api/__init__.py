from .interface import BSQP  # noqa: F401
from .mpc import MPC_GATO, add_pendulum  # noqa: F401
from .common import figure8, rk4_step, initialize_warm_start  # noqa: F401
from .force_estimator import ForceEstimator  # noqa: F401
from .experiment_runner import ExperimentRunner, run_standard_benchmark  # noqa: F401
from .rollout import closed_loop_rollout  # noqa: F401
from . import config  # noqa: F401
