"""gato_tpu: TPU-native batched SQP trajectory optimization (BSQP) for MPC.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of A2R-Lab/GATO
(GPU-Accelerated and Batched Trajectory Optimization, arXiv 2510.07625).
"""

from .robots.model import RobotModel, load_robot  # noqa: F401

__version__ = "0.1.0"
