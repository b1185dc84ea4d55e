"""RobotModel: the JAX pytree equivalent of GRiD's per-robot generated model.

Reference analogue: `grid::robotModel{d_XImats, d_topology_helpers}` +
`init_robotModel` (indy7_grid.cuh:64-68, 1570-1594). Where the reference bakes
the robot into generated CUDA, we carry it as arrays in a pytree; the joint
count is static metadata so jit specializes per robot exactly like the CMake
PLANT matrix does (CMakeLists.txt:57-83).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .urdf import ParsedRobot, parse_urdf

# Registry of trace-time robot constants, keyed by RobotModel.key. The pytree
# arrays are dynamic jit arguments; codegen-style paths (dynamics/channelized)
# need the same constants as static Python floats — the registry provides
# them, playing the role of GRiD's generated per-robot headers.
_PARSED_REGISTRY: dict[str, ParsedRobot] = {}


def register_parsed(key: str, parsed: ParsedRobot) -> None:
    _PARSED_REGISTRY[key] = parsed


def get_parsed(key: str) -> ParsedRobot:
    return _PARSED_REGISTRY[key]

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")

# Built-in plants, mirroring the reference's PLANT_INDY7 / PLANT_IIWA14
# compile switch (gato/settings.h:33-41). iiwa14 uses the GRiD-codegen variant
# of the URDF, as the reference did for its generated dynamics.
PLANT_URDFS = {
    "indy7": os.path.join(_ASSET_DIR, "indy7.urdf"),
    "iiwa14": os.path.join(_ASSET_DIR, "iiwa14_grid.urdf"),
}


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RobotModel:
    """Serial-chain rigid-body model as a pytree of arrays.

    Conventions (Featherstone spatial algebra):
      - motion vectors [w; v], force vectors [n; f]
      - per-joint tree transform: child frame posed at (R_tree, p_tree) in the
        parent frame; revolute axis expressed in the child frame.
    """

    R_tree: jax.Array  # (nq, 3, 3)
    p_tree: jax.Array  # (nq, 3)
    axis: jax.Array  # (nq, 3)
    inertia: jax.Array  # (nq, 6, 6) lumped link spatial inertias
    joint_limits: jax.Array  # (nq, 2)
    velocity_limits: jax.Array  # (nq, 2)
    effort_limits: jax.Array  # (nq, 2)
    R_ee: jax.Array  # (3, 3) fixed EE offset (not applied by ee_position;
    p_ee: jax.Array  # (3,)   see urdf.parse_urdf docstring)
    gravity: jax.Array  # () scalar, magnitude of -z world gravity
    key: str = field(default="", metadata=dict(static=True))  # registry key
    # for trace-time constants (see register_parsed/get_parsed)

    @property
    def nq(self) -> int:
        return self.R_tree.shape[0]

    @property
    def nv(self) -> int:
        return self.R_tree.shape[0]

    @property
    def nx(self) -> int:
        return 2 * self.nq

    @property
    def nu(self) -> int:
        return self.nq


def from_parsed(robot: ParsedRobot, dtype=jnp.float32, gravity: float = 9.81,
                key: str | None = None) -> RobotModel:
    cast = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
    key = key if key is not None else f"{robot.name}:{id(robot)}"
    register_parsed(key, robot)
    return RobotModel(
        R_tree=cast(robot.R_tree),
        p_tree=cast(robot.p_tree),
        axis=cast(robot.axis),
        inertia=cast(robot.inertia),
        joint_limits=cast(robot.joint_limits),
        velocity_limits=cast(robot.velocity_limits),
        effort_limits=cast(robot.effort_limits),
        R_ee=cast(robot.R_ee),
        p_ee=cast(robot.p_ee),
        gravity=jnp.asarray(gravity, dtype=dtype),
        key=key,
    )


def load_robot(name_or_path: str, dtype=jnp.float32) -> RobotModel:
    """Load a built-in plant by name ('indy7', 'iiwa14') or any URDF path."""
    path = PLANT_URDFS.get(name_or_path, name_or_path)
    key = f"{name_or_path}:{jnp.dtype(dtype).name}"
    if key in _PARSED_REGISTRY:
        return from_parsed(_PARSED_REGISTRY[key], dtype=dtype, key=key)
    return from_parsed(parse_urdf(path), dtype=dtype, key=key)
