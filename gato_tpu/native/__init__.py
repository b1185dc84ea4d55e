"""ctypes bindings for the native C++ rigid-body runtime (native/rbd.cpp).

The reference's host-side stack leans on native Pinocchio for simulation and
reported kinematics (common.py:49-91, interface.py:212-214); this module
provides the same role natively here, and doubles as the independent
cross-implementation oracle for the JAX dynamics core (the reference's
implicit Pinocchio-vs-GRiD cross-validation, SURVEY.md §4).

The shared library is built on demand with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..robots.urdf import ParsedRobot

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "rbd.cpp")
_LIB = os.path.join(_NATIVE_DIR, "librbd.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rbd_create.restype = ctypes.c_void_p
    lib.rbd_create.argtypes = [ctypes.c_int, dp, dp, dp, dp, ctypes.c_double]
    lib.rbd_destroy.argtypes = [ctypes.c_void_p]
    lib.rbd_rnea.argtypes = [ctypes.c_void_p, dp, dp, dp, dp, dp]
    lib.rbd_crba.argtypes = [ctypes.c_void_p, dp, dp]
    lib.rbd_fd.argtypes = [ctypes.c_void_p, dp, dp, dp, dp, dp]
    lib.rbd_fk_ee.argtypes = [ctypes.c_void_p, dp, dp]
    lib.rbd_rk4.argtypes = [ctypes.c_void_p, dp, dp, ctypes.c_double, dp, dp]
    _lib = lib
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeRobot:
    """Native rigid-body model handle."""

    def __init__(self, robot: ParsedRobot, gravity: float = 9.81):
        self._lib = get_lib()
        self.nq = robot.nq
        R = np.ascontiguousarray(robot.R_tree, np.float64)
        p = np.ascontiguousarray(robot.p_tree, np.float64)
        ax = np.ascontiguousarray(robot.axis, np.float64)
        I6 = np.ascontiguousarray(robot.inertia, np.float64)
        self._h = self._lib.rbd_create(self.nq, _ptr(R), _ptr(p), _ptr(ax),
                                       _ptr(I6), gravity)
        if not self._h:
            raise RuntimeError("rbd_create failed (nq out of range?)")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rbd_destroy(self._h)
            self._h = None

    def _vec(self, a, n):
        out = np.ascontiguousarray(np.asarray(a, np.float64).reshape(n))
        return out

    def rnea(self, q, qd, qdd, f_ext=None):
        q = self._vec(q, self.nq); qd = self._vec(qd, self.nq)
        qdd = self._vec(qdd, self.nq)
        fe = self._vec(f_ext, 6) if f_ext is not None else None
        tau = np.zeros(self.nq)
        self._lib.rbd_rnea(self._h, _ptr(q), _ptr(qd), _ptr(qdd),
                           _ptr(fe) if fe is not None else None, _ptr(tau))
        return tau

    def crba(self, q):
        q = self._vec(q, self.nq)
        M = np.zeros((self.nq, self.nq))
        self._lib.rbd_crba(self._h, _ptr(q), _ptr(M))
        return M

    def fd(self, q, qd, tau, f_ext=None):
        q = self._vec(q, self.nq); qd = self._vec(qd, self.nq)
        tau = self._vec(tau, self.nq)
        fe = self._vec(f_ext, 6) if f_ext is not None else None
        qdd = np.zeros(self.nq)
        self._lib.rbd_fd(self._h, _ptr(q), _ptr(qd), _ptr(tau),
                         _ptr(fe) if fe is not None else None, _ptr(qdd))
        return qdd

    def ee_pose(self, q):
        q = self._vec(q, self.nq)
        out = np.zeros(6)
        self._lib.rbd_fk_ee(self._h, _ptr(q), _ptr(out))
        return out

    def rk4(self, x, u, dt, f_ext_world=None):
        x = self._vec(x, 2 * self.nq)
        u = self._vec(u, self.nq)
        fe = self._vec(f_ext_world, 6) if f_ext_world is not None else None
        out = np.zeros(2 * self.nq)
        self._lib.rbd_rk4(self._h, _ptr(x), _ptr(u), dt,
                          _ptr(fe) if fe is not None else None, _ptr(out))
        return out


def export_model_bin(name_or_path: str, out_path: str) -> None:
    """Export a robot's constants for the native example binary
    (native/example.cpp)."""
    import struct

    from ..robots.model import PLANT_URDFS
    from ..robots.urdf import parse_urdf

    robot = parse_urdf(PLANT_URDFS.get(name_or_path, name_or_path))
    with open(out_path, "wb") as f:
        f.write(struct.pack("i", robot.nq))
        for arr in (robot.R_tree, robot.p_tree, robot.axis, robot.inertia):
            f.write(np.ascontiguousarray(arr, np.float64).tobytes())
