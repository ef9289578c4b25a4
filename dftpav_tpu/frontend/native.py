"""ctypes bindings for the native front end (native/dftpav_native.cpp).

The library is built on demand with native/build.sh (g++ -O3 -shared). All
heavy lifting (A* search, RS curves, corridor growth) happens in C++; this
layer marshals numpy arrays.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdftpav_native.so"))

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["/bin/sh", os.path.join(_NATIVE_DIR, "build.sh")],
                       check=True, capture_output=True)
    lib = ct.CDLL(_LIB_PATH)
    D = ct.c_double
    P = ct.c_void_p
    lib.df_map_create.restype = P
    lib.df_map_create.argtypes = [ct.c_int, ct.c_int, D, D, D,
                                  ct.POINTER(ct.c_uint8)]
    lib.df_map_destroy.argtypes = [P]
    lib.df_map_occupied.restype = ct.c_int
    lib.df_map_occupied.argtypes = [P, D, D]
    lib.df_map_obb_collides.restype = ct.c_int
    lib.df_map_obb_collides.argtypes = [P, D, D, D, D, D, D]
    lib.df_map_line_collides.restype = ct.c_int
    lib.df_map_line_collides.argtypes = [P, D, D, D, D, D]
    dp = ct.POINTER(ct.c_double)
    lib.df_rs_distance.restype = D
    lib.df_rs_distance.argtypes = [D, dp, dp]
    lib.df_rs_sample.argtypes = [D, dp, dp, ct.c_int, dp]
    lib.df_plan.restype = P
    lib.df_plan.argtypes = [P, dp, dp, dp, dp]
    lib.df_plan_status.restype = ct.c_int
    lib.df_plan_status.argtypes = [P]
    lib.df_plan_total_time.restype = D
    lib.df_plan_total_time.argtypes = [P]
    lib.df_plan_nsegs.restype = ct.c_int
    lib.df_plan_nsegs.argtypes = [P]
    lib.df_plan_seg_npts.restype = ct.c_int
    lib.df_plan_seg_npts.argtypes = [P, ct.c_int]
    lib.df_plan_seg_singul.restype = ct.c_int
    lib.df_plan_seg_singul.argtypes = [P, ct.c_int]
    lib.df_plan_seg_duration.restype = D
    lib.df_plan_seg_duration.argtypes = [P, ct.c_int]
    lib.df_plan_seg_data.argtypes = [P, ct.c_int, dp, dp, dp, dp]
    lib.df_plan_nsamples.restype = ct.c_int
    lib.df_plan_nsamples.argtypes = [P]
    lib.df_plan_samples.argtypes = [P, dp]
    lib.df_plan_destroy.argtypes = [P]
    lib.df_corridors.argtypes = [P, dp, ct.c_int, D, D, D, D, dp]
    _lib = lib
    return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ct.POINTER(ct.c_double))


class GridMap2D:
    """Occupancy grid with the reference's collision-check semantics
    (outside the map counts as occupied; OBB checks sample the perimeter)."""

    def __init__(self, occ: np.ndarray, origin=(0.0, 0.0), resolution=0.1):
        lib = _load()
        occ = np.ascontiguousarray(occ, dtype=np.uint8)
        self.occ = occ
        self.origin = origin
        self.resolution = float(resolution)
        self.ny, self.nx = occ.shape
        self._h = lib.df_map_create(
            self.nx, self.ny, float(origin[0]), float(origin[1]),
            self.resolution, occ.ctypes.data_as(ct.POINTER(ct.c_uint8)))

    def __del__(self):
        try:
            _load().df_map_destroy(self._h)
        except Exception:
            pass

    def occupied(self, x, y) -> bool:
        return bool(_load().df_map_occupied(self._h, float(x), float(y)))

    def obb_collides(self, x, y, yaw, length, width, d_cr) -> bool:
        return bool(_load().df_map_obb_collides(
            self._h, float(x), float(y), float(yaw), float(length),
            float(width), float(d_cr)))

    def line_collides(self, p0, p1, spacing) -> bool:
        return bool(_load().df_map_line_collides(
            self._h, float(p0[0]), float(p0[1]), float(p1[0]), float(p1[1]),
            float(spacing)))

    def corridors(self, states: np.ndarray, veh_length, veh_width, d_cr,
                  limit=10.0) -> np.ndarray:
        """Grown rectangles per state (x, y, yaw): returns [n, 4, 4] rows of
        (nx, ny, px, py) outward half-planes (left, front, right, back)."""
        states = np.ascontiguousarray(states, dtype=np.float64)
        n = states.shape[0]
        out = np.empty((n, 4, 4), dtype=np.float64)
        _load().df_corridors(self._h, _dptr(states), n, float(veh_length),
                             float(veh_width), float(d_cr), float(limit),
                             _dptr(out))
        return out


def reeds_shepp_distance(radius, q0, q1) -> float:
    q0 = np.ascontiguousarray(q0, dtype=np.float64)
    q1 = np.ascontiguousarray(q1, dtype=np.float64)
    return float(_load().df_rs_distance(float(radius), _dptr(q0), _dptr(q1)))


def reeds_shepp_sample(radius, q0, q1, n) -> np.ndarray:
    q0 = np.ascontiguousarray(q0, dtype=np.float64)
    q1 = np.ascontiguousarray(q1, dtype=np.float64)
    out = np.empty((n, 3), dtype=np.float64)
    _load().df_rs_sample(float(radius), _dptr(q0), _dptr(q1), n, _dptr(out))
    return out


@dataclass
class FlatSegment:
    """One single-gear segment of the front-end trajectory
    (plan_utils::FlatTrajData, traj_container.hpp:18-34)."""

    singul: int
    pts: np.ndarray       # [M, 3] (x, y, dt)
    thetas: np.ndarray    # [M]
    start_state: np.ndarray  # [2, 3] flat PVA
    final_state: np.ndarray  # [2, 3]
    duration: float


class KinoAstarPlanner:
    """Kinodynamic A* front end (path_searching::KinoAstar equivalent)."""

    def __init__(self, grid: GridMap2D, cfg=None, vehicle=None):
        from dftpav_tpu.config import FrontendConfig, VehicleParam
        self.grid = grid
        self.cfg = cfg or FrontendConfig()
        self.vehicle = vehicle or VehicleParam()

    def _params(self) -> np.ndarray:
        c, v = self.cfg, self.vehicle
        return np.array([
            v.wheel_base,
            v.length + 2 * c.collision_margin,
            v.width + 2 * c.collision_margin,
            v.d_cr,
            c.max_frontend_cur,
            c.step_arc,
            c.map_resolution,
            c.yaw_resolution,
            c.lambda_heu,
            c.max_search_time,
            c.check_num,
            c.allocate_num,
            c.oneshot_range,
            c.checkl,
            c.traj_forward_penalty,
            c.traj_back_penalty,
            c.traj_gear_switch_penalty,
            c.traj_steer_penalty,
            c.traj_steer_change_penalty,
            c.horizon,
            c.max_frontend_forward_vel,
            c.max_frontend_forward_acc,
            c.max_frontend_backward_vel,
            c.max_frontend_backward_acc,
            c.non_siguav,
            c.sample_time,
            1.0 if c.use3d else 0.0,
        ], dtype=np.float64)

    def plan(self, start, end, start_ctrl=(0.0, 0.0)):
        """start/end: (x, y, yaw, v_signed). Returns (segments, sample_traj)
        or (None, None) when no path is found."""
        lib = _load()
        s = np.ascontiguousarray(start, dtype=np.float64)
        e = np.ascontiguousarray(end, dtype=np.float64)
        sc = np.ascontiguousarray(start_ctrl, dtype=np.float64)
        p = self._params()
        h = lib.df_plan(self.grid._h, _dptr(p), _dptr(s), _dptr(sc), _dptr(e))
        try:
            if lib.df_plan_status(h) != 1:
                return None, None
            segs = []
            for i in range(lib.df_plan_nsegs(h)):
                m = lib.df_plan_seg_npts(h, i)
                pts = np.empty((m, 3), np.float64)
                thetas = np.empty((m,), np.float64)
                ss = np.empty((6,), np.float64)
                es = np.empty((6,), np.float64)
                lib.df_plan_seg_data(h, i, _dptr(pts), _dptr(thetas),
                                     _dptr(ss), _dptr(es))
                segs.append(FlatSegment(
                    singul=lib.df_plan_seg_singul(h, i), pts=pts,
                    thetas=thetas,
                    start_state=ss.reshape(3, 2).T.copy(),
                    final_state=es.reshape(3, 2).T.copy(),
                    duration=lib.df_plan_seg_duration(h, i)))
            ns = lib.df_plan_nsamples(h)
            samples = np.empty((ns, 3), np.float64)
            lib.df_plan_samples(h, _dptr(samples))
            return segs, samples
        finally:
            lib.df_plan_destroy(h)
