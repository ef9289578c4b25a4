"""Trajectory wire format: the PolyTraj.msg counterpart.

Reference: src/Plan/traj_planner/msg/PolyTraj.msg:1-9 serializes a
piecewise-polynomial trajectory as (order, duration[], coef_x[], coef_y[],
start_time, singuls). Here: a JSON-able dict / .npz with the framework's
normalized-coefficient convention (minco.generate output), round-tripping
multi-gear SingulTrajData-style containers.
"""

from __future__ import annotations

import json

import numpy as np


def trajectory_to_dict(coeffs, dT, singul, start_time: float = 0.0) -> dict:
    """coeffs [S, N, 6, 2] normalized, dT [S], singul [S] -> wire dict."""
    coeffs = np.asarray(coeffs, dtype=np.float64)
    S, N = coeffs.shape[0], coeffs.shape[1]
    return dict(
        format="dftpav_tpu/poly_traj@1",
        order=5,
        n_segments=int(S),
        n_pieces=int(N),
        start_time=float(start_time),
        singuls=[int(s) for s in np.asarray(singul).reshape(-1)],
        piece_duration=[float(d) for d in np.asarray(dT).reshape(-1)],
        coef_x=coeffs[..., 0].reshape(-1).tolist(),
        coef_y=coeffs[..., 1].reshape(-1).tolist(),
    )


def trajectory_from_dict(d: dict):
    """Inverse of trajectory_to_dict -> (coeffs [S,N,6,2], dT [S],
    singul [S], start_time)."""
    assert d.get("format", "").startswith("dftpav_tpu/poly_traj"), d.get(
        "format")
    S, N = d["n_segments"], d["n_pieces"]
    cx = np.asarray(d["coef_x"], dtype=np.float64).reshape(S, N, 6)
    cy = np.asarray(d["coef_y"], dtype=np.float64).reshape(S, N, 6)
    coeffs = np.stack([cx, cy], axis=-1)
    dT = np.asarray(d["piece_duration"], dtype=np.float64)
    singul = np.asarray(d["singuls"], dtype=np.int32)
    return coeffs, dT, singul, float(d["start_time"])


def save_trajectory(path: str, coeffs, dT, singul, start_time: float = 0.0):
    with open(path, "w") as f:
        json.dump(trajectory_to_dict(coeffs, dT, singul, start_time), f)


def load_trajectory(path: str):
    with open(path) as f:
        return trajectory_from_dict(json.load(f))
