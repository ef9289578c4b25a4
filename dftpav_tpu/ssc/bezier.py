"""Quintic Bezier spline utilities for the SSC planner.

Reference: common::BezierUtils / BezierSpline
(src/Sim/core/common/inc/common/spline/bezier.h). The spline stores
*normalized* control points x: the physical position on segment n with
duration s_n is  p(t) = s_n * sum_j x_{n,j} B^5_j((t - t_n)/s_n)  — the same
scaling convention as the reference QP (spline_generator.cc:424, :673).
"""

from __future__ import annotations

from math import comb
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

N_DEG = 5
N_ORD = N_DEG + 1

# jerk Hessian for quintic Bezier (bezier.h:130-151); multiplied by
# duration^(3 - 2*3) in the objective
JERK_HESSIAN = np.array([
    [720.0, -1800.0, 1200.0, 0.0, 0.0, -120.0],
    [-1800.0, 4800.0, -3600.0, 0.0, 600.0, 0.0],
    [1200.0, -3600.0, 3600.0, -1200.0, 0.0, 0.0],
    [0.0, 0.0, -1200.0, 3600.0, -3600.0, 1200.0],
    [0.0, 600.0, 0.0, -3600.0, 4800.0, -1800.0],
    [-120.0, 0.0, 0.0, 1200.0, -1800.0, 720.0],
])


class BezierSpline(NamedTuple):
    """Piecewise quintic Bezier in the (s, d) Frenet plane.

    ctrl: [..., 2, M, 6] normalized control points (dim, segment, order);
    t_lb/t_ub: [..., M] segment time bounds.
    """

    ctrl: jnp.ndarray
    t_lb: jnp.ndarray
    t_ub: jnp.ndarray


def bernstein_row(tau, order: int = 0):
    """[..., 6] Bernstein basis (or derivative w.r.t. tau) rows at tau."""
    out = []
    for j in range(N_ORD):
        if order == 0:
            out.append(comb(N_DEG, j) * tau ** j * (1 - tau) ** (N_DEG - j))
        else:
            raise NotImplementedError
    return jnp.stack(out, axis=-1)


def _diff_ctrl(ctrl):
    """Derivative control points: quintic -> quartic, scaled by N_DEG."""
    return N_DEG * (ctrl[..., 1:] - ctrl[..., :-1])


def bezier_eval(spline: BezierSpline, t):
    """Evaluate (pos, vel, acc) [..., 2] of one spline at times t [...].

    Clamps t to the spline domain. Normalized control points: position
    carries a factor s, velocity s^0, acceleration s^-1 (the reference's
    scale = duration^(1 - deriv) convention). For a batch of splines, vmap.
    """
    ctrl, t_lb, t_ub = spline.ctrl, spline.t_lb, spline.t_ub
    t = jnp.clip(t, t_lb[0], t_ub[-1] - 1e-9)
    # segment index: last n with t_lb[n] <= t
    n = jnp.maximum(jnp.sum(t[..., None] >= t_lb, axis=-1) - 1, 0)  # [...]
    s = t_ub[n] - t_lb[n]
    tau = (t - t_lb[n]) / s

    c0 = jnp.moveaxis(ctrl[:, n, :], 0, -2)                 # [..., 2, 6]
    d1 = _diff_ctrl(ctrl)
    d2 = _diff_ctrl(d1)
    c1 = jnp.moveaxis(d1[:, n, :], 0, -2)                   # [..., 2, 5]
    c2 = jnp.moveaxis(d2[:, n, :], 0, -2)                   # [..., 2, 4]

    def bern(tau, deg):
        rows = []
        for j in range(deg + 1):
            rows.append(comb(deg, j) * tau ** j * (1 - tau) ** (deg - j))
        return jnp.stack(rows, axis=-1)

    b5 = bern(tau, 5)[..., None, :]
    b4 = bern(tau, 4)[..., None, :]
    b3 = bern(tau, 3)[..., None, :]
    pos = jnp.sum(c0 * b5, -1) * s[..., None]
    vel = jnp.sum(c1 * b4, -1)
    acc = jnp.sum(c2 * b3, -1) / s[..., None]
    return pos, vel, acc
