"""Lanes and Frenet-frame transforms, fixed-shape and fully vectorized.

The reference represents a lane as a quintic spline fit to sampled waypoints
(common::Lane, src/Sim/core/common/inc/common/lane/lane.h:9, fit via
LaneGenerator::GetLaneBySampleFitting in spline_generator.cc) and converts
states to/from the Frenet frame with common::StateTransformer
(src/Sim/core/common/inc/common/state/state_transformer.h:11, whose docstring
notes ~1 cm error from "the finite sampling strategy").

TPU-first design: a lane IS its uniform arc-length sampling — arrays
``xy [P,2]``, unit ``tangent [P,2]``, ``curvature [P]`` with spacing ``ds`` and
a validity count ``n_valid`` (P is a compile-time pad). Every query
(point-at-s, Frenet projection) is a gather + linear interpolation; projecting
A agents onto a lane is one [A, P] distance matmul instead of A spline walks.
This matches the reference's own sampled-approximation accuracy while being
`vmap`/`scan`-friendly with zero dynamic shapes.

Host-side construction (`build_lane`) fits a centripetal Catmull-Rom spline
through the waypoints and resamples it uniformly in arc length, reproducing
the smooth-lane behavior of the reference's spline fit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Lane(NamedTuple):
    """Uniform arc-length sampled lane (device pytree; may carry batch dims).

    Positions beyond ``n_valid`` points repeat the last valid sample so that
    clamped queries stay well-defined without masks.
    """

    xy: jnp.ndarray         # [P, 2]
    tangent: jnp.ndarray    # [P, 2] unit tangents
    curvature: jnp.ndarray  # [P]
    ds: jnp.ndarray         # [] sample spacing (m)
    n_valid: jnp.ndarray    # [] int32, number of real samples (<= P)
    # closed (ring) lane: arc-length queries WRAP modulo the length instead
    # of clamping at the seam — the reference's Lane abstraction has no
    # end-of-lane artifact on its closed courses (ring_exp_v1.0), and
    # neither do pure-pursuit lookahead targets here
    closed: jnp.ndarray = np.zeros((), bool)

    @property
    def length(self) -> jnp.ndarray:
        return (self.n_valid.astype(self.xy.dtype) - 1.0) * self.ds


class LaneSet(NamedTuple):
    """A lane net: L stacked lanes + left/right adjacency (-1 = none).

    Mirrors the reference's lane-net semantics (semantic_map_manager's
    GetRefLaneForStateByBehavior picks the left/right neighbor lane for
    lane-change behaviors, semantic_map_manager.cc:1222).
    """

    lanes: Lane             # Lane with leading [L] axis on every field
    left_id: jnp.ndarray    # [L] int32 index of left neighbor, -1 if none
    right_id: jnp.ndarray   # [L] int32

    @property
    def n_lanes(self) -> int:
        return self.lanes.xy.shape[0]

    def lane(self, i) -> Lane:
        return Lane(*(f[i] for f in self.lanes))


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def _catmull_rom(points: np.ndarray, samples_per_seg: int = 32) -> np.ndarray:
    """Centripetal Catmull-Rom densification of a waypoint polyline."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 2:
        raise ValueError("need at least 2 waypoints")
    if len(pts) == 2:
        t = np.linspace(0.0, 1.0, samples_per_seg)[:, None]
        return pts[0] * (1 - t) + pts[1] * t
    # pad endpoints by reflection
    ext = np.vstack([2 * pts[0] - pts[1], pts, 2 * pts[-1] - pts[-2]])
    out = []
    for i in range(len(pts) - 1):
        p0, p1, p2, p3 = ext[i], ext[i + 1], ext[i + 2], ext[i + 3]

        def tj(ti, pa, pb):
            return ti + max(np.sqrt(np.linalg.norm(pb - pa)), 1e-9)

        t0 = 0.0
        t1 = tj(t0, p0, p1)
        t2 = tj(t1, p1, p2)
        t3 = tj(t2, p2, p3)
        t = np.linspace(t1, t2, samples_per_seg, endpoint=False)[:, None]
        a1 = (t1 - t) / (t1 - t0) * p0 + (t - t0) / (t1 - t0) * p1
        a2 = (t2 - t) / (t2 - t1) * p1 + (t - t1) / (t2 - t1) * p2
        a3 = (t3 - t) / (t3 - t2) * p2 + (t - t2) / (t3 - t2) * p3
        b1 = (t2 - t) / (t2 - t0) * a1 + (t - t0) / (t2 - t0) * a2
        b2 = (t3 - t) / (t3 - t1) * a2 + (t - t1) / (t3 - t1) * a3
        c = (t2 - t) / (t2 - t1) * b1 + (t - t1) / (t2 - t1) * b2
        out.append(c)
    out.append(pts[-1:])
    return np.vstack(out)


def build_lane(waypoints, ds: float = 0.5, P: int = 512,
               dtype=np.float32, closed: bool = False) -> Lane:
    """Fit + uniformly resample a lane from sparse waypoints (host, NumPy).

    Equivalent role to LaneGenerator::GetLaneBySampleFitting
    (reference: src/Sim/core/common/src/common/spline/spline_generator.cc).
    `closed=True` marks a ring lane: arc-length queries wrap at the seam.
    Open is the default — a polyline that merely starts and ends at the
    same point keeps clamping semantics unless the caller opts in
    (coincident endpoints are NOT auto-promoted to a ring).
    """
    wp = np.asarray(waypoints, dtype=np.float64)
    dense = _catmull_rom(wp)
    seg = np.linalg.norm(np.diff(dense, axis=0), axis=1)
    keep = np.concatenate([[True], seg > 1e-12])
    dense = dense[keep]
    seg = np.linalg.norm(np.diff(dense, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = float(s[-1])
    n = min(P, max(2, int(np.floor(total / ds)) + 1))
    su = np.arange(n) * ds
    x = np.interp(su, s, dense[:, 0])
    y = np.interp(su, s, dense[:, 1])
    xy = np.stack([x, y], axis=1)

    grad = np.gradient(xy, ds, axis=0)
    speed = np.maximum(np.linalg.norm(grad, axis=1), 1e-9)
    tan = grad / speed[:, None]
    # curvature = d(theta)/ds from unit tangents
    theta = np.unwrap(np.arctan2(tan[:, 1], tan[:, 0]))
    kappa = np.gradient(theta, ds)

    pad = P - n
    if pad > 0:
        xy = np.vstack([xy, np.repeat(xy[-1:], pad, axis=0)])
        tan = np.vstack([tan, np.repeat(tan[-1:], pad, axis=0)])
        kappa = np.concatenate([kappa, np.repeat(kappa[-1:], pad)])
    return Lane(
        xy=jnp.asarray(xy, dtype=dtype),
        tangent=jnp.asarray(tan, dtype=dtype),
        curvature=jnp.asarray(kappa, dtype=dtype),
        ds=jnp.asarray(ds, dtype=dtype),
        n_valid=jnp.asarray(n, dtype=jnp.int32),
        closed=jnp.asarray(bool(closed)),
    )


def build_lane_set(lanes: list[Lane], left_ids, right_ids) -> LaneSet:
    stacked = Lane(*(jnp.stack([getattr(l, f) for l in lanes])
                     for f in Lane._fields))
    return LaneSet(lanes=stacked,
                   left_id=jnp.asarray(left_ids, dtype=jnp.int32),
                   right_id=jnp.asarray(right_ids, dtype=jnp.int32))


# ---------------------------------------------------------------------------
# Device queries (jittable, clamped; all linear interpolation between samples)
# ---------------------------------------------------------------------------

def _interp_idx(lane: Lane, s):
    smax = lane.length
    # closed lanes wrap (s mod length); open lanes clamp at the ends
    s_wrap = s - jnp.floor(s / jnp.maximum(smax, 1e-6)) * smax
    s = jnp.where(lane.closed, s_wrap, jnp.clip(s, 0.0, smax))
    f = s / lane.ds
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, lane.n_valid - 2)
    w = f - i0.astype(f.dtype)
    return i0, w


def lane_point(lane: Lane, s):
    """(xy, unit tangent, curvature) at arc length s (clamped to the lane)."""
    i0, w = _interp_idx(lane, s)
    w1 = w[..., None]
    xy = lane.xy[i0] * (1 - w1) + lane.xy[i0 + 1] * w1
    tan = lane.tangent[i0] * (1 - w1) + lane.tangent[i0 + 1] * w1
    tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-9)
    kappa = lane.curvature[i0] * (1 - w) + lane.curvature[i0 + 1] * w
    return xy, tan, kappa


def frenet_of_point(lane: Lane, p):
    """Project point(s) p [..., 2] onto the lane -> (s, d).

    d > 0 is left of the lane. Matches StateTransformer::GetFrenetPointFromPoint
    (reference: state_transformer.cc) to sampling accuracy.
    """
    P = lane.xy.shape[0]
    idx = jnp.arange(P)
    valid = idx < lane.n_valid
    d2 = jnp.sum((p[..., None, :] - lane.xy) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    i = jnp.clip(jnp.argmin(d2, axis=-1), 0, lane.n_valid - 2)
    rel = p - lane.xy[i]
    tan = lane.tangent[i]
    along = jnp.sum(rel * tan, axis=-1)
    # clamp the along-track correction to one sample to stay on the polyline
    along = jnp.clip(along, -lane.ds, lane.ds)
    s = i.astype(p.dtype) * lane.ds + along
    d = tan[..., 0] * rel[..., 1] - tan[..., 1] * rel[..., 0]
    return s, d


class FrenetState(NamedTuple):
    """Longitudinal/lateral state (common::FrenetState, frenet_state.h)."""

    s: jnp.ndarray        # arc length
    s_dot: jnp.ndarray    # ds/dt
    d: jnp.ndarray        # signed lateral offset (left +)
    d_prime: jnp.ndarray  # dd/ds


def frenet_of_state(lane: Lane, pos, angle, velocity) -> FrenetState:
    """StateTransformer::GetFrenetStateFromState (state_transformer.cc).

    s_dot = v cos(dtheta) / (1 - kappa d);  d' = tan(dtheta) (1 - kappa d).
    """
    s, d = frenet_of_point(lane, pos)
    _, tan, kappa = lane_point(lane, s)
    lane_theta = jnp.arctan2(tan[..., 1], tan[..., 0])
    dtheta = normalize_angle(angle - lane_theta)
    one_kd = jnp.maximum(1.0 - kappa * d, 0.1)
    s_dot = velocity * jnp.cos(dtheta) / one_kd
    d_prime = jnp.tan(dtheta) * one_kd
    return FrenetState(s=s, s_dot=s_dot, d=d, d_prime=d_prime)


def state_of_frenet(lane: Lane, s, d):
    """(position, heading) of the point at (s, d) with d' = 0.

    The lane-aligned inverse map used for pure-pursuit lookahead targets and
    gap target states (OnLaneForwardSimulation::CalcualateSteer loads a Frenet
    state with zero lateral derivative, onlane_forward_simulation.h:434-443).
    """
    xy, tan, _ = lane_point(lane, s)
    normal = jnp.stack([-tan[..., 1], tan[..., 0]], axis=-1)
    pos = xy + d[..., None] * normal
    heading = jnp.arctan2(tan[..., 1], tan[..., 0])
    return pos, heading


def normalize_angle(a):
    """Wrap to (-pi, pi] (common/basics normalize_angle)."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))
