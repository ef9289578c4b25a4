"""Semantic map: occupancy rasterization, lane association, predictions.

Reference: semantic_map_manager (src/Sim/core/semantic_map_manager/):
DataRenderer rasterizes obstacles into an ego-centric GridMapND with OpenCV
circles/fillPoly + kd-trees (data_renderer.cc:33-264); SemanticMapManager
provides nearest-lane association, leading-vehicle queries, MOBIL behavior
prediction and openloop trajectory prediction (semantic_map_manager.cc).

TPU-native: the grid is a [H, W] jnp array produced by vectorized
point-in-shape tests (no OpenCV, no kd-trees — neighbor queries are the
[A, P] projections in forward_sim/mobil); predictions reuse the batched
forward simulator.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban import mobil
from dftpav_tpu.urban.lane import LaneSet


class GridSpec(NamedTuple):
    """Ego-centric occupancy grid geometry (GridMapND in the reference;
    defaults mirror the SMM config's 0.2 m urban grid)."""

    origin: jnp.ndarray       # [2] world position of cell (0, 0)
    resolution: float = 0.2
    height: int = 512
    width: int = 512


def _cell_centers(spec: GridSpec):
    ys = jnp.arange(spec.height) * spec.resolution
    xs = jnp.arange(spec.width) * spec.resolution
    gx = spec.origin[0] + xs[None, :]
    gy = spec.origin[1] + ys[:, None]
    return gx, gy  # broadcastable [1, W], [H, 1]


def rasterize_circles(spec: GridSpec, centers, radii, mask):
    """Occupancy [H, W] from circle obstacles (DataRenderer's cv::circle
    fills, data_renderer.cc:121-160). centers [O, 2], radii [O], mask [O]."""
    gx, gy = _cell_centers(spec)
    d2 = (gx[None] - centers[:, 0, None, None]) ** 2 \
        + (gy[None] - centers[:, 1, None, None]) ** 2
    hit = (d2 <= (radii ** 2)[:, None, None]) & mask[:, None, None]
    return jnp.any(hit, axis=0)


def rasterize_obbs(spec: GridSpec, states, lengths, widths, d_crs, mask):
    """Occupancy [H, W] from vehicle footprints (cv::fillPoly equivalent).

    states [O, 6] in the steer-plant layout; point-in-OBB test per cell.
    """
    gx, gy = _cell_centers(spec)
    c, s = jnp.cos(states[:, 2]), jnp.sin(states[:, 2])
    cx = states[:, 0] + d_crs * c
    cy = states[:, 1] + d_crs * s
    relx = gx[None] - cx[:, None, None]
    rely = gy[None] - cy[:, None, None]
    lon = relx * c[:, None, None] + rely * s[:, None, None]
    lat = -relx * s[:, None, None] + rely * c[:, None, None]
    hit = (jnp.abs(lon) <= (lengths / 2)[:, None, None]) \
        & (jnp.abs(lat) <= (widths / 2)[:, None, None]) \
        & mask[:, None, None]
    return jnp.any(hit, axis=0)


def occupied_at(spec: GridSpec, grid, pos):
    """Grid lookup at world positions pos [..., 2] (GridMapND accessor)."""
    ij = (pos - spec.origin) / spec.resolution
    i = jnp.clip(ij[..., 1].astype(jnp.int32), 0, spec.height - 1)
    j = jnp.clip(ij[..., 0].astype(jnp.int32), 0, spec.width - 1)
    inb = (ij[..., 0] >= 0) & (ij[..., 0] < spec.width) \
        & (ij[..., 1] >= 0) & (ij[..., 1] < spec.height)
    return jnp.where(inb, grid[i, j], False)


# ---------------------------------------------------------------------------
# Occlusion-aware sensing (the "fake mapper")
# ---------------------------------------------------------------------------

def visibility_mask(spec: GridSpec, grid, ego_pos, n_samples: int = 128):
    """[H, W] bool: cell is line-of-sight visible from the ego position.

    Reference: DataRenderer::RayCastingOnObstacleMap + roguelike octant
    rasterization (data_renderer.cc:264-293, roguelike_ray_casting.h): rays
    from the ego geometric center mark cells up to and including the first
    occupied cell; everything behind is occluded.

    TPU-native: instead of 8 sequential shadow-casting octants, every cell
    IS a ray end point — n_samples points along each ego->cell segment are
    gathered from the grid in one batched lookup, and a cell is visible iff
    no *strictly earlier* sample is occupied. One [H, W, S] gather pass, no
    recursion, no data-dependent shapes.
    """
    gx, gy = _cell_centers(spec)                       # [1, W], [H, 1]
    cx = jnp.broadcast_to(gx, (spec.height, spec.width))
    cy = jnp.broadcast_to(gy, (spec.height, spec.width))
    dx = cx - ego_pos[0]
    dy = cy - ego_pos[1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    # sample fractions stop one cell short of the target so a cell does not
    # occlude itself (the reference includes the first occupied cell as
    # visible and shadows only cells BEHIND it), and start one cell OUT of
    # the ego's own cell: the ego standing on/next to an occupied cell must
    # not blind every ray (the reference caster starts from the ego cell and
    # still marks the first occupied cell per ray as visible)
    t_hi = jnp.maximum(1.0 - spec.resolution / jnp.maximum(dist, 1e-6), 0.0)
    t_lo = jnp.minimum(spec.resolution / jnp.maximum(dist, 1e-6), t_hi)
    ts = (jnp.arange(n_samples) + 0.5) / n_samples     # [S]
    frac = t_lo[..., None] + ts * (t_hi - t_lo)[..., None]   # [H, W, S]
    px = ego_pos[0] + dx[..., None] * frac
    py = ego_pos[1] + dy[..., None] * frac
    blocked = occupied_at(spec, grid, jnp.stack([px, py], axis=-1))
    return ~jnp.any(blocked, axis=-1)


def fake_mapper(spec: GridSpec, grid, ego_pos, seen_prev=None,
                dist_thres=None, n_samples: int = 128):
    """Rendered (sensed) occupancy: what the ego can actually see.

    Reference: DataRenderer::FakeMapper (data_renderer.cc:236-260): the
    obstacle point set the planner consumes contains only ray-cast-visible
    obstacle cells, unioned with previously-seen cells that are still within
    `dist_thres` (Chebyshev) of the ego ("fill past obstacles and remove far
    ones", :244-258).

    grid: ground-truth occupancy [H, W]; seen_prev: last call's output (or
    None on the first frame). Returns the sensed grid [H, W].
    """
    vis = visibility_mask(spec, grid, ego_pos, n_samples)
    seen = grid & vis
    if seen_prev is not None:
        if dist_thres is None:
            dist_thres = spec.height * spec.resolution / 2.0 * 0.8
        gx, gy = _cell_centers(spec)
        near = (jnp.abs(gx - ego_pos[0]) < dist_thres) \
            & (jnp.abs(gy - ego_pos[1]) < dist_thres)
        seen = seen | (seen_prev & near)
    return seen


def nearest_lane(lane_set: LaneSet, pos, heading, max_dist: float = 10.0,
                 heading_gate: float = 1.3):
    """Nearest lane id for a pose (GetNearestLaneIdUsingState,
    semantic_map_manager.cc): smallest |d| among lanes whose local heading
    is within the gate; -1 when none qualifies."""
    L = lane_set.n_lanes

    def one(i):
        lane = lane_set.lane(i)
        s, d = lane_mod.frenet_of_point(lane, pos)
        _, tan, _ = lane_mod.lane_point(lane, s)
        dth = lane_mod.normalize_angle(
            heading - jnp.arctan2(tan[..., 1], tan[..., 0]))
        ok = (jnp.abs(d) < max_dist) & (jnp.abs(dth) < heading_gate)
        return jnp.where(ok, jnp.abs(d), jnp.inf)

    dists = jax.vmap(one)(jnp.arange(L))                    # [L, ...]
    best = jnp.argmin(dists, axis=0)
    found = jnp.isfinite(jnp.min(dists, axis=0))
    return jnp.where(found, best, -1).astype(jnp.int32)


def associate_lanes(lane_set: LaneSet, states):
    """[A] lane ids for all agents (vectorized nearest_lane)."""
    return nearest_lane(lane_set, states[:, 0:2], states[:, 2])


def openloop_prediction(lane_set: LaneSet, states, lane_ids, geom,
                        p: fsim.SimParam, dt: float, n_steps: int):
    """Openloop (non-interactive) forward prediction of all agents on their
    lanes at their current velocities (openloop trajectory prediction,
    semantic_map_manager.cc / OpenloopSimForward semantics)."""
    from dftpav_tpu.urban.mpdm import _gather_lane, _rollout_openloop

    lanes = _gather_lane(lane_set, jnp.maximum(lane_ids, 0))
    return _rollout_openloop(lanes, states, geom, states[:, fsim.V], p, dt,
                             n_steps)


def predict_behaviors(lane_set: LaneSet, states, lane_ids, geom):
    """Most-likely lateral behavior per agent via MOBIL probabilities
    (the reference's GetPredictedBehavior path,
    semantic_map_manager.cc:152-218)."""
    probs = mobil.predict_all(lane_set, states, lane_ids, geom)
    return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs
