"""Oriented-bounding-box geometry for vehicle collision checks (vectorized SAT).

Reference: common::Vehicle::RetVehicleVertices / CheckCollisionUsingState
(src/Sim/core/common/src/common/basics/semantics.cc and
semantic_map_manager.cc) test rectangle overlap between vehicle footprints.
Here: separating-axis test on 2D rectangles, written to broadcast over
arbitrary batch shapes — one [P, A, T] policy x agent x time sweep is a single
fused VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def obb_vertices(x, y, theta, length, width, d_cr):
    """Footprint corners [..., 4, 2] of a vehicle at rear-axle pose (x,y,theta).

    The body rectangle is centered d_cr ahead of the rear axle
    (common::VehicleParam::d_cr, semantics.h:66-76; same convention as
    plan_utils::Piece footprint vertices, poly_traj_utils.hpp:115-137).
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx = x + d_cr * c
    cy = y + d_cr * s
    hl, hw = length / 2.0, width / 2.0
    lx = jnp.stack([hl, hl, -hl, -hl], axis=-1)
    ly = jnp.stack([hw, -hw, -hw, hw], axis=-1)
    vx = cx[..., None] + lx * c[..., None] - ly * s[..., None]
    vy = cy[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([vx, vy], axis=-1)


def _project_gap(verts_a, verts_b, axes):
    """Max signed gap of B beyond A over the given axes [..., K, 2]."""
    pa = jnp.einsum("...vc,...kc->...kv", verts_a, axes)
    pb = jnp.einsum("...vc,...kc->...kv", verts_b, axes)
    gap1 = pb.min(axis=-1) - pa.max(axis=-1)
    gap2 = pa.min(axis=-1) - pb.max(axis=-1)
    return jnp.maximum(gap1, gap2).max(axis=-1)


def obb_overlap(verts_a, verts_b):
    """True where rectangles [..., 4, 2] overlap (separating-axis theorem)."""
    def axes_of(v):
        e = jnp.stack([v[..., 1, :] - v[..., 0, :],
                       v[..., 3, :] - v[..., 0, :]], axis=-2)
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-9)

    axes = jnp.concatenate([axes_of(verts_a), axes_of(verts_b)], axis=-2)
    gap = _project_gap(verts_a, verts_b, axes)
    return gap < 0.0


def vehicles_collide(state_a, state_b, param_a, param_b, inflate=0.0):
    """OBB overlap between two agent states [..., 6] (see steer.STATE_DIM).

    ``inflate`` grows each footprint by the given margin on every side,
    matching SemanticsUtils::InflateVehicleBySize(traj, 1.0, 1.0) used by the
    MPDM safety cost (behavior_planner.cc:407-417).
    """
    la, wa, da = param_a
    lb, wb, db = param_b
    va = obb_vertices(state_a[..., 0], state_a[..., 1], state_a[..., 2],
                      la + 2 * inflate, wa + 2 * inflate, da)
    vb = obb_vertices(state_b[..., 0], state_b[..., 1], state_b[..., 2],
                      lb + 2 * inflate, wb + 2 * inflate, db)
    return obb_overlap(va, vb)
