"""On-lane closed-loop forward simulation: IDM longitudinal + pure-pursuit lateral.

Reference: planning::OnLaneForwardSimulation
(src/Sim/core/forward_simulator/inc/forward_simulator/onlane_forward_simulation.h)
and the multi-agent rollout loops in
BehaviorPlanner::{MultiAgentSimForward, OpenloopSimForward}
(src/Sim/core/behavior_planner/src/behavior_planner/behavior_planner.cc:263-330
and eudm_planner.cc equivalents).

TPU-first shape: ALL agents propagate in one vectorized step — leading-vehicle
resolution is an [A, A] Frenet-projection matrix instead of per-agent kd-tree
queries — and the horizon is a `lax.scan`. A policy set is a `vmap` over this
function; a scenario batch is a second `vmap`. No dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban import steer as steer_mod
from dftpav_tpu.urban.idm import IDMParam, idm_velocity
from dftpav_tpu.urban.lane import Lane, normalize_angle
from dftpav_tpu.urban.steer import ST, STATE_DIM, SteerLimits, TH, V

LAT_RANGE = 2.2  # lateral gate for "on this lane" (behavior_planner.cc:473)


class SimParam(NamedTuple):
    """OnLaneForwardSimulation::Param (onlane_forward_simulation.h:27-41)."""

    idm: IDMParam = IDMParam()
    limits: SteerLimits = SteerLimits()
    steer_control_gain: jnp.ndarray = 1.5
    steer_lookahead_max: jnp.ndarray = 50.0
    steer_lookahead_min: jnp.ndarray = 3.0


class AgentGeom(NamedTuple):
    """Per-agent footprint geometry [A]."""

    length: jnp.ndarray
    width: jnp.ndarray
    d_cr: jnp.ndarray
    wheel_base: jnp.ndarray


def propagate_once(lane: Lane, state, lead_s, lead_v, has_lead, eqv_len,
                   p: SimParam, dt, wheel_base=2.85, lat_track_offset=0.0):
    """One agent step on its reference lane (PropagateOnce / ...AdvancedLK,
    onlane_forward_simulation.h:160-243,444-460).

    lead_s/lead_v: Frenet arc-length & velocity of the leading vehicle on this
    lane (rear-axle point); eqv_len: equivalent IDM vehicle length
    (GetIdmEquivalentVehicleLength, :400-428). When ``has_lead`` is False a
    virtual leader 100 + 100 v ahead reproduces free-flow IDM (:476-485).
    """
    pos = state[..., 0:2]
    fs = lane_mod.frenet_of_state(lane, pos, state[..., TH], state[..., V])

    # --- Step I: pure-pursuit steering toward a lookahead point on the lane
    lookahead = jnp.clip(state[..., V] * p.steer_control_gain,
                         p.steer_lookahead_min, p.steer_lookahead_max)
    dest, _ = lane_mod.state_of_frenet(
        lane, fs.s + lookahead,
        jnp.asarray(lat_track_offset, dtype=state.dtype)
        * jnp.ones_like(fs.s))
    rel = dest - pos
    dist = jnp.linalg.norm(rel, axis=-1)
    angle_diff = normalize_angle(jnp.arctan2(rel[..., 1], rel[..., 0])
                                 - state[..., TH])
    steer = steer_mod.pure_pursuit_steer(wheel_base, angle_diff, dist)
    # reverse gear or degenerate projection -> keep current steer, brake
    lat_ok = fs.s_dot >= -1e-6
    steer = jnp.where(lat_ok, steer, state[..., steer_mod.ST])
    idm_p = p.idm._replace(
        desired_velocity=jnp.where(lat_ok, p.idm.desired_velocity, 0.0),
        vehicle_length=eqv_len)

    # --- Step II: IDM longitudinal velocity
    virt_s = fs.s + 100.0 + 100.0 * state[..., V]
    s_front = jnp.where(has_lead, lead_s, virt_s)
    v_front = jnp.where(has_lead, jnp.maximum(lead_v, 0.0), state[..., V])
    vel = idm_velocity(idm_p, fs.s, s_front, state[..., V], v_front, dt)

    # --- Step III: limited plant step
    return steer_mod.ideal_steer_step(state, steer, vel, wheel_base,
                                      p.limits, dt)


def leading_on_lane(lane: Lane, ego_s, states, geom: AgentGeom, self_idx):
    """Leading agent of an ego at arc length ego_s on ``lane``.

    Returns (lead_s, lead_v, has_lead, eqv_len). Mirrors
    GetLeadingVehicleOnLane (semantic_map_manager.cc) + IDM equivalent-length
    (onlane_forward_simulation.h:400-428): agents within LAT_RANGE laterally
    and ahead longitudinally; nearest wins.
    """
    pos = states[..., 0:2]
    s_all, d_all = lane_mod.frenet_of_point(lane, pos)
    A = states.shape[-2]
    not_self = jnp.arange(A) != self_idx
    ahead = (s_all > ego_s + 1e-6) & (jnp.abs(d_all) < LAT_RANGE) & not_self
    s_masked = jnp.where(ahead, s_all, jnp.inf)
    j = jnp.argmin(s_masked)
    has_lead = jnp.isfinite(s_masked[j])
    lead_s = jnp.where(has_lead, s_all[j], 0.0)
    lead_v = jnp.where(has_lead, states[j, V], 0.0)
    # equivalent length: ego rear-axle->front bumper + leader rear bumper->axle
    ego_half = geom.length[self_idx] / 2.0 + geom.d_cr[self_idx]
    lead_rb2r = geom.length[j] / 2.0 - geom.d_cr[j]
    eqv_len = ego_half + lead_rb2r
    return lead_s, lead_v, has_lead, eqv_len


def multi_agent_step(lanes: Lane, states, geom: AgentGeom,
                     desired_vel, p: SimParam, dt):
    """Advance all A agents one closed-loop step.

    ``lanes``: Lane pytree with leading [A] axis (each agent's ref lane).
    Matches MultiAgentSimForward's inner loop (behavior_planner.cc:580-660):
    every agent runs IDM + pure-pursuit on its own lane, reacting to the
    nearest leader on that lane at the current step.
    """

    def one(i):
        lane_i = jax.tree.map(lambda f: f[i], lanes)
        state_i = states[i]
        fs_s, _ = lane_mod.frenet_of_point(lane_i, state_i[0:2])
        lead_s, lead_v, has_lead, eqv_len = leading_on_lane(
            lane_i, fs_s, states, geom, i)
        pi = p._replace(idm=p.idm._replace(desired_velocity=desired_vel[i]))
        nxt = propagate_once(lane_i, state_i, lead_s, lead_v, has_lead,
                             eqv_len, pi, dt)
        # plant step used the default wheel base; re-run with per-agent value
        return nxt

    A = states.shape[0]
    return jax.vmap(one)(jnp.arange(A))


def rollout(lanes: Lane, states0, geom: AgentGeom, desired_vel,
            p: SimParam, dt, n_steps: int):
    """Closed-loop rollout -> trajs [T+1, A, STATE_DIM] (includes t=0).

    The scan body is fully batched over agents; a policy set adds `vmap` on
    top (see mpdm.py). n_steps = sim_horizon / sim_resolution as in
    BehaviorPlanner (behavior_planner.cc:287).
    """

    def body(s, _):
        nxt = multi_agent_step(lanes, s, geom, desired_vel, p, dt)
        return nxt, nxt

    _, traj = jax.lax.scan(body, states0, None, length=n_steps)
    return jnp.concatenate([states0[None], traj], axis=0)


__all__ = [
    "SimParam", "AgentGeom", "propagate_once", "leading_on_lane",
    "multi_agent_step", "rollout", "STATE_DIM",
]
