"""MPDM behavior planning: simulate candidate lateral behaviors, pick the best.

Reference: planning::BehaviorPlanner
(src/Sim/core/behavior_planner/src/behavior_planner/behavior_planner.cc):
RunMpdm -> MultiBehaviorJudge (:135-262) simulates {LK, LCL, LCR} with
MultiAgentSimForward (closed loop, :525-660; falls back to OpenloopSimForward
:263-330 when the closed-loop sim collides) and scores them with
EvaluateSinglePolicyTraj (:437-510): action + safety + efficiency.

TPU-first shape: the candidate behaviors are a leading axis — ONE
`vmap(rollout)` runs every policy's multi-agent closed-loop and open-loop
simulation in parallel; scoring is a fused reduction over [n_policies, T, A].
Invalid policies (no neighbor lane / both sims collide) are masked, not
branched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import geometry, lane as lane_mod
from dftpav_tpu.urban.lane import Lane, LaneSet

# Lateral behaviors (common::LateralBehavior, semantics.h)
LK, LCL, LCR = 0, 1, 2
BEHAVIORS = (LK, LCL, LCR)


class MPDMConfig(NamedTuple):
    sim_resolution: float = 0.4   # behavior_planner.h:139
    sim_horizon: float = 4.0      # behavior_planner.h:140
    desired_velocity: float = 6.0
    max_vel_cmd_gap: float = 5.0  # behavior_planner.cc:240

    @property
    def n_steps(self) -> int:
        return int(self.sim_horizon / self.sim_resolution)


class MPDMResult(NamedTuple):
    behavior: jnp.ndarray       # [] int32 winning behavior id
    desired_vel: jnp.ndarray    # [] clamped desired velocity command
    scores: jnp.ndarray         # [3] per-behavior cost (inf if invalid)
    valid: jnp.ndarray          # [3] bool
    trajs: jnp.ndarray          # [3, T+1, A, 6] forward trajectories
    ref_lane_id: jnp.ndarray    # [] int32 lane id of the winning behavior


def behavior_lane_ids(lane_set: LaneSet, cur_lane_id):
    """Target lane per behavior: [LK, LCL, LCR] -> lane ids (-1 invalid).

    Mirrors GetRefLaneForStateByBehavior's neighbor-lane selection
    (semantic_map_manager.cc:1222).
    """
    left = lane_set.left_id[cur_lane_id]
    right = lane_set.right_id[cur_lane_id]
    return jnp.stack([cur_lane_id, left, right])


def _gather_lane(lane_set: LaneSet, lane_id) -> Lane:
    safe = jnp.maximum(lane_id, 0)
    return jax.tree.map(lambda f: f[safe], lane_set.lanes)


def _rollout_openloop(lanes, states0, geom_, desired_vel, p, dt, n_steps):
    """OpenloopSimForward (:263-330): every agent free-flows on its own lane
    (no leading vehicle), agents keep their initial velocity as desired."""

    def body(s, _):
        def one(i):
            lane_i = jax.tree.map(lambda f: f[i], lanes)
            pi = p._replace(idm=p.idm._replace(
                desired_velocity=desired_vel[i]))
            return fsim.propagate_once(
                lane_i, s[i], 0.0, 0.0, jnp.asarray(False), 5.0, pi, dt,
                wheel_base=geom_.wheel_base[i])

        nxt = jax.vmap(one)(jnp.arange(states0.shape[0]))
        return nxt, nxt

    _, traj = jax.lax.scan(body, states0, None, length=n_steps)
    return jnp.concatenate([states0[None], traj], axis=0)


def _ego_collisions(trajs, ego_idx, geom_: fsim.AgentGeom, inflate=0.0):
    """[..., T, A] bool: ego overlaps agent a at step t (ego row is False)."""
    ego = trajs[..., :, ego_idx, :]
    pa = (geom_.length[ego_idx], geom_.width[ego_idx], geom_.d_cr[ego_idx])

    def against(a):
        pb = (geom_.length[a], geom_.width[a], geom_.d_cr[a])
        hit = geometry.vehicles_collide(ego, trajs[..., :, a, :], pa, pb,
                                        inflate=inflate)
        return jnp.where(a == ego_idx, jnp.zeros_like(hit), hit)

    return jnp.moveaxis(
        jax.vmap(against)(jnp.arange(trajs.shape[-2])), 0, -1)


def _score_policy(traj, ego_idx, geom_, behavior_id, eval_lane: Lane,
                  cfg: MPDMConfig):
    """EvaluateSinglePolicyTraj (behavior_planner.cc:437-510).

    efficiency: 0.5 * (|v_T - v_des|/10 + leading-vehicle term), where the
    leading term is 1.5 * (120 - ds)/120 * |v_T - v_des| / max(2, dist) when
    both ego and its terminal leader (on the terminal lane-keep lane,
    GetLeadingVehicleOnLane semantics, semantic_map_manager.cc:1355-1417) are
    below v_des within 100 m; safety: per colliding (inflated-by-1.0) step,
    0.01 * |dv| * 0.5; action: +0.5 for any lane change.
    """
    ego_T = traj[-1, ego_idx]
    cost_eff_ego = jnp.abs(ego_T[fsim.V] - cfg.desired_velocity) / 10.0

    # terminal leading vehicle on the evaluation lane
    ego_s, _ = lane_mod.frenet_of_point(eval_lane, ego_T[0:2])
    lead_s, lead_v, has_lead, _ = fsim.leading_on_lane(
        eval_lane, ego_s, traj[-1], geom_, ego_idx)
    ds = lead_s - ego_s
    # euclidean distance to the leader's terminal position
    A = traj.shape[1]
    s_all, d_all = lane_mod.frenet_of_point(eval_lane, traj[-1, :, 0:2])
    dists = jnp.linalg.norm(traj[-1, :, 0:2] - ego_T[0:2], axis=-1)
    j = jnp.argmin(jnp.where(
        (s_all > ego_s + 1e-6) & (jnp.abs(d_all) < fsim.LAT_RANGE)
        & (jnp.arange(A) != ego_idx), s_all, jnp.inf))
    dist_lead = dists[j]
    ratio = jnp.maximum(0.0, (120.0 - ds) / 120.0)
    lead_applies = (has_lead & (ds < 120.0)
                    & (ego_T[fsim.V] < cfg.desired_velocity)
                    & (lead_v < cfg.desired_velocity)
                    & (dist_lead < 100.0))
    cost_eff_lead = jnp.where(
        lead_applies,
        1.5 * ratio * jnp.abs(ego_T[fsim.V] - cfg.desired_velocity)
        / jnp.maximum(2.0, dist_lead), 0.0)
    cost_eff = 0.5 * (cost_eff_ego + cost_eff_lead)

    hits = _ego_collisions(traj, ego_idx, geom_, inflate=0.5)  # +1.0 per dim
    dv = jnp.abs(traj[:, ego_idx, fsim.V][:, None] - traj[..., fsim.V])
    cost_safety = jnp.sum(jnp.where(hits, 0.01 * dv * 0.5, 0.0))

    cost_action = jnp.where(behavior_id == LK, 0.0, 0.5)
    return cost_action + cost_safety + cost_eff


def _desired_vel_of_traj(traj, ego_idx, geom_, fallback):
    """GetDesiredVelocityOfTrajectory (behavior_planner.cc:512-523): velocity
    at the last state whose normal acceleration |kappa| v^2 is positive
    (the reference never raises its max_acc_normal threshold); falls back to
    the reference desired velocity when the path is straight."""
    v = traj[:, ego_idx, fsim.V]
    steer = traj[:, ego_idx, fsim.ST]
    kappa = jnp.abs(jnp.tan(steer)) / geom_.wheel_base[ego_idx]
    acc_normal = kappa * v * v
    has = acc_normal > 1e-6
    idx = jnp.where(has.any(), traj.shape[0] - 1
                    - jnp.argmax(has[::-1]), 0)
    return jnp.where(has.any(), v[idx], fallback)


def mpdm_plan(lane_set: LaneSet, states, lane_ids, geom_: fsim.AgentGeom,
              ego_idx: int, p: fsim.SimParam, cfg: MPDMConfig) -> MPDMResult:
    """One MPDM decision (MultiBehaviorJudge, behavior_planner.cc:135-262).

    states:   [A, 6] agent states (see steer.STATE_DIM layout)
    lane_ids: [A] int32 current lane of each agent (agents keep lane; their
              predicted behavior defaults to LK as in the reference when
              GetPredictedBehavior fails, :169-173)
    """
    dt, n_steps = cfg.sim_resolution, cfg.n_steps
    A = states.shape[0]
    agent_vel = states[:, fsim.V]
    desired_vel = agent_vel.at[ego_idx].set(cfg.desired_velocity)

    ego_lanes = behavior_lane_ids(lane_set, lane_ids[ego_idx])  # [3]

    def sim_behavior(b):
        ids = lane_ids.at[ego_idx].set(jnp.maximum(ego_lanes[b], 0))
        lanes = _gather_lane(lane_set, ids)
        cl = fsim.rollout(lanes, states, geom_, desired_vel, p, dt, n_steps)
        ol = _rollout_openloop(lanes, states, geom_, desired_vel, p, dt,
                               n_steps)
        cl_hit = _ego_collisions(cl, ego_idx, geom_).any()
        ol_hit = _ego_collisions(ol, ego_idx, geom_).any()
        traj = jnp.where(cl_hit, ol, cl)
        lane_ok = ego_lanes[b] >= 0
        valid = lane_ok & ~(cl_hit & ol_hit)
        # terminal lane-keep evaluation lane = the behavior's target lane
        # (GetRefLaneForStateByBehavior(terminal, LK), behavior_planner.cc:455)
        eval_lane = _gather_lane(lane_set, ego_lanes[b])
        score = _score_policy(traj, ego_idx, geom_, b, eval_lane, cfg)
        return traj, jnp.where(valid, score, jnp.inf), valid

    trajs, scores, valid = jax.vmap(sim_behavior)(jnp.arange(3))

    best = jnp.argmin(scores)
    des_vel = _desired_vel_of_traj(trajs[best], ego_idx, geom_,
                                   cfg.desired_velocity)
    # clamp command gap (behavior_planner.cc:239-247)
    v0 = states[ego_idx, fsim.V]
    des_vel = jnp.clip(des_vel, v0 - cfg.max_vel_cmd_gap,
                       v0 + cfg.max_vel_cmd_gap)
    return MPDMResult(behavior=best.astype(jnp.int32),
                      desired_vel=des_vel,
                      scores=scores, valid=valid, trajs=trajs,
                      ref_lane_id=ego_lanes[best])
