"""EUDM behavior planning: DCP-tree guided branching over semantic action
sequences, batched forward simulation, layered cost evaluation.

Reference: planning::EudmPlanner + DcpTree
(src/Sim/util/eudm_planner/src/eudm_planner/{eudm_planner.cc,dcp_tree.cc},
config defaults src/Sim/util/eudm_planner/config/eudm_config.pb.txt:38-45:
tree_height 5, layer 1.0 s, step 0.2 s).

DCP-tree (dcp_tree.cc:41-70): for each longitudinal action (maintain /
accelerate / decelerate), branch away from the ongoing lateral behavior at
exactly one depth h in 1..H-1 (to each of the other two lateral actions) and
keep it to the horizon; plus the no-change sequence. 3 * (2(H-1) + 1) leaves.

TPU-first shape: the action script is a host-precomputed [n_policies, H]
int array; ONE `vmap` over policies runs every leaf's multi-agent closed-loop
simulation (`lax.scan` over H * steps_per_layer steps with per-step gathers of
the policy's lane/velocity command); costs are fused reductions. No
per-branch recursion, no threads (the reference uses a thread pool,
eudm_planner.cc:736).

Simplifications vs the reference, kept deliberately and documented:
  * surrounding agents simulate with their observed behavior (lane-keep IDM)
    rather than CFB (conditional focused branching) belief sets;
  * the RSS-based safety cost uses collision + velocity-weighted overlap as
    in the MPDM scorer (behavior_planner.cc:407-435) instead of the serious/
    non-serious RSS ladder (eudm_planner.cc:1157-1181 EvaluateSafetyStatus);
  * lon actions map to IDM desired-velocity commands exactly as
    eudm_planner.cc:383-409 (acc_cmd_vel_gap/dec_cmd_vel_gap 10.0,
    lon_aggressive_ratio 0.25 tightening spacing/headway when accelerating).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban.mpdm import _ego_collisions, _gather_lane, behavior_lane_ids
from dftpav_tpu.urban.lane import LaneSet

# lat actions match mpdm.{LK,LCL,LCR}; lon actions:
MAINTAIN, ACCEL, DECEL = 0, 1, 2


class EUDMConfig(NamedTuple):
    tree_height: int = 5          # eudm_config.pb.txt:43
    layer_time: float = 1.0       # :41
    step: float = 0.2             # :42
    desired_velocity: float = 6.0
    acc_cmd_vel_gap: float = 10.0  # :129
    dec_cmd_vel_gap: float = 10.0  # :130
    lon_aggressive_ratio: float = 0.25  # :85
    # cost weights (eudm_config.pb.txt cost block, representative values)
    ego_lack_speed_unit_cost: float = 0.3
    leading_unit_cost: float = 1.0
    lane_change_unit_cost: float = 0.3
    discount_factor: float = 0.7  # per-layer discount (eudm_planner.cc:694)

    @property
    def steps_per_layer(self) -> int:
        return int(round(self.layer_time / self.step))


def dcp_action_script(H: int, ongoing_lat: int = 0) -> np.ndarray:
    """All DCP-tree leaves as [n_policies, H, 2] (lon, lat) int arrays.

    Reproduces DcpTree::GenerateActionScript (dcp_tree.cc:41-70): one lateral
    branch point per sequence.
    """
    out = []
    for lon in range(3):
        for h in range(1, H):
            for lat in range(3):
                if lat == ongoing_lat:
                    continue
                seq = [(lon, ongoing_lat)] * h + [(lon, lat)] * (H - h)
                out.append(seq[:H])
        out.append([(lon, ongoing_lat)] * H)
    return np.asarray(out, dtype=np.int32)  # [P, H, 2]


class EUDMResult(NamedTuple):
    best_policy: jnp.ndarray     # [] int32 index into the action script
    action_script: jnp.ndarray   # [P, H, 2]
    scores: jnp.ndarray          # [P]
    valid: jnp.ndarray           # [P] bool
    trajs: jnp.ndarray           # [P, T+1, A, 6]
    behavior: jnp.ndarray        # [] int32 first differing lat action (or LK)
    desired_vel: jnp.ndarray     # [] velocity command


def _lon_desired_vel(lon_action, v_now, cfg: EUDMConfig):
    """eudm_planner.cc:383-409: lon action -> IDM desired velocity."""
    v_base = jnp.floor(v_now)
    v_des = jnp.asarray(cfg.desired_velocity, v_now.dtype)
    acc = jnp.minimum(v_base + cfg.acc_cmd_vel_gap, v_des)
    dec = jnp.minimum(jnp.maximum(v_base - cfg.dec_cmd_vel_gap, 0.0), v_des)
    mai = jnp.minimum(v_base, v_des)
    return jnp.where(lon_action == ACCEL, acc,
                     jnp.where(lon_action == DECEL, dec, mai))


def eudm_plan(lane_set: LaneSet, states, lane_ids, geom_: fsim.AgentGeom,
              ego_idx: int, p: fsim.SimParam, cfg: EUDMConfig) -> EUDMResult:
    """One EUDM decision: simulate every DCP-tree leaf, pick the best.

    states [A, 6]; lane_ids [A] current lanes. Returns per-policy trajs of
    shape [P, H*steps_per_layer + 1, A, 6].
    """
    script = jnp.asarray(dcp_action_script(cfg.tree_height))   # [P, H, 2]
    P, H = script.shape[0], script.shape[1]
    spl = cfg.steps_per_layer
    A = states.shape[0]
    agent_vel = states[:, fsim.V]
    ego_lanes = behavior_lane_ids(lane_set, lane_ids[ego_idx])  # [3]

    def sim_policy(actions):
        """actions [H, 2] -> (traj [H*spl+1, A, 6], valid, score)."""
        # per-layer ego lane id and desired velocity
        lat_seq = actions[:, 1]
        lane_seq = ego_lanes[lat_seq]                          # [H]
        lane_ok = jnp.all(lane_seq >= 0)
        v0 = states[ego_idx, fsim.V]

        def layer_body(carry, h):
            s, = carry
            lane_id_h = jnp.maximum(lane_seq[h], 0)
            ids = lane_ids.at[ego_idx].set(lane_id_h)
            lanes = _gather_lane(lane_set, ids)
            v_cmd = _lon_desired_vel(actions[h, 0], s[ego_idx, fsim.V], cfg)
            desired = agent_vel.at[ego_idx].set(v_cmd)

            def step_body(ss, _):
                nxt = fsim.multi_agent_step(lanes, ss, geom_, desired, p,
                                            cfg.step)
                return nxt, nxt

            s_end, layer_traj = jax.lax.scan(step_body, s, None, length=spl)
            return (s_end,), layer_traj

        (_,), traj_layers = jax.lax.scan(layer_body, (states,),
                                         jnp.arange(H))
        traj = jnp.concatenate([states[None],
                                traj_layers.reshape(H * spl, A, -1)], axis=0)

        # --- costs (eudm_planner.cc:1078-1199), per layer, discounted ---
        vT = traj[::spl, ego_idx, fsim.V][1:]                  # [H] layer-end v
        lack = jnp.where(vT < cfg.desired_velocity,
                         cfg.ego_lack_speed_unit_cost
                         * jnp.abs(vT - cfg.desired_velocity), 0.0)
        disc = cfg.discount_factor ** jnp.arange(H, dtype=traj.dtype)
        cost_eff = jnp.sum(disc * lack * cfg.layer_time)

        hits = _ego_collisions(traj, ego_idx, geom_)
        dv = jnp.abs(traj[:, ego_idx, fsim.V][:, None] - traj[..., fsim.V])
        cost_safety = jnp.sum(jnp.where(hits, 0.1 * (1.0 + dv), 0.0))

        n_changes = jnp.sum(lat_seq[1:] != lat_seq[:-1])
        cost_nav = cfg.lane_change_unit_cost * (
            n_changes.astype(traj.dtype)
            * jnp.maximum(v0, 1.0) / jnp.maximum(cfg.desired_velocity, 1.0))

        collided = hits.any()
        valid = lane_ok & ~collided
        score = cost_eff + cost_safety + cost_nav
        return traj, jnp.where(valid, score, jnp.inf), valid

    trajs, scores, valid = jax.vmap(sim_policy)(script)
    best = jnp.argmin(scores).astype(jnp.int32)
    # the executed behavior = first lat action that differs from ongoing (LK)
    lat_best = script[best, :, 1]
    differs = lat_best != lat_best[0]
    behavior = jnp.where(differs.any(), lat_best[jnp.argmax(differs)],
                         lat_best[0])
    v_end = trajs[best, cfg.steps_per_layer, ego_idx, fsim.V]
    return EUDMResult(best_policy=best, action_script=script, scores=scores,
                      valid=valid, trajs=trajs, behavior=behavior,
                      desired_vel=v_end)
