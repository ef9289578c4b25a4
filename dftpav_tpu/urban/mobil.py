"""MOBIL lane-change model + lateral behavior prediction, vectorized.

Reference: common::MobilLaneChangingModel (mobil_model.cc) and
common::MobilBehaviorPrediction (mobil_behavior_prediction.cc). Used by the
semantic map manager to predict surrounding agents' lateral behaviors
(semantic_map_manager.cc:152-218), which the behavior planners consume.

TPU shape: one call evaluates MOBIL for ALL agents at once — the per-lane
leading/following lookups are the [A, A] Frenet matrices from forward_sim;
gains and probabilities are elementwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban.idm import IDMParam, acc_acc
from dftpav_tpu.urban.lane import Lane, LaneSet
from dftpav_tpu.urban.rss import RssConfig, rss_safe


class MobilResult(NamedTuple):
    prob: jnp.ndarray      # [..., 3] probabilities over (LK, LCL, LCR)
    gain_left: jnp.ndarray
    gain_right: jnp.ndarray
    lcl_safe: jnp.ndarray  # bool
    lcr_safe: jnp.ndarray


def _idm_acc_pair(rear_s, rear_v, front_s, front_v, has_front, v_des):
    """GetDesiredAccelerationUsingIdm (mobil_model.cc:132-149): ACC accel of
    the rear vehicle; without a front vehicle a virtual one sits
    100 + 10 v ahead."""
    p = IDMParam(desired_velocity=jnp.maximum(v_des, 1e-3))
    s_front = jnp.where(has_front, front_s, rear_s + 100.0 + rear_v * 10.0)
    v_front = jnp.where(has_front, front_v, rear_v)
    return acc_acc(p, rear_s, rear_v, s_front, v_front)


def _normalize_with_bound(v, lo=-1.0, hi=6.0):
    """normalize_with_bound(v, -1, 6, 0, 1) (mobil_behavior_prediction.cc:9-18)."""
    return jnp.clip((v - lo) / (hi - lo), 0.0, 1.0)


def _neighbors_on_lane(lane: Lane, states, geom, idx):
    """(leading, following) Frenet info of agent `idx` on `lane`:
    (s_lead, v_lead, has_lead, s_follow, v_follow, has_follow, ego_s, ego_d)."""
    s_all, d_all = lane_mod.frenet_of_point(lane, states[:, 0:2])
    A = states.shape[0]
    ego_s = s_all[idx]
    near = (jnp.abs(d_all) < fsim.LAT_RANGE) & (jnp.arange(A) != idx)
    ahead = near & (s_all > ego_s + 1e-6)
    behind = near & (s_all < ego_s - 1e-6)
    j_lead = jnp.argmin(jnp.where(ahead, s_all, jnp.inf))
    j_fol = jnp.argmax(jnp.where(behind, s_all, -jnp.inf))
    return (s_all[j_lead], states[j_lead, fsim.V], ahead.any(),
            s_all[j_fol], states[j_fol, fsim.V], behind.any(),
            ego_s, d_all[idx])


def mobil_predict(lane_set: LaneSet, states, lane_ids, geom,
                  agent_idx, politeness: float = 0.0,
                  rss_cfg: RssConfig = RssConfig()) -> MobilResult:
    """Lateral behavior probability for one agent.

    Reference: MobilBehaviorPrediction::LateralBehaviorPrediction
    (mobil_behavior_prediction.cc:53-160): compute MOBIL acceleration gains
    on the left/right neighbor lanes (politeness 0 as deployed), gate with
    RSS front/rear safety on the target lane, then remap gains to a
    (LK, LCL, LCR) probability vector with bounds (-1, 6).
    """
    from dftpav_tpu.urban.mpdm import _gather_lane, behavior_lane_ids

    v_ego = states[agent_idx, fsim.V]
    lanes3 = behavior_lane_ids(lane_set, lane_ids[agent_idx])   # [3]

    cur_lane = _gather_lane(lane_set, lanes3[0])
    (ls, lv, hl, fs_, fv, hf, ego_s, _d) = _neighbors_on_lane(
        cur_lane, states, geom, agent_idx)
    # current lane: old follower's acc before/after ego leaves + ego's acc
    acc_o = _idm_acc_pair(fs_, fv, ego_s, v_ego, hf & True, fv)
    acc_o_tilda = _idm_acc_pair(fs_, fv, ls, lv, hf & hl, fv)
    acc_c = _idm_acc_pair(ego_s, v_ego, ls, lv, hl, v_ego)
    no_follow = ~hf | (jnp.abs(fv) < 1e-3)
    acc_o = jnp.where(no_follow, 0.0, acc_o)
    acc_o_tilda = jnp.where(no_follow, 0.0, acc_o_tilda)

    def target_gain(lane_id, valid):
        lane_t = _gather_lane(lane_set, jnp.maximum(lane_id, 0))
        (ls_t, lv_t, hl_t, fs_t, fv_t, hf_t, s_t, d_t) = _neighbors_on_lane(
            lane_t, states, geom, agent_idx)
        # RSS safety vs new leader and follower (mobil_model.cc:77-88)
        front_safe = ~hl_t | rss_safe(s_t, d_t, v_ego, 0.0, ls_t, d_t,
                                      lv_t, 0.0, rss_cfg)
        rear_safe = ~hf_t | rss_safe(s_t, d_t, v_ego, 0.0, fs_t, d_t,
                                     fv_t, 0.0, rss_cfg)
        safe = valid & front_safe & rear_safe
        acc_n = _idm_acc_pair(fs_t, fv_t, ls_t, lv_t, hf_t & hl_t, fv_t)
        acc_n_tilda = _idm_acc_pair(fs_t, fv_t, s_t, v_ego, hf_t, fv_t)
        acc_c_tilda = _idm_acc_pair(s_t, v_ego, ls_t, lv_t, hl_t, v_ego)
        nf = ~hf_t | (jnp.abs(fv_t) < 1e-3)
        acc_n = jnp.where(nf, 0.0, acc_n)
        acc_n_tilda = jnp.where(nf, 0.0, acc_n_tilda)
        gain = (acc_c_tilda - acc_c) + politeness * (
            (acc_n_tilda - acc_n) + (acc_o_tilda - acc_o))
        return jnp.where(safe, gain, -jnp.inf), safe

    gain_l, lcl_safe = target_gain(lanes3[1], lanes3[1] >= 0)
    gain_r, lcr_safe = target_gain(lanes3[2], lanes3[2] >= 0)

    # RemapGainsToProb (mobil_behavior_prediction.cc:5-52)
    gl = _normalize_with_bound(gain_l)
    gr = _normalize_with_bound(gain_r)
    gk = _normalize_with_bound(1.0)
    both = lcl_safe & lcr_safe
    tot = gk + gl + gr
    p_both = jnp.stack([gk / tot, gl / tot, gr / tot])
    p_left = jnp.stack([1.0 - gl, gl, jnp.zeros_like(gl)])
    p_right = jnp.stack([1.0 - gr, jnp.zeros_like(gr), gr])
    p_none = jnp.asarray([1.0, 0.0, 0.0], states.dtype)
    prob = jnp.where(both, p_both,
                     jnp.where(lcl_safe, p_left,
                               jnp.where(lcr_safe, p_right, p_none)))
    # near-stop -> lane keeping (mobil_behavior_prediction.cc:78-86)
    stopped = jnp.abs(v_ego) < 1e-3
    prob = jnp.where(stopped, p_none, prob)
    return MobilResult(prob=prob, gain_left=gain_l, gain_right=gain_r,
                       lcl_safe=lcl_safe & ~stopped,
                       lcr_safe=lcr_safe & ~stopped)


def predict_all(lane_set: LaneSet, states, lane_ids, geom,
                politeness: float = 0.0) -> jnp.ndarray:
    """[A, 3] behavior probabilities for every agent (vmapped mobil_predict).

    This is the batched equivalent of the semantic map manager's per-vehicle
    prediction loop (semantic_map_manager.cc:152-218).
    """
    A = states.shape[0]
    return jax.vmap(lambda i: mobil_predict(
        lane_set, states, lane_ids, geom, i, politeness).prob)(jnp.arange(A))
