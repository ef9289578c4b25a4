"""EUDM behavior planning: DCP-tree guided branching over semantic action
sequences, CFB belief branching over surrounding-vehicle intentions, batched
forward simulation, layered cost evaluation with the typed RSS safety ladder.

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

CFB (conditional focused branching): the reference scaffolds sub-scenario
branching over surrounding-vehicle intentions but runs only the default
scenario (`n_sub_threads = 1`, eudm_planner.cc:729-732 "Currently, we use
n_sub_threads = 1 ... Here use the default scenario"); the belief state it
would branch on is `ForwardSimAgent.lat_probs` (eudm_planner.cc:236, fed by
SemanticMapManager's probs_lat_behaviors). Here the branching is realized the
TPU way: belief combinations over designated uncertain agents are a second
`vmap` axis [C] on top of the policy axis [P]; per-policy score is the
belief-probability-weighted expectation and a policy is invalid if any
focused belief (probability above the prune threshold) makes it unsafe.

RSS safety ladder (eudm_planner.cc:987-1030 EvaluateSafetyStatus + per-
surround accumulation :1157-1168): each simulated step of each surrounding
vehicle is RSS-typed against the ego on the evaluation lane; TooFast states
cost `lin * v_ego * 10^(pow * |v_ego - rss_vel_up|)` (coeffs
eudm_config.pb.txt:16-20), TooSlow analogously with rss_vel_low; layer cost
is `(eff + safety/2 + nav) * duration * discount^layer`
(CostStructure::ave, eudm_planner.h:110-130; weight :1225, discount :694).

Mid-horizon lateral re-planning (UpdateLateralActionSequence,
eudm_planner.cc:656-668, 772-851) IS modeled: when the simulated ego
completes a lane change at a layer boundary, the remaining lateral actions
re-base via `_LAT_XFORM` and the reference lane advances (see _sim_policy).
The EudmManager cross-tick context (ongoing action as next tree root,
lc-completion collapse) lives in urban/behavior_server.py.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban import rss as rss_mod
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
    # RSS safety ladder (eudm_config.pb.txt:15-20)
    rss: rss_mod.RssConfig = rss_mod.RssConfig()
    rss_cost_enable: bool = True
    rss_over_speed_power_coeff: float = 0.25
    rss_over_speed_linear_coeff: float = 0.5
    rss_lack_speed_power_coeff: float = 0.35
    rss_lack_speed_linear_coeff: float = 0.6
    # CFB focus threshold: beliefs below this probability are pruned from
    # the validity gate (they still carry ~no weight in the expectation)
    belief_prune_prob: float = 0.05

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
    trajs: jnp.ndarray           # [P, T+1, A, 6] (CFB: most-likely belief)
    behavior: jnp.ndarray        # [] int32 first differing lat action (or LK)
    desired_vel: jnp.ndarray     # [] velocity command
    risky: jnp.ndarray           # [P] bool RSS-unsafe under any focused belief


def _lon_desired_vel(lon_action, v_now, cfg: EUDMConfig):
    """eudm_planner.cc:383-409: lon action -> IDM desired velocity."""
    v_base = jnp.floor(v_now)
    v_des = jnp.asarray(cfg.desired_velocity, v_now.dtype)
    acc = jnp.minimum(v_base + cfg.acc_cmd_vel_gap, v_des)
    dec = jnp.minimum(jnp.maximum(v_base - cfg.dec_cmd_vel_gap, 0.0), v_des)
    mai = jnp.minimum(v_base, v_des)
    return jnp.where(lon_action == ACCEL, acc,
                     jnp.where(lon_action == DECEL, dec, mai))


def _frenet_time_states(eval_lane, traj):
    """Frenet (s, vs, d, vd) of every agent state in traj [..., A, 6]."""
    fs = lane_mod.frenet_of_state(eval_lane, traj[..., 0:2],
                                  traj[..., fsim.TH], traj[..., fsim.V])
    vd = fs.s_dot * fs.d_prime            # dd/dt = (dd/ds)(ds/dt)
    return fs.s, fs.s_dot, fs.d, vd


def _rss_ladder(traj, ego_idx, eval_lane, geom_: fsim.AgentGeom,
                cfg: EUDMConfig, H: int, spl: int):
    """Per-layer RSS safety cost + riskiness.

    traj [T+1, A, 6] with T = H * spl. Reproduces EvaluateSafetyStatus
    (eudm_planner.cc:987-1030): each step of each surrounding vehicle is
    typed against the ego on the RSS lane; the ladder cost accumulates per
    layer over steps and surrounding vehicles (:1157-1168).
    Returns (rss_cost [H], risky [] bool).
    """
    A = traj.shape[-2]
    s, vs, d, vd = _frenet_time_states(eval_lane, traj[1:])   # [T, A]
    es, evs, ed, evd = (x[:, ego_idx] for x in (s, vs, d, vd))

    gl = lambda f: f[ego_idx]
    safe, typ, v_low, v_up = rss_mod.rss_check_typed(
        es[:, None], ed[:, None], evs[:, None], evd[:, None],
        s, d, vs, vd,
        gl(geom_.length), gl(geom_.width), gl(geom_.d_cr),
        geom_.length[None, :], geom_.width[None, :], geom_.d_cr[None, :],
        cfg.rss)                                              # [T, A]
    not_self = jnp.arange(A)[None, :] != ego_idx
    unsafe = ~safe & not_self

    v_ego = evs[:, None]
    cost_fast = (cfg.rss_over_speed_linear_coeff * v_ego
                 * 10.0 ** (cfg.rss_over_speed_power_coeff
                            * jnp.abs(v_ego - v_up)))
    cost_slow = (cfg.rss_lack_speed_linear_coeff * v_ego
                 * 10.0 ** (cfg.rss_lack_speed_power_coeff
                            * jnp.abs(v_ego - v_low)))
    step_cost = jnp.where(
        unsafe & (typ == rss_mod.TOO_FAST), cost_fast,
        jnp.where(unsafe & (typ == rss_mod.TOO_SLOW), cost_slow, 0.0))
    if not cfg.rss_cost_enable:
        step_cost = jnp.zeros_like(step_cost)
    rss_cost = jnp.sum(step_cost.reshape(H, spl, A), axis=(1, 2))  # [H]
    return rss_cost, unsafe.any()


_LAT_INVALID = 3
# lateral-finish transforms (UpdateLateralActionSequence,
# eudm_planner.cc:772-820): after completing a lane change, the remaining
# sequence re-bases — same-direction -> LK ("LLLLL -> LLKKK"), LK -> the
# opposite direction ("LLKKK -> LLRRR"), opposite -> invalid ("LLRRR -> x").
# Indexed [dir - 1][action] with dir in {LCL(1), LCR(2)}, INVALID absorbing.
_LAT_XFORM = np.array([
    [2, 0, _LAT_INVALID, _LAT_INVALID],   # completed LCL: LK->LCR, LCL->LK
    [1, _LAT_INVALID, 0, _LAT_INVALID],   # completed LCR: LK->LCL, LCR->LK
], dtype=np.int32)


def _sim_policy(actions, agent_lane_ids, lane_set, states, geom_, ego_idx,
                p: fsim.SimParam, cfg: EUDMConfig, ego_lanes, agent_vel):
    """Simulate one DCP leaf under one surrounding-behavior belief.

    actions [H, 2]; agent_lane_ids [A] the belief's lane assignment for the
    surrounding agents (ego's entry is overridden per layer by its lateral
    action). Returns (traj [H*spl+1, A, 6], score, valid, risky).

    Mid-rollout lateral completion follows the reference
    (CheckIfLateralActionFinished + UpdateLateralActionSequence,
    eudm_planner.cc:656-668, 772-851): when the simulated ego reaches its
    lane-change target lane at a layer boundary, the reference lane for
    subsequent actions becomes the new lane and the remaining lateral
    actions re-base via _LAT_XFORM (an invalid re-base kills the policy).
    """
    from dftpav_tpu.urban import semantic_map as smap

    H = actions.shape[0]
    spl = cfg.steps_per_layer
    A = states.shape[0]
    lat_seq = actions[:, 1]
    v0 = states[ego_idx, fsim.V]
    xform = jnp.asarray(_LAT_XFORM)
    ident = jnp.arange(4, dtype=jnp.int32)
    ref_lane0 = jnp.maximum(ego_lanes[0], 0)

    def layer_body(carry, h):
        s, ref_lane, lat_map, ok = carry
        eff_lat = lat_map[lat_seq[h]]                      # re-based action
        cand = behavior_lane_ids(lane_set, ref_lane)       # [3] from ref
        tgt = cand[jnp.minimum(eff_lat, 2)]
        ok = ok & (eff_lat != _LAT_INVALID) & (tgt >= 0)
        lane_id_h = jnp.where(ok, jnp.maximum(tgt, 0), ref_lane)
        ids = agent_lane_ids.at[ego_idx].set(lane_id_h)
        lanes = _gather_lane(lane_set, ids)
        v_cmd = _lon_desired_vel(actions[h, 0], s[ego_idx, fsim.V], cfg)
        desired = agent_vel.at[ego_idx].set(v_cmd)

        def step_body(ss, _):
            nxt = fsim.multi_agent_step(lanes, ss, geom_, desired, p,
                                        cfg.step)
            return nxt, nxt

        s_end, layer_traj = jax.lax.scan(step_body, s, None, length=spl)

        # lateral-finish check at the layer boundary: ego's nearest lane
        # reached the lane-change target (potential-lane membership,
        # eudm_planner.cc:823-851, on a flat lane net = the target itself)
        near = smap.nearest_lane(lane_set, s_end[ego_idx, 0:2],
                                 s_end[ego_idx, fsim.TH])
        finished = (eff_lat == 1) | (eff_lat == 2)
        finished = finished & (near == lane_id_h)
        dir_row = jnp.maximum(eff_lat - 1, 0)
        lat_map_next = jnp.where(finished, xform[dir_row][lat_map], lat_map)
        ref_next = jnp.where(finished, lane_id_h, ref_lane)
        return (s_end, ref_next, lat_map_next, ok), layer_traj

    (_, _, _, lane_ok), traj_layers = jax.lax.scan(
        layer_body, (states, ref_lane0, ident, ego_lanes[0] >= 0),
        jnp.arange(H))
    traj = jnp.concatenate([states[None],
                            traj_layers.reshape(H * spl, A, -1)], axis=0)

    # --- costs (eudm_planner.cc:1078-1199), per layer, discounted ---
    vT = traj[::spl, ego_idx, fsim.V][1:]                  # [H] layer-end v
    lack = jnp.where(vT < cfg.desired_velocity,
                     cfg.ego_lack_speed_unit_cost
                     * jnp.abs(vT - cfg.desired_velocity), 0.0)
    disc = cfg.discount_factor ** jnp.arange(H, dtype=traj.dtype)

    # RSS ladder on the ego's current (evaluation) lane (rss_lane_,
    # eudm_planner.cc:896-908 uses the ego behavior lane)
    eval_lane = _gather_lane(lane_set, jnp.maximum(ego_lanes[0], 0))
    rss_cost, risky = _rss_ladder(traj, ego_idx, eval_lane, geom_, cfg,
                                  H, spl)
    # CostStructure::ave: safety contributes (rss + occu)/2 per layer
    cost_safety_rss = jnp.sum(disc * 0.5 * rss_cost * cfg.layer_time)

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
    score = cost_eff + cost_safety + cost_safety_rss + cost_nav
    return traj, jnp.where(valid, score, jnp.inf), valid, risky


def _finalize(script, trajs, scores, valid, risky, ego_idx,
              cfg: EUDMConfig) -> EUDMResult:
    best = jnp.argmin(scores).astype(jnp.int32)
    # the executed behavior = first lat action that differs from ongoing (LK)
    lat_best = script[best, :, 1]
    differs = lat_best != lat_best[0]
    behavior = jnp.where(differs.any(), lat_best[jnp.argmax(differs)],
                         lat_best[0])
    v_end = trajs[best, cfg.steps_per_layer, ego_idx, fsim.V]
    return EUDMResult(best_policy=best, action_script=script, scores=scores,
                      valid=valid, trajs=trajs, behavior=behavior,
                      desired_vel=v_end, risky=risky)


def eudm_plan(lane_set: LaneSet, states, lane_ids, geom_: fsim.AgentGeom,
              ego_idx: int, p: fsim.SimParam, cfg: EUDMConfig,
              script=None, ongoing_lat: int = 0) -> EUDMResult:
    """One EUDM decision under the observed (default) belief: simulate every
    DCP-tree leaf, pick the best.

    states [A, 6]; lane_ids [A] current lanes. Returns per-policy trajs of
    shape [P, H*steps_per_layer + 1, A, 6].

    `ongoing_lat` roots the DCP tree at the manager's ongoing lateral
    action (EudmManager::Prepare -> UpdateDcpTree, eudm_manager.cc:82-127):
    a committed lane change carries as the branch root of the next tick's
    tree instead of re-planning from LK. `script` may pass the [P, H, 2]
    action table directly (it can be a traced argument — the policy axis
    only feeds gathers — letting one jitted planner serve any root).
    """
    if script is None:
        script = jnp.asarray(dcp_action_script(cfg.tree_height,
                                               ongoing_lat))  # [P, H, 2]
    agent_vel = states[:, fsim.V]
    ego_lanes = behavior_lane_ids(lane_set, lane_ids[ego_idx])  # [3]

    trajs, scores, valid, risky = jax.vmap(
        lambda a: _sim_policy(a, lane_ids, lane_set, states, geom_, ego_idx,
                              p, cfg, ego_lanes, agent_vel))(script)
    return _finalize(script, trajs, scores, valid, risky, ego_idx, cfg)


def cfb_belief_combos(sur_lat_probs: np.ndarray,
                      uncertain_idx: Sequence[int]):
    """Host-side CFB combo table: ([C, U] lat actions, [C] raw probabilities).

    C = 3^U combinations of {LK, LCL, LCR} over the focused agents; each
    combo's probability is the product of the agents' belief entries
    (independent intentions, as ForwardSimAgent.lat_probs treats them).
    """
    U = len(uncertain_idx)
    combos = np.asarray(list(itertools.product(range(3), repeat=U)),
                        dtype=np.int32).reshape(3 ** U, U)
    probs = np.ones(combos.shape[0])
    for j, u in enumerate(uncertain_idx):
        probs *= np.asarray(sur_lat_probs)[u, combos[:, j]]
    return combos, probs


def eudm_plan_cfb(lane_set: LaneSet, states, lane_ids,
                  geom_: fsim.AgentGeom, ego_idx: int, p: fsim.SimParam,
                  cfg: EUDMConfig, sur_lat_probs,
                  uncertain_idx: Sequence[int], script=None,
                  ongoing_lat: int = 0) -> EUDMResult:
    """EUDM with CFB belief branching over surrounding-vehicle intentions.

    sur_lat_probs [A, 3]: per-agent probability of {LK, LCL, LCR} (rows for
    non-focused agents are ignored); uncertain_idx: static tuple of agent
    indices to branch (the "focused" vehicles — CFB prunes to the agents
    that matter, here chosen by the caller e.g. nearest/risky agents).

    Per policy: score = E_beliefs[score], valid = no focused belief
    (probability > belief_prune_prob after renormalization) is unsafe.
    Reported trajs are from the most-likely belief. `script`/`ongoing_lat`
    as in eudm_plan (manager context threading).
    """
    if script is None:
        script = jnp.asarray(dcp_action_script(cfg.tree_height,
                                               ongoing_lat))   # [P, H, 2]
    agent_vel = states[:, fsim.V]
    ego_lanes = behavior_lane_ids(lane_set, lane_ids[ego_idx])  # [3]

    combos_np, probs_np = cfb_belief_combos(sur_lat_probs, uncertain_idx)
    combos = jnp.asarray(combos_np)                            # [C, U]
    probs = jnp.asarray(probs_np, states.dtype)                # [C]

    # per-combo surrounding lane assignment; a combo whose behavior has no
    # target lane (e.g. LCL with no left neighbor) gets zero probability
    def combo_lanes(combo):
        ids = lane_ids
        ok = jnp.asarray(True)
        for j, u in enumerate(uncertain_idx):
            cand = behavior_lane_ids(lane_set, lane_ids[u])    # [3]
            tgt = cand[combo[j]]
            ok = ok & (tgt >= 0)
            ids = ids.at[u].set(jnp.maximum(tgt, 0))
        return ids, ok

    combo_ids, combo_ok = jax.vmap(combo_lanes)(combos)        # [C, A], [C]
    w = jnp.where(combo_ok, probs, 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-9)
    focused = w > cfg.belief_prune_prob

    def per_combo(ids):
        return jax.vmap(
            lambda a: _sim_policy(a, ids, lane_set, states, geom_, ego_idx,
                                  p, cfg, ego_lanes, agent_vel))(script)

    trajs_c, scores_c, valid_c, risky_c = jax.vmap(per_combo)(combo_ids)
    # trajs_c [C, P, T+1, A, 6]; scores_c/valid_c/risky_c [C, P]

    # expectation over beliefs; invalid-lane policies stay inf everywhere.
    # Renormalize the belief weights over the FINITE combos per policy:
    # zeroing a non-finite combo without renormalizing would drop that
    # belief's cost share and systematically favor policies that are
    # infeasible under low-probability beliefs.
    finite = jnp.isfinite(scores_c)
    w_fin = jnp.sum(w[:, None] * finite, axis=0)               # [P]
    scores = jnp.sum(w[:, None] * jnp.where(finite, scores_c, 0.0), axis=0) \
        / jnp.maximum(w_fin, 1e-9)
    valid = jnp.all(jnp.where(focused[:, None], valid_c, True), axis=0)
    risky = jnp.any(jnp.where(focused[:, None], risky_c, False), axis=0)
    scores = jnp.where(valid, scores, jnp.inf)

    c_star = jnp.argmax(w)
    return _finalize(script, trajs_c[c_star], scores, valid, risky,
                     ego_idx, cfg)
