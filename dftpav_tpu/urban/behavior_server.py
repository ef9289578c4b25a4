"""Behavior planner server: the 20 Hz decision loop around MPDM/EUDM.

Reference: planning::BehaviorPlannerServer
(src/Sim/core/behavior_planner/src/behavior_planner/behavior_server_ros.cc:
78-120): a fixed-rate loop that snapshots the semantic map, runs the behavior
planner (autonomous level >= 3 enables MPDM, behavior_planner.cc:108-123),
applies the HMI lock (MultiBehaviorJudge, :229-238), and publishes
SemanticBehavior{lat_behavior, ref_lane, forward_trajs} downstream.

Host-side object (the loop cadence is host logic); the per-tick decision is
one jitted device call. Works with either the MPDM or the EUDM planner.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from dftpav_tpu.urban import eudm as eudm_mod
from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import mpdm as mpdm_mod
from dftpav_tpu.urban import semantic_map
from dftpav_tpu.urban.lane import LaneSet


@dataclasses.dataclass
class BehaviorDecision:
    behavior: int           # mpdm.{LK,LCL,LCR}
    ref_lane_id: int
    desired_vel: float
    forward_traj: np.ndarray   # [T+1, A, 6] winning policy rollout
    valid: bool
    ongoing_lat: int = 0    # the DCP root this decision was planned from


@dataclasses.dataclass
class EudmSnapshot:
    """The EudmManager cross-tick context (eudm_manager.cc:41-93, 349):
    the last winning action sequence + stamp locates the ongoing action by
    elapsed time; a committed lane change (lc context) is carried until the
    ego reaches its target lane, then the root collapses to LK."""

    action_seq: np.ndarray      # [H, 2] winner (lon, lat) sequence
    stamp: float                # decision wall time (seq start)
    valid: bool = True
    risky: bool = False
    # committed-lane-change context (UpdateLaneChangeContextByTask)
    lc_lat: int = 0             # 0 = none committed
    lc_target: int = -1         # target lane id of the committed change


class BehaviorServer:
    """Fixed-cadence behavior decisions with HMI lock and level gating.

    autonomous_level semantics follow the reference (behavior_planner.cc:
    108-123): < 3 -> always lane-keep (no MPDM); >= 3 -> planner decides.
    `lock_to_hmi(behavior)` pins the output to an operator-requested
    behavior while it remains among the valid candidates (:229-238).
    """

    def __init__(self, lane_set: LaneSet, geom: fsim.AgentGeom, ego_idx: int,
                 planner: str = "mpdm", autonomous_level: int = 3,
                 sim_param: fsim.SimParam | None = None,
                 cfg=None):
        self.lane_set = lane_set
        self.geom = geom
        self.ego_idx = ego_idx
        self.level = autonomous_level
        self.p = sim_param or fsim.SimParam()
        self.planner = planner
        self.hmi_behavior: int | None = None
        if planner == "mpdm":
            self.cfg = cfg or mpdm_mod.MPDMConfig()
            self._plan = jax.jit(lambda st, ids: mpdm_mod.mpdm_plan(
                lane_set, st, ids, geom, ego_idx, self.p, self.cfg))
        elif planner == "eudm":
            self.cfg = cfg or eudm_mod.EUDMConfig()
            # script is a traced argument: ONE compiled planner serves any
            # DCP root (the manager threads the ongoing action through it)
            self._plan = jax.jit(lambda st, ids, script: eudm_mod.eudm_plan(
                lane_set, st, ids, geom, ego_idx, self.p, self.cfg,
                script=script))
            self._snapshot: EudmSnapshot | None = None
        else:
            raise ValueError(planner)

    def lock_to_hmi(self, behavior: int | None):
        """Pin the lateral behavior (None releases the lock)."""
        self.hmi_behavior = behavior

    def ongoing_lat_action(self, states, stamp: float) -> int:
        """The manager's ongoing lateral action at `stamp`
        (GetReplanDesiredAction, eudm_manager.cc:881-905): index the last
        winning sequence by elapsed time; a committed lane change whose
        target lane the ego has reached is completed and collapses the
        root to LK (lc_context_.completed, eudm_manager.cc:93-96)."""
        snap = getattr(self, "_snapshot", None)
        if snap is None or not snap.valid:
            return mpdm_mod.LK
        if snap.lc_lat != mpdm_mod.LK and snap.lc_target >= 0:
            near = int(semantic_map.nearest_lane(
                self.lane_set, jnp.asarray(states)[self.ego_idx, 0:2],
                jnp.asarray(states)[self.ego_idx, fsim.TH]))
            if near == snap.lc_target:
                # lane change completed -> clear the lc context
                self._snapshot = dataclasses.replace(
                    snap, lc_lat=mpdm_mod.LK, lc_target=-1)
                return mpdm_mod.LK
        H = snap.action_seq.shape[0]
        elapsed = stamp - snap.stamp
        if elapsed < 0.0:
            return mpdm_mod.LK
        idx = min(int(elapsed / self.cfg.layer_time), H - 1)
        return int(snap.action_seq[idx, 1])

    def tick(self, states, stamp: float | None = None) -> BehaviorDecision:
        """One decision cycle on the current agent states [A, 6].

        `stamp` (wall time, seconds) drives the EUDM manager context: the
        previous tick's committed action, located by elapsed time in the
        last winning sequence, becomes the root of this tick's DCP tree.
        Without a stamp the planner roots at the previous tick's first
        action (20 Hz-tick approximation)."""
        lane_ids = jnp.maximum(
            semantic_map.associate_lanes(self.lane_set, states), 0)
        ego_lane = int(lane_ids[self.ego_idx])

        if self.level < 3:
            # no autonomous behavior planning: lane keep at current speed
            traj = fsim.rollout(
                jax.tree.map(lambda f: f[lane_ids], self.lane_set.lanes),
                states, self.geom, states[:, fsim.V], self.p, 0.4, 10)
            return BehaviorDecision(
                behavior=mpdm_mod.LK, ref_lane_id=ego_lane,
                desired_vel=float(states[self.ego_idx, fsim.V]),
                forward_traj=np.asarray(traj), valid=True)

        if self.planner == "eudm":
            if stamp is None:
                stamp = getattr(self, "_auto_stamp", 0.0)
                self._auto_stamp = stamp + 0.05
            ongoing = self.ongoing_lat_action(np.asarray(states), stamp)
            script = jnp.asarray(
                eudm_mod.dcp_action_script(self.cfg.tree_height, ongoing))
            res = self._plan(states, lane_ids, script)
        else:
            res = self._plan(states, lane_ids)
        if self.planner == "mpdm":
            behavior = int(res.behavior)
            valid = np.asarray(res.valid)
            if (self.hmi_behavior is not None
                    and valid[self.hmi_behavior]):
                behavior = self.hmi_behavior
            lanes3 = np.asarray(
                mpdm_mod.behavior_lane_ids(self.lane_set,
                                           jnp.asarray(ego_lane)))
            return BehaviorDecision(
                behavior=behavior,
                ref_lane_id=int(lanes3[behavior]),
                desired_vel=float(res.desired_vel),
                forward_traj=np.asarray(res.trajs[behavior]),
                valid=bool(valid[behavior]))
        # EUDM: behavior is the first lateral switch of the best leaf
        # (relative to the ongoing root); the manager snapshot carries the
        # winning sequence into the next tick's context
        behavior = int(res.behavior)
        lanes3 = np.asarray(mpdm_mod.behavior_lane_ids(
            self.lane_set, jnp.asarray(ego_lane)))
        best = int(res.best_policy)
        winner_seq = np.asarray(res.action_script[best])       # [H, 2]
        snap = EudmSnapshot(
            action_seq=winner_seq, stamp=float(stamp),
            valid=bool(res.valid[best]), risky=bool(res.risky[best]))
        # commit a lane change the winner prescribes anywhere in its
        # sequence (UpdateLaneChangeContextByTask: the decided change
        # becomes the lc context until completed)
        lat_seq = winner_seq[:, 1]
        change = lat_seq[lat_seq != mpdm_mod.LK]
        if change.size and snap.valid:
            snap.lc_lat = int(change[0])
            snap.lc_target = int(lanes3[snap.lc_lat])
        self._snapshot = snap
        return BehaviorDecision(
            behavior=behavior,
            ref_lane_id=int(lanes3[behavior]),
            desired_vel=float(res.desired_vel),
            forward_traj=np.asarray(res.trajs[best]),
            valid=bool(res.valid[best]),
            ongoing_lat=ongoing)
