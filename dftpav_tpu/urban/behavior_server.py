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
            self._plan = jax.jit(lambda st, ids: eudm_mod.eudm_plan(
                lane_set, st, ids, geom, ego_idx, self.p, self.cfg))
        else:
            raise ValueError(planner)

    def lock_to_hmi(self, behavior: int | None):
        """Pin the lateral behavior (None releases the lock)."""
        self.hmi_behavior = behavior

    def tick(self, states) -> BehaviorDecision:
        """One decision cycle on the current agent states [A, 6]."""
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
        behavior = int(res.behavior)
        lanes3 = np.asarray(mpdm_mod.behavior_lane_ids(
            self.lane_set, jnp.asarray(ego_lane)))
        return BehaviorDecision(
            behavior=behavior,
            ref_lane_id=int(lanes3[behavior]),
            desired_vel=float(res.desired_vel),
            forward_traj=np.asarray(res.trajs[int(res.best_policy)]),
            valid=bool(res.valid[int(res.best_policy)]))
