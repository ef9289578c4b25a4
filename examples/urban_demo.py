"""Urban closed-loop demo: MPDM behavior -> SSC back end -> physics arena.

The equivalent of the reference's urban apps
(src/Sim/app/planning_integrated/src/test_ssc_with_mpdm.cc): a multi-lane
road, IDM+MOBIL traffic agents (onlane_ai_agent.cc), and an ego vehicle
driven by MPDM behavior selection with the SSC planner as trajectory back
end, closing the loop through the multi-vehicle physics arena.

Run:  python examples/urban_demo.py [--steps 120] [--agents 6] [--plot out.png]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dftpav_tpu.sim import arena
from dftpav_tpu.ssc import bezier_eval, ssc_plan
from dftpav_tpu.ssc.planner import SSCConfig
from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban import mpdm, semantic_map
from dftpav_tpu.urban.route import LaneGraph, RoutePlanner


def build_highway(n_lanes=3, length=600.0, lane_width=3.5):
    lanes = []
    for i in range(n_lanes):
        wps = np.stack([np.linspace(0, length, 31),
                        i * lane_width * np.ones(31)], 1)
        lanes.append(lane_mod.build_lane(wps, ds=1.0, P=1024))
    left = [i + 1 if i + 1 < n_lanes else -1 for i in range(n_lanes)]
    right = [i - 1 if i - 1 >= 0 else -1 for i in range(n_lanes)]
    lane_set = lane_mod.build_lane_set(lanes, left, right)
    graph = LaneGraph(successors=[[] for _ in range(n_lanes)],
                      lengths=[length] * n_lanes)
    return lane_set, graph


def spawn_agents(rng, n_agents, n_lanes, lane_width=3.5):
    """Ego at the origin of lane 0 plus slower traffic ahead."""
    states = [np.array([0.0, 0.0, 0.0, 8.0, 0.0, 0.0])]
    # a slow car on the ego lane forces an interactive overtake
    states.append(np.array([30.0, 0.0, 0.0, 2.0, 0.0, 0.0]))
    for i in range(n_agents - 1):
        lane = int(rng.integers(0, n_lanes))
        s = 50.0 + 60.0 * i / max(n_agents - 2, 1) + rng.uniform(-8, 8)
        v = rng.uniform(2.0, 5.0)
        states.append(np.array([s, lane * lane_width, 0.0, v, 0.0, 0.0]))
    return jnp.asarray(np.stack(states))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--behavior", choices=["mpdm", "eudm"], default="mpdm")
    ap.add_argument("--agents", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--plot", type=str, default="")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    lane_set, graph = build_highway()
    states = spawn_agents(rng, args.agents, n_lanes=3)
    A = states.shape[0]
    ones = jnp.ones(A)
    geom = fsim.AgentGeom(length=4.88 * ones, width=1.9 * ones,
                          d_cr=1.015 * ones, wheel_base=2.85 * ones)
    p = fsim.SimParam()
    cfg_mpdm = mpdm.MPDMConfig(desired_velocity=8.0)
    cfg_ssc = SSCConfig(M=5)
    router = RoutePlanner(graph, seed=args.seed)

    # the tick matches the MPDM sim resolution so the SSC-infeasible
    # fallback (one forward-sim state) advances exactly one tick
    dt_plan = cfg_mpdm.sim_resolution  # 0.4 s
    T_fwd = cfg_mpdm.n_steps           # forward sim steps (10 x 0.4 s)
    times = np.linspace(0.0, cfg_mpdm.sim_horizon, T_fwd + 1)

    use_eudm = args.behavior == "eudm"
    if use_eudm:
        from dftpav_tpu.urban import eudm as eudm_mod
        cfg_eudm = eudm_mod.EUDMConfig(desired_velocity=8.0, step=0.4,
                                       tree_height=5, layer_time=0.8)

    @jax.jit
    def plan_tick(states):
        lane_ids = semantic_map.associate_lanes(lane_set, states)
        lane_ids = jnp.maximum(lane_ids, 0)
        if use_eudm:
            eres = eudm_mod.eudm_plan(lane_set, states, lane_ids, geom, 0,
                                      p, cfg_eudm)
            lanes3 = mpdm.behavior_lane_ids(lane_set, lane_ids[0])
            dec = mpdm.MPDMResult(
                behavior=eres.behavior, desired_vel=eres.desired_vel,
                scores=eres.scores[:3], valid=eres.valid[:3],
                trajs=eres.trajs[eres.best_policy][None].repeat(3, 0),
                ref_lane_id=lanes3[eres.behavior])
            dec = dec._replace(behavior=jnp.asarray(0, jnp.int32))
        else:
            dec = mpdm.mpdm_plan(lane_set, states, lane_ids, geom, 0, p,
                                 cfg_mpdm)
        ego_traj = dec.trajs[dec.behavior]                # [T+1, A, 6]
        ref_lane = mpdm._gather_lane(lane_set, jnp.maximum(dec.ref_lane_id,
                                                           0))
        obs_trajs = jnp.moveaxis(ego_traj[:, 1:], 0, 1)   # [A-1, T+1, 6]
        res = ssc_plan(ref_lane, states[0], ego_traj[:, 0], times,
                       obs_trajs, jnp.ones(A - 1, bool),
                       geom.length[1:] / 2, geom.width[1:] / 2, cfg_ssc)
        return dec, res, ref_lane, lane_ids

    @jax.jit
    def agent_tick(states, lane_ids):
        """Traffic agents: IDM + pure pursuit on their own lanes
        (onlane_ai_agent.cc's forward simulation agents)."""
        lanes = mpdm._gather_lane(lane_set, jnp.maximum(lane_ids, 0))
        desired = states[:, fsim.V] * 0 + jnp.clip(states[:, fsim.V], 2.0,
                                                   8.0)
        return fsim.multi_agent_step(lanes, states, geom, desired, p,
                                     dt_plan)

    log = {"t": [], "states": [], "behavior": [], "v_ego": [],
           "feasible": []}
    t0 = time.time()
    collisions = 0
    for step in range(args.steps):
        t_now = step * dt_plan
        dec, res, ref_lane, lane_ids = plan_tick(states)

        # ego control from the SSC spline: desired state a tick ahead
        pos_sd, vel_sd, _ = bezier_eval(res.spline, jnp.asarray(
            [min(dt_plan, times[-1])]))
        pos_w, heading_w = lane_mod.state_of_frenet(
            ref_lane, pos_sd[0, 0:1], pos_sd[0, 1:2])
        v_des = jnp.linalg.norm(vel_sd[0])
        # fall back to the MPDM forward state when the corridor is infeasible
        fallback = dec.trajs[dec.behavior][1, 0]
        ego_next = jnp.where(
            res.feasible,
            jnp.concatenate([pos_w[0], heading_w[0:1], v_des[None],
                             states[0, 4:5], states[0, 5:6]]),
            fallback)

        new_agents = agent_tick(states, lane_ids)
        states = jnp.concatenate([ego_next[None], new_agents[1:]], axis=0)

        from dftpav_tpu.urban.geometry import vehicles_collide
        pa = (geom.length[0], geom.width[0], geom.d_cr[0])
        for a in range(1, A):
            if bool(vehicles_collide(states[0], states[a], pa, pa)):
                collisions += 1

        log["t"].append(t_now)
        log["states"].append(np.asarray(states))
        log["behavior"].append(int(dec.behavior))
        log["v_ego"].append(float(states[0, fsim.V]))
        log["feasible"].append(bool(res.feasible))

    wall = time.time() - t0
    v = np.asarray(log["v_ego"])
    beh = np.asarray(log["behavior"])
    print(f"steps={args.steps} wall={wall:.1f}s collisions={collisions} "
          f"v_ego mean={v.mean():.2f} max={v.max():.2f} "
          f"lane_changes={(np.diff(beh) != 0).sum()} "
          f"ssc_feasible={np.mean(log['feasible']):.2f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(14, 4))
        traj = np.stack(log["states"])             # [T, A, 6]
        for a in range(A):
            ax.plot(traj[:, a, 0], traj[:, a, 1],
                    color="tab:red" if a == 0 else "tab:gray",
                    lw=2 if a == 0 else 1)
        for y in (-1.75, 1.75, 5.25, 8.75):
            ax.axhline(y, color="k", lw=0.5, ls="--")
        ax.set_aspect("equal")
        fig.savefig(args.plot, dpi=110, bbox_inches="tight")
        print("saved", args.plot)

    return collisions, v.mean()


if __name__ == "__main__":
    main(sys.argv[1:])
