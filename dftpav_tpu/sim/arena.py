"""Multi-vehicle physics arena: the phy_simulator equivalent.

Reference: src/Sim/core/phy_simulator — steps every vehicle's kinematic
bicycle model at 500 Hz from the latest per-agent ControlSignal
(phy_simulator_planning_node.cc:117-135, vehicle_model.cc RK4); open-loop
signals teleport the vehicle to the commanded state
(UpdateSimulatorUsingSignalSet, phy_simulator.cc:75).

TPU-native: all vehicles step in ONE vmapped RK4 call; substeps run under a
`lax.scan`, so a 500 Hz physics burst between two 20 Hz planner ticks is a
single device program. Control is (steer_rate, lon_acc) per agent, matching
simulator::VehicleModel's inputs, or a full desired state for open-loop
agents (the reference's ControlSignal closed/open-loop split).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.urban.lane import normalize_angle

# arena state layout per vehicle: x, y, theta, steer, v  — the ODE state of
# simulator::VehicleModel (vehicle_model.cc:38-51)
AX, AY, ATH, AST, AV = 0, 1, 2, 3, 4
ARENA_STATE_DIM = 5


class ArenaControl(NamedTuple):
    """Per-agent control (all [A] arrays).

    Closed loop: u = (steer_rate, lon_acc). Open loop: target state teleport
    (phy_simulator.cc UpdateSimulatorUsingSignalSet's is_openloop branch).
    """

    steer_rate: jnp.ndarray
    lon_acc: jnp.ndarray
    openloop: jnp.ndarray          # [A] bool
    target_state: jnp.ndarray      # [A, 5]


def bicycle_deriv(s, u, wheel_base):
    """vehicle_model.cc:38-51: [x', y', th', steer', v'] =
    [v cos th, v sin th, v tan(steer)/L, u0, u1]."""
    return jnp.stack([
        jnp.cos(s[..., ATH]) * s[..., AV],
        jnp.sin(s[..., ATH]) * s[..., AV],
        jnp.tan(s[..., AST]) * s[..., AV] / wheel_base,
        u[..., 0],
        u[..., 1],
    ], axis=-1)


def step_all(states, ctrl: ArenaControl, wheel_base, dt,
             max_steer: float = 0.75):
    """One RK4 physics step for all agents ([A, 5] -> [A, 5])."""
    u = jnp.stack([ctrl.steer_rate, ctrl.lon_acc], axis=-1)

    def deriv(s):
        return bicycle_deriv(s, u, wheel_base)

    k1 = deriv(states)
    k2 = deriv(states + 0.5 * dt * k1)
    k3 = deriv(states + 0.5 * dt * k2)
    k4 = deriv(states + dt * k3)
    nxt = states + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    nxt = nxt.at[:, ATH].set(normalize_angle(nxt[:, ATH]))
    nxt = nxt.at[:, AST].set(jnp.clip(nxt[:, AST], -max_steer, max_steer))
    nxt = nxt.at[:, AV].set(jnp.maximum(nxt[:, AV], 0.0))
    nxt = jnp.where(ctrl.openloop[:, None], ctrl.target_state, nxt)
    return nxt


def run_burst(states, ctrl: ArenaControl, wheel_base, dt: float,
              n_substeps: int):
    """n_substeps physics steps under one scan (the 500 Hz burst between
    planner ticks; phy_simulator_planning_node.cc:25 runs 500 Hz physics
    against 20 Hz planning)."""

    def body(s, _):
        nxt = step_all(s, ctrl, wheel_base, dt)
        return nxt, None

    out, _ = jax.lax.scan(body, states, None, length=n_substeps)
    return out


def from_agent_states(states6):
    """steer-plant layout [A, 6] (x,y,th,v,steer,acc) -> arena [A, 5]."""
    return jnp.stack([states6[:, 0], states6[:, 1], states6[:, 2],
                      states6[:, 4], states6[:, 3]], axis=-1)


def to_agent_states(states5, lon_acc=None):
    """arena [A, 5] -> steer-plant layout [A, 6]."""
    acc = jnp.zeros_like(states5[:, 0]) if lon_acc is None else lon_acc
    return jnp.stack([states5[:, AX], states5[:, AY], states5[:, ATH],
                      states5[:, AV], states5[:, AST], acc], axis=-1)
