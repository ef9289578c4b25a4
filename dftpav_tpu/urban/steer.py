"""Ideal steer plant with jerk/accel/steer-rate limiting + pure-pursuit steering.

Reference: simulator::IdealSteerModel
(src/Sim/core/vehicle_model/src/vehicle_model/ideal_steer_model.cc) — the
closed-loop "desired state" propagator used by every behavioral forward
simulation — and control::PurePursuitControl
(src/Sim/core/vehicle_model/src/vehicle_model/controllers/pure_pursuit_controller.cc:4-9).

Everything is a pure function on a flat agent-state array, broadcastable over
[B, A] agent batches; the RK4 step replaces boost::odeint::integrate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dftpav_tpu.urban.lane import normalize_angle

# Agent kinematic state layout (columns of a [..., 6] array):
#   0:x  1:y  2:theta  3:v  4:steer  5:acc(long)
# mirroring common::State{vec_position, angle, velocity, steer, acceleration}
# (src/Sim/core/common/inc/common/state/state.h:7-14; curvature is derived
# as tan(steer)/wheel_base and not stored).
X, Y, TH, V, ST, ACC = 0, 1, 2, 3, 4, 5
STATE_DIM = 6


class SteerLimits(NamedTuple):
    """OnLaneForwardSimulation::Param limits (onlane_forward_simulation.h:27-41)."""

    max_lon_acc: jnp.ndarray = 2.0          # idm acc_max feeds this
    max_lon_dec: jnp.ndarray = 5.0          # idm hard_braking
    max_lon_acc_jerk: jnp.ndarray = 5.0
    max_lon_dec_jerk: jnp.ndarray = 5.0
    max_lat_acc: jnp.ndarray = 1.5
    max_lat_jerk: jnp.ndarray = 3.0
    max_steer_angle: jnp.ndarray = 45.0 / 180.0 * jnp.pi
    max_steer_rate: jnp.ndarray = 0.39
    max_curvature: jnp.ndarray = 0.33


def pure_pursuit_steer(wheel_base, angle_diff, look_ahead_dist):
    """steer = atan2(2 L sin(angle_diff), lookahead) (pure_pursuit_controller.cc:4-9)."""
    return jnp.arctan2(2.0 * wheel_base * jnp.sin(angle_diff), look_ahead_dist)


def truncate_control(state, ctrl_steer, ctrl_vel, wheel_base,
                     lim: SteerLimits, dt):
    """Jerk/acc/lat-acc/steer-rate limiting of a raw (steer, velocity) command.

    Reproduces IdealSteerModel::TruncateControl (ideal_steer_model.cc:40-68):
    longitudinal jerk -> acc -> velocity clamp chain, then lateral jerk ->
    lat acc -> steer -> steer-rate chain.
    """
    v, steer0, acc0 = state[..., V], state[..., ST], state[..., ACC]
    curvature0 = jnp.tan(steer0) / wheel_base

    ctrl_vel = jnp.maximum(0.0, ctrl_vel)
    ctrl_steer = jnp.clip(ctrl_steer, -lim.max_steer_angle, lim.max_steer_angle)

    lon_acc = (ctrl_vel - v) / dt
    lon_jerk = jnp.clip((lon_acc - acc0) / dt,
                        -lim.max_lon_dec_jerk, lim.max_lon_acc_jerk)
    lon_acc = jnp.clip(lon_jerk * dt + acc0, -lim.max_lon_dec, lim.max_lon_acc)
    vel = jnp.maximum(v + lon_acc * dt, 0.0)

    lat_acc = vel * vel * jnp.tan(ctrl_steer) / wheel_base
    lat_acc0 = v * v * curvature0
    lat_jerk = jnp.clip((lat_acc - lat_acc0) / dt,
                        -lim.max_lat_jerk, lim.max_lat_jerk)
    lat_acc = jnp.clip(lat_jerk * dt + lat_acc0,
                       -lim.max_lat_acc, lim.max_lat_acc)
    steer = jnp.arctan(lat_acc * wheel_base
                       / jnp.maximum(vel * vel, 0.1 * 1e-8))
    steer_rate = jnp.clip(normalize_angle(steer - steer0) / dt,
                          -lim.max_steer_rate, lim.max_steer_rate)
    steer = normalize_angle(steer0 + steer_rate * dt)
    return steer, vel, lon_acc, steer_rate


def ideal_steer_step(state, ctrl_steer, ctrl_vel, wheel_base,
                     lim: SteerLimits, dt):
    """One limited closed-loop plant step (IdealSteerModel::Step, :70-90).

    Control is truncated, then the bicycle ODE
    [ẋ, ẏ, θ̇, v̇, δ̇] = [v cosθ, v sinθ, v tanδ/L, a_lon, δ̇_rate]
    is integrated with one RK4 step (replacing odeint::integrate).
    """
    steer_cmd, vel_cmd, lon_acc, steer_rate = truncate_control(
        state, ctrl_steer, ctrl_vel, wheel_base, lim, dt)
    del vel_cmd, steer_cmd  # folded into lon_acc / steer_rate

    def deriv(y):
        return jnp.stack([
            jnp.cos(y[..., TH]) * y[..., V],
            jnp.sin(y[..., TH]) * y[..., V],
            jnp.tan(y[..., ST]) * y[..., V] / wheel_base,
            lon_acc,
            steer_rate * jnp.ones_like(y[..., ST]),
            jnp.zeros_like(y[..., ACC]),
        ], axis=-1)

    k1 = deriv(state)
    k2 = deriv(state + 0.5 * dt * k1)
    k3 = deriv(state + 0.5 * dt * k2)
    k4 = deriv(state + dt * k3)
    nxt = state + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    nxt = nxt.at[..., TH].set(normalize_angle(nxt[..., TH]))
    nxt = nxt.at[..., ST].set(normalize_angle(nxt[..., ST]))
    nxt = nxt.at[..., ACC].set(lon_acc)
    return nxt
