"""Kinematic bicycle plant with RK4 integration.

Equivalent of simulator::VehicleModel (vehicle_model.cc:25-51), which
integrates

    x' = v cos(theta),  y' = v sin(theta),  theta' = v tan(delta) / L,
    delta' = u_steer_rate,  v' = u_acc

with Boost.odeint RK4 and clamps steering to +-max_steering_angle. Here the
step is a pure jittable function over a state array so the physics of B
vehicles is one vmapped call (the 500 Hz multi-vehicle loop of
phy_simulator_planning_node.cc:117-135 becomes a single lax.scan per tick).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VehicleState(NamedTuple):
    """State vector [x, y, theta, delta(steer), v]."""

    x: jnp.ndarray
    y: jnp.ndarray
    theta: jnp.ndarray
    steer: jnp.ndarray
    v: jnp.ndarray

    def as_array(self):
        return jnp.stack([self.x, self.y, self.theta, self.steer, self.v],
                         axis=-1)

    @classmethod
    def from_array(cls, a):
        return cls(a[..., 0], a[..., 1], a[..., 2], a[..., 3], a[..., 4])


class BicycleModel:
    def __init__(self, wheel_base: float = 2.85,
                 max_steer: float = 0.7,
                 max_steer_rate: float = 5.0,
                 max_acc: float = 8.0):
        self.wheel_base = wheel_base
        self.max_steer = max_steer
        self.max_steer_rate = max_steer_rate
        self.max_acc = max_acc

    def deriv(self, s: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """s: [..., 5] state, u: [..., 2] (steer_rate, acc)."""
        x, y, th, de, v = (s[..., i] for i in range(5))
        sr = jnp.clip(u[..., 0], -self.max_steer_rate, self.max_steer_rate)
        ac = jnp.clip(u[..., 1], -self.max_acc, self.max_acc)
        return jnp.stack([
            v * jnp.cos(th),
            v * jnp.sin(th),
            v * jnp.tan(de) / self.wheel_base,
            sr,
            ac,
        ], axis=-1)

    def step(self, s: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
        """One RK4 step; steering clamped after integration
        (vehicle_model.cc:25-33)."""
        k1 = self.deriv(s, u)
        k2 = self.deriv(s + 0.5 * dt * k1, u)
        k3 = self.deriv(s + 0.5 * dt * k2, u)
        k4 = self.deriv(s + dt * k3, u)
        s1 = s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return s1.at[..., 3].set(
            jnp.clip(s1[..., 3], -self.max_steer, self.max_steer))

    def make_stepper(self, dt: float, substeps: int = 1):
        """Jitted multi-substep stepper: (states [B,5], controls [B,2]) ->
        states [B,5]."""
        def stepper(s, u):
            def body(s, _):
                return self.step(s, u, dt / substeps), None
            out, _ = jax.lax.scan(body, s, None, length=substeps)
            return out
        return jax.jit(stepper)


def tracking_control(state, desired, wheel_base, k_steer=8.0, k_v=4.0,
                     k_pos=1.0, k_theta=2.5):
    """State-feedback controller mapping the executing-trajectory desired
    state to (steer_rate, acc).

    The reference's simulator consumes full desired states ("state-feedback
    control signals", phy_simulator.cc:75 + vehicle_msgs ControlSignal); the
    closed-loop variant here: steer rate servos the steering angle toward the
    desired (plus a heading-error term), acc = desired acc + velocity error
    feedback + longitudinal position error.
    """
    import numpy as np

    ex = desired["pos"][0] - state[0]
    ey = desired["pos"][1] - state[1]
    c, s = np.cos(state[2]), np.sin(state[2])
    e_lon = c * ex + s * ey
    e_lat = -s * ex + c * ey
    e_th = np.arctan2(np.sin(desired["theta"] - state[2]),
                      np.cos(desired["theta"] - state[2]))
    # theta' = v tan(delta)/L: the steering-to-heading gain flips sign with
    # the drive direction, so BOTH heading and lateral feedback must be
    # multiplied by sign(v) or reverse tracking is unstable.
    sgn = 1.0 if desired["vel"] >= 0 else -1.0
    steer_des = desired["steer"] + sgn * (k_theta * e_th + k_pos * e_lat)
    steer_rate = k_steer * (steer_des - state[3])
    acc = desired["acc"] + k_v * (desired["vel"] - state[4]) \
        + k_pos * e_lon
    return np.array([steer_rate, acc])
