"""Intelligent Driver Model family: IDM, IIDM, ACC(+CAH), context IDM.

Reference: common::IntelligentDriverModel
(src/Sim/core/common/src/common/idm/intelligent_driver_model.cc:5-93) and the
velocity controllers (src/Sim/core/vehicle_model/src/vehicle_model/controllers/
idm_velocity_controller.cc, ctx_idm_velocity_controller.cc). All functions are
pure, elementwise, and broadcast over any batch shape — one [B, A] array of
agents is a single VPU sweep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class IDMParam(NamedTuple):
    """IntelligentDriverModel::Param defaults (intelligent_driver_model.h:23-32)."""

    desired_velocity: jnp.ndarray = 0.0    # v0
    vehicle_length: jnp.ndarray = 5.0      # l_{alpha-1}
    min_spacing: jnp.ndarray = 2.0         # s0
    headway_time: jnp.ndarray = 1.0        # T
    acc_max: jnp.ndarray = 2.0             # a
    comfortable_braking: jnp.ndarray = 3.0  # b
    hard_braking: jnp.ndarray = 5.0
    exponent: int = 4                      # delta


def idm_acc(p: IDMParam, s, v, s_front, v_front):
    """Plain IDM (GetIdmDesiredAcceleration, intelligent_driver_model.cc:5)."""
    s_star = p.min_spacing + jnp.maximum(
        0.0, v * p.headway_time
        + v * (v - v_front) / (2.0 * jnp.sqrt(p.acc_max * p.comfortable_braking)))
    s_alpha = jnp.maximum(1e-9, s_front - s - p.vehicle_length)
    v0 = jnp.maximum(p.desired_velocity, 1e-9)
    return p.acc_max * (1.0 - (v / v0) ** p.exponent - (s_star / s_alpha) ** 2)


def iidm_acc(p: IDMParam, s, v, s_front, v_front):
    """Improved IDM (GetIIdmDesiredAcceleration, intelligent_driver_model.cc:24-68).

    Fixes IDM's over-braking above v0 and the dispersed steady-state gap near
    v0; output clamped to [-hard_braking, acc_max].
    """
    v0 = jnp.maximum(p.desired_velocity, 1e-9)
    vr = v / v0
    a, b = p.acc_max, p.comfortable_braking
    below = v <= p.desired_velocity
    a_free = jnp.where(
        below,
        a * (1.0 - _safe_pow(vr, p.exponent)),
        -b * (1.0 - _safe_pow(1.0 / jnp.maximum(vr, 1e-9), a * p.exponent / b)),
    )
    s_alpha = jnp.maximum(1e-9, s_front - s - p.vehicle_length)
    s_star = p.min_spacing + jnp.maximum(
        0.0, v * p.headway_time + v * (v - v_front) / (2.0 * jnp.sqrt(a * b)))
    z = s_star / s_alpha
    # z >= 1 -> constrained braking; z < 1 -> free-flow blend
    a_free_safe = jnp.where(jnp.abs(a_free) < 1e-9, 1e-9, a_free)
    blend = a_free * (1.0 - _safe_pow(z, 2.0 * a / a_free_safe))
    a_out = jnp.where(
        below,
        jnp.where(z >= 1.0, a * (1.0 - z * z), blend),
        jnp.where(z >= 1.0, a_free + a * (1.0 - z * z), a_free),
    )
    return jnp.clip(a_out, -p.hard_braking, p.acc_max)


def acc_acc(p: IDMParam, s, v, s_front, v_front):
    """ACC = IIDM blended with constant-acceleration heuristic (CAH)
    (GetAccDesiredAcceleration, intelligent_driver_model.cc:70-93)."""
    a_iidm = iidm_acc(p, s, v, s_front, v_front)
    b = p.comfortable_braking
    ds = jnp.maximum(0.0, s_front - s)
    # acc_cah = v^2 (-b) / (v_front^2 - 2 ds (-b))  (:82-85)
    denom = v_front * v_front + 2.0 * ds * b
    acc_cah = (v * v * -b) / jnp.maximum(denom, 1e-9)
    coolness = 0.99
    blended = (1.0 - coolness) * a_iidm + coolness * (
        acc_cah - b * jnp.tanh((a_iidm - acc_cah) / -b))
    return jnp.where(a_iidm >= acc_cah, a_iidm, blended)


def _safe_pow(x, e):
    return jnp.exp(e * jnp.log(jnp.maximum(x, 1e-30)))


def idm_velocity(p: IDMParam, s, s_front, v, v_front, dt):
    """Desired velocity after dt under ACC dynamics.

    Reference: IntelligentVelocityControl::CalculateDesiredVelocity
    (idm_velocity_controller.cc:6-45) integrates the 4-state IDM ODE
    [s, v, s_front, v_front] with odeint RK4 over one dt
    (idm_model.cc operator(): acc from GetAccDesiredAcceleration clamped to
    >= -min(hard_braking, v/dt), front vehicle at constant velocity).
    One classic RK4 step reproduces odeint's integrate() on this smooth ODE.
    """
    v = jnp.maximum(0.0, v)

    def deriv(y):
        si, vi, sf, vf = y
        acc = acc_acc(p, si, vi, sf, vf)
        acc = jnp.maximum(acc, -jnp.minimum(p.hard_braking, vi / dt))
        return jnp.stack([vi, acc, vf, jnp.zeros_like(vf)])

    y0 = jnp.stack([s, v, s_front, v_front])
    k1 = deriv(y0)
    k2 = deriv(y0 + 0.5 * dt * k1)
    k3 = deriv(y0 + 0.5 * dt * k2)
    k4 = deriv(y0 + dt * k3)
    y1 = y0 + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return jnp.maximum(0.0, y1[1])


def ctx_idm_velocity(p: IDMParam, s, v, s_front, v_front,
                     s_target, v_target, dt, k_s: float = 0.4,
                     k_v: float = 0.8):
    """Context IDM: velocity tracking a moving (gap) target state.

    Reference: ContextIntelligentDriverModel::operator()
    (src/Sim/core/vehicle_model/src/vehicle_model/ctx_idm_model.cc:33-67) with
    CtxParam{k_s=0.4, k_v=0.8} as constructed in PropagateOnceAdvancedLC
    (onlane_forward_simulation.h:286). The effective law is pure tracking:
    v_ref = v_target + k_s (s_target - s); acc = clip(k_v (v_ref - v), -1, 1),
    integrated with the target advancing at constant v_target. (The reference
    computes an IDM acceleration on an uninitialized state and discards it,
    ctx_idm_model.cc:44-58 — we implement the effective behavior.) The
    s_front/v_front arguments are kept for API parity and do not affect the
    result, matching the reference.
    """
    del s_front, v_front  # unused by the reference's effective law

    def deriv(y):
        si, vi, st, vt = y
        v_ref = vt + k_s * (st - si)
        acc = jnp.clip(k_v * (v_ref - vi), -1.0, 1.0)
        return jnp.stack([vi, acc, vt, jnp.zeros_like(vt)])

    y0 = jnp.stack([s, v, s_target, v_target])
    k1 = deriv(y0)
    k2 = deriv(y0 + 0.5 * dt * k1)
    k3 = deriv(y0 + 0.5 * dt * k2)
    k4 = deriv(y0 + dt * k3)
    y1 = y0 + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return jnp.maximum(0.0, y1[1])
