"""RSS (Responsibility-Sensitive Safety) distance checks, vectorized.

Reference: common::RssChecker
(src/Sim/core/common/src/common/rss/rss_checker.cc): safe longitudinal /
lateral distances from response time + accel/brake envelopes; a pair is
unsafe when BOTH gaps are below their safe distances (RssCheck, :258-288).

All functions broadcast elementwise over any batch shape (agent pairs,
trajectories, policies) — one [P, T, A] sweep is a single VPU pass.
Reverse-gear cases return 0 (the reference "do not support rear gear" path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RssConfig(NamedTuple):
    """RssChecker::RssConfig defaults (rss_checker.h:18-27)."""

    response_time: float = 0.1
    lon_acc_max: float = 2.0
    lon_brake_min: float = 4.0
    lon_brake_max: float = 5.0
    lat_acc_max: float = 1.0
    lat_brake_min: float = 1.0
    lat_brake_max: float = 1.0
    lat_miu: float = 0.5


def safe_longitudinal_distance(ego_vel, other_vel, other_in_front,
                               cfg: RssConfig = RssConfig()):
    """CalculateSafeLongitudinalDistance (rss_checker.cc:5-64).

    other_in_front: bool, the other vehicle is longitudinally ahead of ego.
    Same-direction forward traffic only (reference behavior); negative
    velocities fall back to 0 as in the reference.
    """
    ev = jnp.abs(ego_vel)
    ov = jnp.abs(other_vel)
    ev_rt = ev + cfg.lon_acc_max * cfg.response_time
    ov_rt = ov + cfg.lon_acc_max * cfg.response_time

    # Front: ego accelerates for rho then min-brakes; other max-brakes.
    ego_driven_front = ((ev + ev_rt) / 2.0 * cfg.response_time
                        + ev_rt * ev_rt / (2.0 * cfg.lon_brake_min))
    other_driven_front = ov * ov / (2.0 * cfg.lon_brake_max)
    d_front = ego_driven_front - other_driven_front

    # Rear: other accelerates then min-brakes; ego max-brakes.
    ego_driven_rear = ev * ev / (2.0 * cfg.lon_brake_max)
    other_driven_rear = ((ov + ov_rt) / 2.0 * cfg.response_time
                         + ov_rt * ov_rt / (2.0 * cfg.lon_brake_min))
    d_rear = other_driven_rear - ego_driven_rear

    fwd = (ego_vel >= 0.0) & (other_vel >= 0.0)
    d = jnp.where(other_in_front, d_front, d_rear)
    d = jnp.where(fwd, d, 0.0)
    return jnp.maximum(d, 0.0)


def safe_lateral_distance(ego_lat_vel, other_lat_vel, other_on_left,
                          cfg: RssConfig = RssConfig()):
    """CalculateSafeLateralDistance (rss_checker.cc:141-205).

    Lateral velocities signed + = left. Both-converging cases use
    passive-brake (response + min brake) for the approaching side and active
    (max) brake for the receding side, plus the miu margin.
    """
    # coerce scalars: `e_pos`/`o_pos` below must be arrays so `~`/`&` are
    # elementwise (on Python bools `~` is the deprecated int complement)
    ego_lat_vel = jnp.asarray(ego_lat_vel)
    other_lat_vel = jnp.asarray(other_lat_vel)
    ev = jnp.abs(ego_lat_vel)
    ov = jnp.abs(other_lat_vel)
    ev_rt = ev + cfg.response_time * cfg.lat_acc_max
    ov_rt = ov + cfg.response_time * cfg.lat_acc_max
    ego_active = ev * ev / (2.0 * cfg.lat_brake_max)
    ego_passive = ((ev + ev_rt) / 2.0 * cfg.response_time
                   + ev_rt * ev_rt / (2.0 * cfg.lat_brake_min))
    other_active = ov * ov / (2.0 * cfg.lat_brake_max)
    other_passive = ((ov + ov_rt) / 2.0 * cfg.response_time
                     + ov_rt * ov_rt / (2.0 * cfg.lat_brake_min))

    e_pos = ego_lat_vel >= 0.0
    o_pos = other_lat_vel >= 0.0
    # other on the LEFT of ego (ego may drift left into it, other may drift
    # right into ego); mirrored otherwise (rss_checker.cc Right/Left blocks)
    d_left = jnp.where(
        e_pos & o_pos, ego_passive - other_active,
        jnp.where(e_pos & ~o_pos, ego_passive + other_passive,
                  jnp.where(~e_pos & ~o_pos, other_passive - ego_active,
                            0.0)))
    d_right = jnp.where(
        o_pos & e_pos, other_passive - ego_active,
        jnp.where(o_pos & ~e_pos, other_passive + ego_passive,
                  jnp.where(~o_pos & ~e_pos, ego_passive - other_active,
                            0.0)))
    d = jnp.where(other_on_left, d_left, d_right)
    return jnp.maximum(d, 0.0) + cfg.lat_miu


def rss_safe(ego_s, ego_d, ego_vs, ego_vd, other_s, other_d, other_vs,
             other_vd, cfg: RssConfig = RssConfig()):
    """RssCheck on Frenet states (rss_checker.cc:258-288).

    True where the pair is RSS-safe: safe iff the longitudinal OR the lateral
    gap exceeds its safe distance.
    """
    in_front = other_s > ego_s
    on_left = other_d > ego_d
    d_lon = safe_longitudinal_distance(ego_vs, other_vs, in_front, cfg)
    d_lat = safe_lateral_distance(ego_vd, other_vd, on_left, cfg)
    unsafe = (jnp.abs(ego_s - other_s) < d_lon) \
        & (jnp.abs(ego_d - other_d) < d_lat)
    return ~unsafe


# ---------------------------------------------------------------------------
# Typed RSS check (the EUDM safety ladder input)
# ---------------------------------------------------------------------------

# LongitudinalViolateType (rss_checker.h:16)
LEGAL, TOO_FAST, TOO_SLOW = 0, 1, 2

_EPS = 1.0e-6  # common kEPS


def safe_longitudinal_velocity(other_vs, other_in_front, lon_dist_abs,
                               cfg: RssConfig = RssConfig()):
    """CalculateSafeLongitudinalVelocity (rss_checker.cc:65-140).

    Returns (ego_vel_low, ego_vel_up): the RSS-legal band for the ego's
    longitudinal velocity given the gap ``lon_dist_abs`` to the other vehicle.
    ``other_in_front``: bool, other is longitudinally ahead of ego.
    """
    ov = jnp.abs(other_vs)
    ov_rt = ov + cfg.lon_acc_max * cfg.response_time
    # other's passive stopping distance (response + min brake)
    other_passive = ((ov + ov_rt) / 2.0 * cfg.response_time
                     + ov_rt * ov_rt / (2.0 * cfg.lon_brake_min))

    # ego-velocity quadratic: a v^2 + b v + c = 0 with the ego accelerating
    # through the response time then min-braking
    a = 1.0 / (2.0 * cfg.lon_brake_min)
    b = (cfg.response_time
         + cfg.lon_acc_max * cfg.response_time / cfg.lon_brake_min)
    c0 = 0.5 * (cfg.lon_acc_max
                + cfg.lon_acc_max ** 2 / cfg.lon_brake_min) \
        * cfg.response_time ** 2

    def quad_root(c):
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        return (-b + jnp.sqrt(disc)) / (2.0 * a)

    # Front, other driving forward: other hard-brakes (max brake)
    other_hard = ov * ov / (2.0 * cfg.lon_brake_max)
    up_front_fwd = quad_root(c0 - other_hard - lon_dist_abs)
    # Front, other driving towards ego: other's passive distance eats the gap
    up_front_bwd = jnp.where(other_passive > lon_dist_abs, 0.0,
                             quad_root(c0 - (lon_dist_abs - other_passive)))
    up_front = jnp.where(other_vs >= 0.0, up_front_fwd, up_front_bwd)
    low_front = jnp.zeros_like(up_front)

    # Rear, other driving forward: ego must keep enough speed that the
    # other's passive advance cannot close the gap under ego max-brake
    low_rear_fwd = jnp.where(
        other_passive < lon_dist_abs, 0.0,
        jnp.sqrt(2.0 * cfg.lon_brake_max
                 * jnp.maximum(other_passive - lon_dist_abs, 0.0)))
    low_rear = jnp.where(other_vs >= 0.0, low_rear_fwd, 0.0)
    up_rear = jnp.full_like(low_rear, jnp.inf)

    low = jnp.where(other_in_front, low_front, low_rear)
    up = jnp.where(other_in_front, up_front, up_rear)
    return low, up


def rss_check_typed(ego_s, ego_d, ego_vs, ego_vd,
                    other_s, other_d, other_vs, other_vd,
                    ego_len, ego_width, ego_dcr,
                    other_len, other_width, other_dcr,
                    cfg: RssConfig = RssConfig()):
    """RssCheck, vehicle overload (rss_checker.cc:291-394), vectorized.

    States are Frenet (s, d) of the REAR-AXLE point with d_cr the
    axle-to-geometric-center offset (semantics.h:66-76). Returns
    (is_safe, lon_type, rss_vel_low, rss_vel_up) with lon_type in
    {LEGAL, TOO_FAST, TOO_SLOW}; the vel bounds are 0 where legal,
    matching the reference's outputs.
    """
    in_front = other_s > ego_s
    on_left = other_d > ego_d

    # lateral gate, inflated by the half-widths (rss_checker.cc:330-343)
    d_lat_safe = safe_lateral_distance(ego_vd, other_vd, on_left, cfg) \
        + 0.5 * (ego_width + other_width)
    lat_clear = jnp.abs(ego_d - other_d) > d_lat_safe

    # bumper-to-bumper longitudinal gap (rss_checker.cc:345-362)
    ego_front_off = 0.5 * ego_len + ego_dcr
    ego_back_off = jnp.abs(0.5 * ego_len - ego_dcr)
    oth_front_off = 0.5 * other_len + other_dcr
    oth_back_off = jnp.abs(0.5 * other_len - other_dcr)
    gap = jnp.abs(ego_s - other_s)
    lon_dist = jnp.where(in_front, gap - ego_front_off - oth_back_off,
                         gap - oth_front_off - ego_back_off)

    overlap_front = (lon_dist < 0.0) & in_front

    low, up = safe_longitudinal_velocity(other_vs, in_front, lon_dist, cfg)
    too_fast = ego_vs > up + _EPS
    too_slow = ego_vs < low - _EPS

    lon_type = jnp.where(too_fast, TOO_FAST,
                         jnp.where(too_slow, TOO_SLOW, LEGAL))
    lon_type = jnp.where(overlap_front, TOO_FAST, lon_type)
    vel_low = jnp.where(overlap_front, 0.0, jnp.where(too_fast | too_slow,
                                                      low, 0.0))
    vel_up = jnp.where(overlap_front, 0.0, jnp.where(too_fast | too_slow,
                                                     up, 0.0))

    # guard order matches the reference: reverse ego -> legal; lateral
    # clearance -> legal (both override everything after them)
    legal_early = (ego_vs < 0.0) | lat_clear
    is_safe = legal_early | ((lon_type == LEGAL) & ~overlap_front)
    lon_type = jnp.where(legal_early, LEGAL, lon_type)
    vel_low = jnp.where(legal_early, 0.0, vel_low)
    vel_up = jnp.where(legal_early, 0.0, vel_up)
    return is_safe, lon_type, vel_low, vel_up
