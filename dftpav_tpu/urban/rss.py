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
