"""(s, d, t) corridor generation around a behavioral forward trajectory.

Reference: planning::SscMap (src/Sim/util/ssc_planner/src/ssc_planner/
ssc_map.cc): rasterize predicted obstacle trajectories into an (s, d, t)
voxel grid, seed cubes along the ego forward trajectory, and inflate each
cube until blocked (ConstructCorridorUsingInitialTrajectory, :~200-500).

TPU-native re-design: no voxel grid. Time is pre-chunked into M uniform
cubes (the reference's seed cubes inherit the uniform forward-sim step);
obstacle predictions are axis-aligned Frenet boxes per step, and inflation
is closed-form interval arithmetic per (cube, obstacle): first the lateral
bounds are clipped by obstacles that overlap the seed's s-interval, then the
longitudinal bounds by obstacles inside the final d-interval. Everything is
a fixed-shape reduction — `vmap`-able over scenarios and behaviors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Corridor(NamedTuple):
    """M cubes in the Frenet plane; time bounds are uniform chunks."""

    s_lb: jnp.ndarray   # [M]
    s_ub: jnp.ndarray   # [M]
    d_lb: jnp.ndarray   # [M]
    d_ub: jnp.ndarray   # [M]
    t_lb: jnp.ndarray   # [M]
    t_ub: jnp.ndarray   # [M]
    seed_free: jnp.ndarray  # [] bool: no obstacle overlaps the seed region
    # (the reference marks the corridor invalid when seed voxels are occupied,
    # ssc_map.cc corridor validity flags; interval inflation needs the same)


class CorridorConfig(NamedTuple):
    s_back: float = 2.0       # inflation behind the seed interval
    s_forward: float = 10.0   # inflation ahead
    d_half_width: float = 5.25  # lateral corridor half width (1.5 lanes)
    margin_s: float = 2.5     # obstacle clearance (about half a car length)
    margin_d: float = 1.1     # lateral clearance (about half a car width)


def build_corridor(times, seed_s, seed_d, obs_s, obs_d, obs_half_l,
                   obs_half_w, obs_mask, M: int,
                   cfg: CorridorConfig = CorridorConfig()) -> Corridor:
    """Corridor of M cubes around the seed (vectorized interval inflation).

    times:   [T+1] uniform stamps covering the forward horizon
    seed_s/d: [T+1] ego forward trajectory in Frenet
    obs_s/d: [A, T+1] obstacle centers in Frenet; half_l/half_w [A]; mask [A]
    T must be divisible by M.
    """
    T = seed_s.shape[0] - 1
    assert T % M == 0, "steps must divide evenly into cubes"
    k = T // M

    # chunk the seed: cube n covers samples [n*k, (n+1)*k] inclusive
    def chunk(x):  # [T+1] -> [M, k+1]
        idx = (jnp.arange(M)[:, None] * k + jnp.arange(k + 1)[None])
        return x[idx]

    ss = chunk(seed_s)
    sd = chunk(seed_d)
    t_lb = times[jnp.arange(M) * k]
    t_ub = times[(jnp.arange(M) + 1) * k]
    seed_s_lo, seed_s_hi = ss.min(-1), ss.max(-1)          # [M]
    seed_d_lo, seed_d_hi = sd.min(-1), sd.max(-1)

    # obstacle boxes per cube: reduce each obstacle over the cube's samples
    def ochunk(x):  # [A, T+1] -> [A, M, k+1]
        idx = (jnp.arange(M)[:, None] * k + jnp.arange(k + 1)[None])
        return x[:, idx]

    os_ = ochunk(obs_s)
    od = ochunk(obs_d)
    obs_s_lo = os_.min(-1) - obs_half_l[:, None] - cfg.margin_s  # [A, M]
    obs_s_hi = os_.max(-1) + obs_half_l[:, None] + cfg.margin_s
    obs_d_lo = od.min(-1) - obs_half_w[:, None] - cfg.margin_d
    obs_d_hi = od.max(-1) + obs_half_w[:, None] + cfg.margin_d
    live = obs_mask[:, None]                                 # [A, 1]

    # --- lateral bounds: obstacles overlapping the seed s-interval clip d ---
    d_lo0 = seed_d_lo - cfg.d_half_width
    d_hi0 = seed_d_hi + cfg.d_half_width
    s_overlap = live & (obs_s_hi > seed_s_lo[None] - cfg.s_back) \
        & (obs_s_lo < seed_s_hi[None] + cfg.s_forward)
    left_of = obs_d_lo > seed_d_hi[None]     # obstacle fully left of seed
    right_of = obs_d_hi < seed_d_lo[None]
    d_hi = jnp.min(jnp.where(s_overlap & left_of, obs_d_lo, jnp.inf), axis=0)
    d_lo = jnp.max(jnp.where(s_overlap & right_of, obs_d_hi, -jnp.inf),
                   axis=0)
    d_ub = jnp.clip(jnp.minimum(d_hi, d_hi0), seed_d_hi, None)
    d_lb = jnp.clip(jnp.maximum(d_lo, d_lo0), None, seed_d_lo)

    # --- longitudinal bounds: obstacles inside the final d-interval clip s ---
    d_overlap = live & (obs_d_hi > d_lb[None]) & (obs_d_lo < d_ub[None])
    ahead = obs_s_lo > seed_s_hi[None]
    behind = obs_s_hi < seed_s_lo[None]
    s_hi = jnp.min(jnp.where(d_overlap & ahead, obs_s_lo, jnp.inf), axis=0)
    s_lo = jnp.max(jnp.where(d_overlap & behind, obs_s_hi, -jnp.inf), axis=0)
    s_ub = jnp.clip(jnp.minimum(s_hi, seed_s_hi + cfg.s_forward),
                    seed_s_hi, None)
    s_lb = jnp.clip(jnp.maximum(s_lo, seed_s_lo - cfg.s_back),
                    None, seed_s_lo)

    # seed validity: an obstacle overlapping a cube's seed region in BOTH
    # dims means the forward trajectory itself collides; inflation (like the
    # reference's voxel corridor) is undefined there
    overlap_both = live & (obs_s_hi > seed_s_lo[None]) \
        & (obs_s_lo < seed_s_hi[None]) & (obs_d_hi > seed_d_lo[None]) \
        & (obs_d_lo < seed_d_hi[None])
    seed_free = ~jnp.any(overlap_both)
    return Corridor(s_lb=s_lb, s_ub=s_ub, d_lb=d_lb, d_ub=d_ub,
                    t_lb=t_lb, t_ub=t_ub, seed_free=seed_free)
