"""(s, d, t) voxel-grid cube inflation — the reference SscMap's corridor
construction, TPU-native.

Reference: planning::SscMap (src/Sim/util/ssc_planner/src/ssc_planner/
ssc_map.cc): obstacle predictions are rasterized into a 3D occupancy grid
(:134-157 via FillDynamicObstacles), inflated by the ego footprint
(InflateObstacleGrid, :347-375), and each seed cube grows face-by-face until
a blocked plane: InflateCubeIn3dGrid (:377-434) alternates one
inflate-step on s+/s-/d+/d- per round until all four finish, then extends
t+ (kMaxNumOfGridAlongTime, "no need to inflate along z-neg", :423).
Grid defaults: resolution (0.25 m, 0.2 m, 0.1 s), inflate_steps
{20, 5, 10, 10, 1, 1} (ssc_map.h:39-52).

TPU-native shape: the grid is a dense [Nt, Ns, Nd] bool array built with
broadcast interval tests (no scalar raster loops); each face-inflation round
is a masked-reduction plane check inside ONE `lax.while_loop` whose carry is
the 6 integer bounds — `vmap` runs every seed cube (and every scenario) in
parallel. Unlike the interval fast path (ssc/corridor.py), occupancy is
geometrically exact per voxel, so partially-overlapping (corner) obstacles
that interval left/right classification cannot express still block the
corridor correctly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.ssc.corridor import Corridor


class VoxelConfig(NamedTuple):
    """Grid + inflation parameters (ssc_map.h:37-52 defaults, sized for the
    forward-sim horizon)."""

    s_res: float = 0.25       # map_resolution[0]
    d_res: float = 0.2        # map_resolution[1]
    n_s: int = 256            # grid cells along s (covers s0 + ~64 m)
    n_d: int = 64             # grid cells along d (~12.8 m)
    s_back: float = 10.0      # grid start offset behind the initial s
    d_origin: float = -6.4    # grid start in d
    inflate_s_pos: int = 20   # inflate_steps[0]
    inflate_s_neg: int = 5    # inflate_steps[1]
    inflate_d_pos: int = 10   # inflate_steps[2]
    inflate_d_neg: int = 10   # inflate_steps[3]
    margin_s: float = 0.0     # extra clearance on top of footprint inflation
    margin_d: float = 0.0


def rasterize(times, obs_s, obs_d, obs_half_l, obs_half_w, obs_mask,
              ego_len, ego_d_cr, ego_width, s0,
              cfg: VoxelConfig = VoxelConfig()):
    """Occupancy grid [T+1, Ns, Nd] from per-step obstacle Frenet boxes.

    Rasterization and ego-footprint inflation fuse into one interval test:
    the reference first marks obstacle cells then dilates by the ego
    footprint (InflateObstacleGrid: s+ by len/2 - d_cr, s- by the remainder,
    d by (width - 0.5)/2); dilating the box by the same amounts is
    identical and needs no grid pass.
    """
    # ego footprint dilation (ssc_map.cc:348-356)
    s_p_inf = ego_len / 2.0 - ego_d_cr
    s_n_inf = ego_len - s_p_inf
    d_inf = (ego_width - 0.5) / 2.0

    s_cells = s0 - cfg.s_back + (jnp.arange(cfg.n_s) + 0.5) * cfg.s_res
    d_cells = cfg.d_origin + (jnp.arange(cfg.n_d) + 0.5) * cfg.d_res

    # obstacle box per (agent, step), dilated: [A, T+1]. The reference
    # spreads each occupied cell over s in [-num_s_n, +num_s_p)
    # (ssc_map.cc:365), so the dilated interval is [lo - s_n, hi + s_p]:
    # the ego (rear-axle referenced) extends s_n_inf ahead of its s, so
    # positions up to s_n_inf BEHIND an obstacle are blocked.
    lo_s = obs_s - obs_half_l[:, None] - s_n_inf - cfg.margin_s
    hi_s = obs_s + obs_half_l[:, None] + s_p_inf + cfg.margin_s
    lo_d = obs_d - obs_half_w[:, None] - d_inf - cfg.margin_d
    hi_d = obs_d + obs_half_w[:, None] + d_inf + cfg.margin_d

    in_s = (s_cells[None, None, :] >= lo_s[..., None]) \
        & (s_cells[None, None, :] <= hi_s[..., None])      # [A, T+1, Ns]
    in_d = (d_cells[None, None, :] >= lo_d[..., None]) \
        & (d_cells[None, None, :] <= hi_d[..., None])      # [A, T+1, Nd]
    occ = jnp.any(in_s[..., :, None] & in_d[..., None, :]
                  & obs_mask[:, None, None, None], axis=0)  # [T+1, Ns, Nd]
    return occ, s_cells, d_cells


def _plane_free_s(occ_t, s_idx, d_lb, d_ub):
    """occ_t [K, Ns, Nd] (the cube's time slab): is plane s == s_idx free
    over d in [d_lb, d_ub]?  (CheckIfPlaneIsFreeOnXAxis)"""
    Nd = occ_t.shape[-1]
    dmask = (jnp.arange(Nd) >= d_lb) & (jnp.arange(Nd) <= d_ub)
    col = jax.lax.dynamic_index_in_dim(occ_t, s_idx, axis=1,
                                       keepdims=False)     # [K, Nd]
    return ~jnp.any(col & dmask[None, :])


def _plane_free_d(occ_t, d_idx, s_lb, s_ub):
    Ns = occ_t.shape[-2]
    smask = (jnp.arange(Ns) >= s_lb) & (jnp.arange(Ns) <= s_ub)
    row = jax.lax.dynamic_index_in_dim(occ_t, d_idx, axis=2,
                                       keepdims=False)     # [K, Ns]
    return ~jnp.any(row & smask[None, :])


def inflate_cube(occ_slab, s_lb0, s_ub0, d_lb0, d_ub0,
                 cfg: VoxelConfig = VoxelConfig(),
                 s_idx_cap=None, s_idx_floor=None):
    """Grow one seed cube in its time slab (occ_slab [K, Ns, Nd]).

    Reproduces InflateCubeIn3dGrid's s/d phase (:377-421): each round takes
    up to inflate_steps cells per face in the fixed order s+, s-, d+, d-,
    re-checking the blocking plane against the CURRENT other-axis bounds;
    a face stops at the first blocked plane or the grid edge.
    s_idx_cap/s_idx_floor optionally reproduce the dynamic-reachability
    clamp (:396-420: s_u = s0 + v t + 0.5 a_max t^2 + v, mirrored for
    braking): a face reaching them is marked finished.
    """
    Ns, Nd = occ_slab.shape[-2], occ_slab.shape[-1]
    i32 = jnp.int32

    def face_steps(state, n_step, grow):
        """Take up to n_step single-cell inflations of one face."""
        def body(j, st):
            bounds, fin = st
            nb, blocked = grow(bounds)
            fin = fin | blocked
            bounds = jax.tree.map(
                lambda a, b: jnp.where(fin, a, b), bounds, nb)
            return bounds, fin

        bounds, fin = state
        bounds, fin2 = jax.lax.fori_loop(0, n_step, body, (bounds, fin))
        # a face that used all its steps un-blocked stays open next round
        return bounds, fin2

    def grow_sp(b):
        s_lb, s_ub, d_lb, d_ub = b
        nxt = s_ub + 1
        edge = nxt >= Ns
        free = _plane_free_s(occ_slab, jnp.minimum(nxt, Ns - 1), d_lb, d_ub)
        ok = ~edge & free
        return (s_lb, jnp.where(ok, nxt, s_ub), d_lb, d_ub), ~ok

    def grow_sn(b):
        s_lb, s_ub, d_lb, d_ub = b
        nxt = s_lb - 1
        edge = nxt < 0
        free = _plane_free_s(occ_slab, jnp.maximum(nxt, 0), d_lb, d_ub)
        ok = ~edge & free
        return (jnp.where(ok, nxt, s_lb), s_ub, d_lb, d_ub), ~ok

    def grow_dp(b):
        s_lb, s_ub, d_lb, d_ub = b
        nxt = d_ub + 1
        edge = nxt >= Nd
        free = _plane_free_d(occ_slab, jnp.minimum(nxt, Nd - 1), s_lb, s_ub)
        ok = ~edge & free
        return (s_lb, s_ub, d_lb, jnp.where(ok, nxt, d_ub)), ~ok

    def grow_dn(b):
        s_lb, s_ub, d_lb, d_ub = b
        nxt = d_lb - 1
        edge = nxt < 0
        free = _plane_free_d(occ_slab, jnp.maximum(nxt, 0), s_lb, s_ub)
        ok = ~edge & free
        return (s_lb, s_ub, jnp.where(ok, nxt, d_lb), d_ub), ~ok

    bounds0 = tuple(jnp.asarray(v, i32) for v in (s_lb0, s_ub0, d_lb0, d_ub0))
    fins0 = tuple(jnp.asarray(False) for _ in range(4))

    def cond(c):
        _, fins = c
        return ~(fins[0] & fins[1] & fins[2] & fins[3])

    def body(c):
        bounds, fins = c
        bounds, f0 = face_steps((bounds, fins[0]), cfg.inflate_s_pos, grow_sp)
        bounds, f1 = face_steps((bounds, fins[1]), cfg.inflate_s_neg, grow_sn)
        bounds, f2 = face_steps((bounds, fins[2]), cfg.inflate_d_pos, grow_dp)
        bounds, f3 = face_steps((bounds, fins[3]), cfg.inflate_d_neg, grow_dn)
        if s_idx_cap is not None:
            f0 = f0 | (bounds[1] >= s_idx_cap)
        if s_idx_floor is not None:
            f1 = f1 | (bounds[0] <= s_idx_floor)
        return bounds, (f0, f1, f2, f3)

    (s_lb, s_ub, d_lb, d_ub), _ = jax.lax.while_loop(
        cond, body, (bounds0, fins0))
    return s_lb, s_ub, d_lb, d_ub


def build_corridor_voxel(times, seed_s, seed_d, obs_s, obs_d, obs_half_l,
                         obs_half_w, obs_mask, M: int,
                         ego_len=4.88, ego_width=1.9, ego_d_cr=1.015,
                         cfg: VoxelConfig = VoxelConfig()) -> Corridor:
    """Voxel-exact drop-in for ssc.corridor.build_corridor (same signature
    contract + Corridor output, metric bounds).

    times/seed_s/seed_d: [T+1]; obs_*: [A, T+1]/[A]. T % M == 0. The seed
    cube of chunk m covers the voxels its trajectory samples touch in the
    chunk's time slab (GetInitialCubeUsingSeed, ssc_map.cc:48-96).
    """
    T = seed_s.shape[0] - 1
    assert T % M == 0, "steps must divide evenly into cubes"
    k = T // M
    s0 = seed_s[0]
    occ, s_cells, d_cells = rasterize(
        times, obs_s, obs_d, obs_half_l, obs_half_w, obs_mask,
        ego_len, ego_d_cr, ego_width, s0, cfg)

    def to_s_idx(v):
        return jnp.clip(jnp.floor((v - (s0 - cfg.s_back)) / cfg.s_res),
                        0, cfg.n_s - 1).astype(jnp.int32)

    def to_d_idx(v):
        return jnp.clip(jnp.floor((v - cfg.d_origin) / cfg.d_res),
                        0, cfg.n_d - 1).astype(jnp.int32)

    idx = (jnp.arange(M)[:, None] * k + jnp.arange(k + 1)[None])
    ss = seed_s[idx]                                       # [M, k+1]
    sd = seed_d[idx]
    s_lb0, s_ub0 = to_s_idx(ss.min(-1)), to_s_idx(ss.max(-1))
    d_lb0, d_ub0 = to_d_idx(sd.min(-1)), to_d_idx(sd.max(-1))

    occ_slabs = occ[idx]                                   # [M, k+1, Ns, Nd]

    # seed validity (ConstructCorridor: CheckIfCubeIsFree on the seed cube)
    Ns, Nd = cfg.n_s, cfg.n_d

    def seed_occupied(slab, a, b, c, d):
        smask = (jnp.arange(Ns) >= a) & (jnp.arange(Ns) <= b)
        dmask = (jnp.arange(Nd) >= c) & (jnp.arange(Nd) <= d)
        return jnp.any(slab & smask[None, :, None] & dmask[None, None, :])

    occupied = jax.vmap(seed_occupied)(occ_slabs, s_lb0, s_ub0, d_lb0, d_ub0)
    seed_free = ~jnp.any(occupied)

    s_lb, s_ub, d_lb, d_ub = jax.vmap(
        lambda slab, a, b, c, d: inflate_cube(slab, a, b, c, d, cfg)
    )(occ_slabs, s_lb0, s_ub0, d_lb0, d_ub0)

    half_s, half_d = 0.5 * cfg.s_res, 0.5 * cfg.d_res
    return Corridor(
        s_lb=s_cells[s_lb] - half_s, s_ub=s_cells[s_ub] + half_s,
        d_lb=d_cells[d_lb] - half_d, d_ub=d_cells[d_ub] + half_d,
        t_lb=times[jnp.arange(M) * k], t_ub=times[(jnp.arange(M) + 1) * k],
        seed_free=seed_free)
