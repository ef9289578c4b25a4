"""SSC planner: corridor + piecewise-Bezier QP in the Frenet frame.

Reference: planning::SscPlanner::RunQpOptimization
(src/Sim/util/ssc_planner/src/ssc_planner/ssc_planner.cc:253-345) and the QP
assembly in SplineGenerator::GetBezierSplineUsingCorridor
(src/Sim/core/common/src/common/spline/spline_generator.cc:357-727):

  min sum_n jerk(x_n) + w_prox * sum_i |p(t_i) - ref_i|^2
  s.t. continuity up to acc at cube junctions, start PVA, end PV,
       control points inside cube position bounds (Bezier hull property),
       derivative control points inside velocity/acc bounds.

TPU-native: cubes have UNIFORM duration (the reference's voxel time axis is
uniform too), so Q, A, C are host-precomputed numpy constants per problem
class (M, horizon); only b, the cube bounds l/u, and the proximity linear
term are traced. The s and d dimensions are independent (reference stacks
them block-diagonally) and solved as a batch axis of 2 through one ADMM.
"""

from __future__ import annotations

import functools
from math import comb
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dftpav_tpu.ssc.bezier import JERK_HESSIAN, N_DEG, N_ORD, BezierSpline
from dftpav_tpu.ssc.corridor import Corridor, CorridorConfig, build_corridor
from dftpav_tpu.ssc.qp import QPResult, admm_qp
from dftpav_tpu.urban import lane as lane_mod


class SSCConfig(NamedTuple):
    M: int = 5                   # cubes (one per behavior layer by default)
    weight_proximity: float = 1.0  # ssc config weight_proximity
    v_lon: tuple = (0.0, 50.0)   # cube velocity bounds, s dim
    v_lat: tuple = (-3.0, 3.0)
    a_lon: tuple = (-8.0, 8.0)
    a_lat: tuple = (-3.0, 3.0)
    qp_iters: int = 150
    corridor: CorridorConfig = CorridorConfig()
    # "interval" = fast closed-form inflation (ssc/corridor.py);
    # "voxel" = grid-exact inflation matching ssc_map.cc (ssc/voxel.py)
    corridor_backend: str = "interval"


class _QPTemplate(NamedTuple):
    Q: np.ndarray        # [n, n] (without proximity weight folding)
    P: np.ndarray        # [n, n] proximity quadratic (unweighted)
    Bref: np.ndarray     # [n_ref, n] maps ctrl -> position at ref stamps (x s)
    A: np.ndarray        # [m_eq, n]
    C: np.ndarray        # [m_in, n]
    seg_of_pos_row: np.ndarray   # [m_in] segment index of each C row
    kind_of_row: np.ndarray      # [m_in] 0 pos / 1 vel / 2 acc
    n_eq: int


@functools.lru_cache(maxsize=None)
def _qp_template(M: int, duration: float, n_ref_per_seg: int) -> _QPTemplate:
    """Host-side assembly of the constant QP operators (numpy float64).

    Mirrors spline_generator.cc:368-725 with uniform segment duration.
    """
    n = M * N_ORD
    s = duration

    # objective: jerk hessian / s^3 per segment (spline_generator.cc:386)
    Q = np.zeros((n, n))
    for m in range(M):
        Q[m * N_ORD:(m + 1) * N_ORD, m * N_ORD:(m + 1) * N_ORD] = \
            JERK_HESSIAN / s ** 3

    # proximity: p(t_i) = s * sum_j x_j b_j(tau_i) at uniform stamps
    taus = (np.arange(n_ref_per_seg) + 1.0) / n_ref_per_seg
    rows = []
    for m in range(M):
        for tau in taus:
            row = np.zeros(n)
            for j in range(N_ORD):
                row[m * N_ORD + j] = s * comb(N_DEG, j) * tau ** j \
                    * (1 - tau) ** (N_DEG - j)
            rows.append(row)
    Bref = np.stack(rows)                       # [M * n_ref_per_seg, n]
    P = 2.0 * Bref.T @ Bref                     # d/dx of |Bref x - ref|^2

    # equality: continuity pos/vel/acc (scale s^(1-c) cancels on both sides
    # for uniform durations but is kept for fidelity), start PVA, end PV
    def d1(row, m, j, v):
        row[m * N_ORD + j] += v

    eq_rows, kinds = [], []
    for m in range(M - 1):
        for c in range(3):
            sc = s ** (1 - c)
            row = np.zeros(n)
            if c == 0:
                d1(row, m, 5, sc)
                d1(row, m + 1, 0, -sc)
            elif c == 1:
                d1(row, m, 4, -N_DEG * sc)
                d1(row, m, 5, N_DEG * sc)
                d1(row, m + 1, 0, N_DEG * sc)
                d1(row, m + 1, 1, -N_DEG * sc)
            else:
                k2 = N_DEG * (N_DEG - 1)
                d1(row, m, 3, k2 * sc)
                d1(row, m, 4, -2 * k2 * sc)
                d1(row, m, 5, k2 * sc)
                d1(row, m + 1, 0, -k2 * sc)
                d1(row, m + 1, 1, 2 * k2 * sc)
                d1(row, m + 1, 2, -k2 * sc)
            eq_rows.append(row)
    # start PVA (spline_generator.cc:555-600)
    for j, pat in enumerate([[(0, 1.0)],
                             [(0, -N_DEG), (1, N_DEG)],
                             [(0, 20.0), (1, -40.0), (2, 20.0)]]):
        row = np.zeros(n)
        for col, v in pat:
            d1(row, 0, col, v * s ** (1 - j))
        eq_rows.append(row)
    # end PV (end acc is disabled in the reference, ssc_planner.cc:312-314)
    for j, pat in enumerate([[(5, 1.0)],
                             [(4, -N_DEG), (5, N_DEG)]]):
        row = np.zeros(n)
        for col, v in pat:
            d1(row, M - 1, col, v * s ** (1 - j))
        eq_rows.append(row)
    A = np.stack(eq_rows)

    # inequalities (spline_generator.cc:648-714)
    in_rows, seg_of, kind_of = [], [], []
    for m in range(M):
        for j in range(N_ORD):
            row = np.zeros(n)
            d1(row, m, j, s)
            in_rows.append(row)
            seg_of.append(m)
            kind_of.append(0)
        for j in range(N_ORD - 1):
            row = np.zeros(n)
            d1(row, m, j, -N_DEG)
            d1(row, m, j + 1, N_DEG)
            in_rows.append(row)
            seg_of.append(m)
            kind_of.append(1)
        for j in range(N_ORD - 2):
            k2 = N_DEG * (N_DEG - 1) / s
            row = np.zeros(n)
            d1(row, m, j, k2)
            d1(row, m, j + 1, -2 * k2)
            d1(row, m, j + 2, k2)
            in_rows.append(row)
            seg_of.append(m)
            kind_of.append(2)
    C = np.stack(in_rows)
    return _QPTemplate(Q=Q, P=P, Bref=Bref, A=A, C=C,
                       seg_of_pos_row=np.asarray(seg_of),
                       kind_of_row=np.asarray(kind_of), n_eq=A.shape[0])


class SSCResult(NamedTuple):
    spline: BezierSpline
    corridor: Corridor
    qp: QPResult
    feasible: jnp.ndarray   # [] bool — corridor covers start & end


def ssc_plan(lane, ego_state, forward_traj, times, obs_trajs, obs_mask,
             geom_half_l, geom_half_w, cfg: SSCConfig = SSCConfig(),
             dtype=jnp.float32) -> SSCResult:
    """Plan one behavior's trajectory through its (s, d, t) corridor.

    lane: the behavior's reference Lane; ego_state [6] (steer-plant layout);
    forward_traj [T+1, 6] ego forward simulation (the QP's seed/proximity
    reference); times [T+1] uniform stamps starting at 0; obs_trajs
    [A, T+1, 6] predicted surround trajectories; obs_mask [A].
    """
    T = forward_traj.shape[0] - 1
    M = cfg.M
    duration = float(times[-1] - times[0]) / M if not isinstance(
        times, jnp.ndarray) else None
    # times is typically a host-constant linspace; require static duration
    times_np = np.asarray(times)
    duration = float(times_np[-1] - times_np[0]) / M
    n_ref_per_seg = T // M
    tpl = _qp_template(M, duration, n_ref_per_seg)

    # --- Frenet projections ---
    seed_s, seed_d = lane_mod.frenet_of_point(lane, forward_traj[:, 0:2])
    obs_s, obs_d = lane_mod.frenet_of_point(
        lane, obs_trajs[..., 0:2].reshape(-1, 2))
    obs_s = obs_s.reshape(obs_trajs.shape[:2])
    obs_d = obs_d.reshape(obs_trajs.shape[:2])

    fs0 = lane_mod.frenet_of_state(lane, ego_state[0:2], ego_state[2],
                                   ego_state[3])
    sdot0 = jnp.maximum(fs0.s_dot, 0.1)  # velocity_singularity_eps
    ddot0 = fs0.d_prime * fs0.s_dot
    fsT = lane_mod.frenet_of_state(lane, forward_traj[-1, 0:2],
                                   forward_traj[-1, 2], forward_traj[-1, 3])
    sdotT = jnp.maximum(fsT.s_dot, 0.1)
    ddotT = fsT.d_prime * fsT.s_dot

    if cfg.corridor_backend == "voxel":
        from dftpav_tpu.ssc.voxel import build_corridor_voxel
        corr = build_corridor_voxel(
            jnp.asarray(times_np, dtype), seed_s, seed_d, obs_s, obs_d,
            geom_half_l, geom_half_w, obs_mask, M)
    else:
        corr = build_corridor(jnp.asarray(times_np, dtype), seed_s, seed_d,
                              obs_s, obs_d, geom_half_l, geom_half_w,
                              obs_mask, M, cfg.corridor)

    # --- traced QP data, dims stacked as a leading batch of 2 (s, d) ---
    Q = jnp.asarray(tpl.Q + cfg.weight_proximity * tpl.P, dtype)
    A = jnp.asarray(tpl.A, dtype)
    C = jnp.asarray(tpl.C, dtype)
    Bref = jnp.asarray(tpl.Bref, dtype)
    G = jnp.concatenate([A, C], axis=0)

    ref = jnp.stack([seed_s[1:], seed_d[1:]], axis=0)       # [2, T]
    c_lin = -2.0 * cfg.weight_proximity * jnp.einsum(
        "rn,dr->dn", Bref, ref.astype(dtype))

    zeros_cont = jnp.zeros((3 * (M - 1),), dtype)
    b_s = jnp.concatenate([zeros_cont,
                           jnp.stack([fs0.s, sdot0,
                                      jnp.zeros((), dtype)]),
                           jnp.stack([seed_s[-1], sdotT])])
    b_d = jnp.concatenate([zeros_cont,
                           jnp.stack([fs0.d, ddot0, jnp.zeros((), dtype)]),
                           jnp.stack([seed_d[-1], ddotT])])
    b = jnp.stack([b_s, b_d]).astype(dtype)                 # [2, m_eq]

    seg = jnp.asarray(tpl.seg_of_pos_row)
    kind = jnp.asarray(tpl.kind_of_row)
    lo_s = jnp.where(kind == 0, corr.s_lb[seg],
                     jnp.where(kind == 1, cfg.v_lon[0], cfg.a_lon[0]))
    hi_s = jnp.where(kind == 0, corr.s_ub[seg],
                     jnp.where(kind == 1, cfg.v_lon[1], cfg.a_lon[1]))
    lo_d = jnp.where(kind == 0, corr.d_lb[seg],
                     jnp.where(kind == 1, cfg.v_lat[0], cfg.a_lat[0]))
    hi_d = jnp.where(kind == 0, corr.d_ub[seg],
                     jnp.where(kind == 1, cfg.v_lat[1], cfg.a_lat[1]))
    lo = jnp.concatenate([b, jnp.stack([lo_s, lo_d]).astype(dtype)], axis=1)
    hi = jnp.concatenate([b, jnp.stack([hi_s, hi_d]).astype(dtype)], axis=1)

    qp = admm_qp(jnp.broadcast_to(Q, (2,) + Q.shape), c_lin,
                 jnp.broadcast_to(G, (2,) + G.shape), lo, hi,
                 n_eq=tpl.n_eq, iters=cfg.qp_iters)

    ctrl = qp.x.reshape(2, M, N_ORD)
    spline = BezierSpline(ctrl=ctrl, t_lb=corr.t_lb, t_ub=corr.t_ub)
    from dftpav_tpu.ssc.qp import INFEASIBLE
    feasible = (jnp.all(corr.s_ub > corr.s_lb)
                & jnp.all(corr.d_ub > corr.d_lb) & corr.seed_free
                & jnp.all(qp.status != INFEASIBLE))
    return SSCResult(spline=spline, corridor=corr, qp=qp, feasible=feasible)
