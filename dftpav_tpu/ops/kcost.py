"""Kernel-layout objective: the full trajectory-optimization cost as a pure
function over [R, TB]-shaped values, consumed inside the whole-solve Pallas
kernel (ops/pallas_solve.py) and testable standalone against ops/bcost.

Same math as cost.total_cost / ops/bcost.total_cost_b (which carry the
reference citations to traj_optimizer.cpp); this module reshapes it for the
TPU kernel:

  * The MINCO solve and the constraint-grid basis sampling collapse into ONE
    host-precomputed matrix per derivative order: sample values are
    P_o @ rhs with P_o = Beta_o · M  [R, 13], where M = [Mh | Mi | Mt] is the
    constant normalized-time MINCO inverse (minco.minco_maps) and rhs packs
    (scaled head PVA | inner waypoints | scaled tail PVA) per dimension. The
    jerk energy becomes the quadratic form dT^-5 · rhs^T Q rhs with
    Q = M^T J M — the 6N x 6N banded system never materializes on device.
  * The flattened sample axis R = N * K1 (264 for the bench class) sits on
    sublanes (multiple of 8), the lane tile TB on the 128 lanes; x/y
    components are separate [R, TB] arrays; hull-vertex (E=4) and half-plane
    (H=4) axes are unrolled Python loops, exactly the layout proven out by
    ops/pallas_penalty.py.
  * Weights are compile-time floats (StaticW): the solve kernel retraces when
    limits change, which matches how configs are deployed (one weight set per
    fleet), and removes every scalar operand from the hot loop.

Supports S == 1 (the bench/replan class); multi-gear batches keep the
ops/bcost engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dftpav_tpu import minco
from dftpav_tpu.basis import sample_grid
from dftpav_tpu.cost import hull_arrays, smoothed_l1, virtual_to_real
from dftpav_tpu.types import Dims

DP = 16  # padded decision-variable rows (D = 2*(N-1)+1 = 15 for S=1, N=8)


@dataclasses.dataclass(frozen=True)
class StaticW:
    """Compile-time scalar parameters (types.Weights flattened to floats)."""

    wei_obs: float
    wei_surround: float
    wei_feas: float
    wei_time: float
    max_forward_vel: float
    max_forward_acc: float
    max_forward_cur: float
    max_backward_vel: float
    max_backward_acc: float
    max_backward_cur: float
    surround_clearance: float
    mini_t: float
    epis: float
    lse_alpha: float
    cost_scale: float
    veh_len: float
    le: tuple          # ((x, y) * E) hull vertices, clockwise
    e_hat: tuple       # unit edge vectors ((x, y) * E)

    @staticmethod
    def build(w, cfg, concrete: bool = True) -> "StaticW":
        """concrete=True bakes weights as Python floats (required inside the
        Pallas kernel — scalar operands are compile-time); concrete=False
        keeps them traced (fine for the plain-XLA round loop, where weights
        may be jit arguments)."""
        le_np, delta_np, veh_len = hull_arrays(cfg)
        dl = delta_np / np.linalg.norm(delta_np, axis=-1, keepdims=True)
        f = (lambda v: float(np.asarray(v))) if concrete else (lambda v: v)
        return StaticW(
            wei_obs=f(w.wei_obs), wei_surround=f(w.wei_surround),
            wei_feas=f(w.wei_feas), wei_time=f(w.wei_time),
            max_forward_vel=f(w.max_forward_vel),
            max_forward_acc=f(w.max_forward_acc),
            max_forward_cur=f(w.max_forward_cur),
            max_backward_vel=f(w.max_backward_vel),
            max_backward_acc=f(w.max_backward_acc),
            max_backward_cur=f(w.max_backward_cur),
            surround_clearance=f(w.surround_clearance),
            mini_t=f(w.mini_t), epis=f(w.epis), lse_alpha=f(w.lse_alpha),
            cost_scale=float(cfg.opt.cost_scale), veh_len=float(veh_len),
            le=tuple((float(a), float(b)) for a, b in le_np),
            e_hat=tuple((float(a), float(b)) for a, b in dl),
        )


class KConsts(NamedTuple):
    """Shared (lane-independent) constants, passed once per kernel program."""

    P: jnp.ndarray        # [3, R, 13] sample maps for orders 0..2
    Q: jnp.ndarray        # [16, 13]   jerk quadratic form (rows 13..15 zero)
    gridc: jnp.ndarray    # [2, R, 1]  rows: omg*inv_k (0 on masked), frac


class KScenario(NamedTuple):
    """Per-lane problem slabs, lane axis minor (S=1)."""

    bnd: jnp.ndarray      # [16, B] rows 0-5 head (px py vx vy ax ay), 6-11 tail
    misc: jnp.ndarray     # [8, B] rows: singul, obs_dt[O], obs_rel_t0[O], obs_mask[O]
    corr_n: jnp.ndarray   # [H, 2, R, B]
    corr_p: jnp.ndarray   # [H, 2, R, B]
    corr_m: jnp.ndarray   # [H, R, B] float
    obs_c: jnp.ndarray    # [O, 2, 6*Po, B] normalized coeffs, row 6*p + c


@functools.lru_cache(maxsize=None)
def _host_constants(N: int, K: int, Kdes: int):
    grid = sample_grid(N, K, Kdes)
    K1 = grid.tau.shape[1]
    R = N * K1
    Mh, Mi, Mt = minco.minco_maps(N)
    M = np.concatenate([Mh, Mi, Mt], axis=1)           # [6N, 13]
    P = np.zeros((3, R, M.shape[1]))
    for o in range(3):
        beta = grid.beta[o]                            # [N, K1, 6]
        big = np.zeros((R, 6 * N))
        for n in range(N):
            big[n * K1:(n + 1) * K1, 6 * n:6 * n + 6] = beta[n]
        P[o] = big @ M
    # jerk quadratic form: E = dT^-5 * rhs^T (M^T J M) rhs per dimension
    J = np.zeros((6 * N, 6 * N))
    blk = np.array([[36.0, 72.0, 120.0],
                    [72.0, 192.0, 360.0],
                    [120.0, 360.0, 720.0]])
    for n in range(N):
        J[6 * n + 3:6 * n + 6, 6 * n + 3:6 * n + 6] = blk
    Q = M.T @ J @ M                                    # [13, 13]
    Qp = np.zeros((DP, Q.shape[1]))
    Qp[:13] = Q
    omg_eff = (grid.omg * grid.inv_k[:, None] * grid.pen_mask).reshape(R, 1)
    frac = grid.frac.reshape(R, 1)
    gridc = np.stack([omg_eff, frac])                  # [2, R, 1]
    return P, Qp, gridc


def make_consts(dims: Dims, dtype=jnp.float32) -> KConsts:
    P, Q, gridc = _host_constants(dims.N, dims.K, dims.Kdes)
    return KConsts(P=jnp.asarray(P, dtype), Q=jnp.asarray(Q, dtype),
                   gridc=jnp.asarray(gridc, dtype))


def prep_scenario(batch, dims: Dims, dtype=jnp.float32) -> KScenario:
    """Batch-major Scenario (leading [B], S=1) -> kernel slabs (lane minor)."""
    assert dims.S == 1, "fused kernel covers the single-gear class"
    B = batch.ini_state.shape[0]
    K1 = dims.K1
    R = dims.N * K1
    f = lambda a: jnp.asarray(a, dtype)

    head = f(batch.ini_state[:, 0])                     # [B, 2, 3]
    tail = f(batch.fin_state[:, 0])
    bnd = jnp.zeros((DP, B), dtype)
    for c in range(3):
        bnd = bnd.at[2 * c].set(head[:, 0, c])
        bnd = bnd.at[2 * c + 1].set(head[:, 1, c])
        bnd = bnd.at[6 + 2 * c].set(tail[:, 0, c])
        bnd = bnd.at[6 + 2 * c + 1].set(tail[:, 1, c])

    O = dims.O
    # misc slab layout is 1 + 3*O rows (singul | obs_dt[O] | obs_rel_t0[O]
    # | obs_mask[O]); larger O needs a taller slab or the .at[] writes
    # silently drop under jit
    assert 1 + 3 * O <= 8, f"misc slab holds O <= 2 obstacles, got O={O}"
    misc = jnp.zeros((8, B), dtype)
    misc = misc.at[0].set(f(batch.singul[:, 0]))
    for o in range(O):
        misc = misc.at[1 + o].set(f(batch.obs_dt[:, o]))
        misc = misc.at[1 + O + o].set(f(batch.obs_rel_t0[:, o]))
        misc = misc.at[1 + 2 * O + o].set(f(batch.obs_mask[:, o]))

    # [B, R, H, 2] -> [H, 2, R, B]
    cn = jnp.transpose(f(batch.corr_n[:, 0]).reshape(B, R, dims.H, 2),
                       (2, 3, 1, 0))
    cp = jnp.transpose(f(batch.corr_p[:, 0]).reshape(B, R, dims.H, 2),
                       (2, 3, 1, 0))
    cm = jnp.transpose(f(batch.corr_mask[:, 0]).reshape(B, R, dims.H),
                       (2, 1, 0))
    if O > 0:
        obs = f(batch.obs_coef)                         # [B, O, Po, 6, 2]
        # rows 6p+c per dim: [B,O,Po,6,2] -> [O, 2, Po*6, B]
        obs_c = jnp.transpose(obs, (1, 4, 2, 3, 0)).reshape(
            O, 2, dims.Po * 6, B)
    else:
        obs_c = jnp.zeros((1, 2, dims.Po * 6, B), dtype)
    return KScenario(bnd=bnd, misc=misc, corr_n=cn, corr_p=cp, corr_m=cm,
                     obs_c=obs_c)


def _lse_max(vals):
    m = vals[0]
    for v in vals[1:]:
        m = jnp.maximum(m, v)
    return m


def _neg_lse_over(vals, alpha):
    """-logsumexp(-alpha * v_i)/alpha, stable (soft-min of the list)."""
    neg = [-alpha * v for v in vals]
    m = _lse_max(neg)
    s = 0.0
    for v in neg:
        s = s + jnp.exp(v - m)
    return -(jnp.log(s) + m) / alpha


def _pos_lse_over(vals, alpha):
    """logsumexp(alpha * v_i)/alpha (soft-max of the list)."""
    pos = [alpha * v for v in vals]
    m = _lse_max(pos)
    s = 0.0
    for v in pos:
        s = s + jnp.exp(v - m)
    return (jnp.log(s) + m) / alpha


def eval_cost(x, sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims):
    """Scaled objective per lane: x [DP, TB] -> f [TB].

    Pure jnp on values — identical trace inside the Pallas kernel and in
    plain XLA (used by tests for parity against ops/bcost).
    """
    N, K1, H, O, Po = dims.N, dims.K1, dims.H, dims.O, dims.Po
    R = N * K1
    dtype = x.dtype
    n_in = 2 * (N - 1)

    vt = x[n_in]                                         # [TB]
    T = virtual_to_real(vt, sw.mini_t)
    dT = T / N
    dT2 = dT * dT
    invdT = 1.0 / dT

    # rhs per dimension [13, TB]: scaled head PVA | inner | scaled tail PVA
    def rhs_dim(d):
        rows = [sc.bnd[d], sc.bnd[2 + d] * dT, sc.bnd[4 + d] * dT2]
        rows += [x[2 * j + d] for j in range(N - 1)]
        rows += [sc.bnd[6 + d], sc.bnd[8 + d] * dT, sc.bnd[10 + d] * dT2]
        return jnp.stack(rows)

    rhs_x, rhs_y = rhs_dim(0), rhs_dim(1)

    def dotc(A, Bm):
        return jax.lax.dot_general(A, Bm, (((1,), (0,)), ((), ())),
                                   preferred_element_type=dtype)

    Q = kc.Q[:13]
    jerk = (jnp.sum(rhs_x * dotc(Q, rhs_x), axis=0)
            + jnp.sum(rhs_y * dotc(Q, rhs_y), axis=0)) * invdT ** 5

    sig_x, sig_y = dotc(kc.P[0], rhs_x), dotc(kc.P[0], rhs_y)    # [R, TB]
    dsx = dotc(kc.P[1], rhs_x) * invdT[None]
    dsy = dotc(kc.P[1], rhs_y) * invdT[None]
    dd = invdT[None] * invdT[None]
    ddx = dotc(kc.P[2], rhs_x) * dd
    ddy = dotc(kc.P[2], rhs_y) * dd

    omg_eff = kc.gridc[0]                                # [R, 1]
    frac = kc.gridc[1]
    pen_mask = omg_eff > 0.0

    vn2 = dsx * dsx + dsy * dsy
    valid = pen_mask & (vn2 >= 1e-8)                     # |dsig| >= 1e-4
    safe_vn2 = jnp.where(valid, vn2, 1.0)
    inv_vn = jax.lax.rsqrt(safe_vn2)
    vel2_reci = 1.0 / safe_vn2
    vel2_reci_e = 1.0 / (safe_vn2 + sw.epis)
    vel32_reci_e = vel2_reci_e * jnp.sqrt(vel2_reci_e)

    wq = jnp.where(valid, omg_eff * dT[None], 0.0)       # [R, TB]

    sgl = sc.misc[0][None]                               # [1, TB] ±1
    fwd = sgl > 0.0
    max_vel = jnp.where(fwd, sw.max_forward_vel, sw.max_backward_vel)
    max_acc = jnp.where(fwd, sw.max_forward_acc, sw.max_backward_acc)
    max_cur = jnp.where(fwd, sw.max_forward_cur, sw.max_backward_cur)

    # ego rotation R = sgl * [[u, -v], [v, u]], u/v = normalized dsig
    u = dsx * inv_vn * sgl
    v = dsy * inv_vn * sgl

    # --- static corridor penalty (traj_optimizer.cpp:592-622) ---
    acc_obs = 0.0
    for e in range(len(sw.le)):
        lex, ley = sw.le[e]
        bx = sig_x + u * lex - v * ley
        by = sig_y + v * lex + u * ley
        for h in range(H):
            nx, ny = sc.corr_n[h, 0], sc.corr_n[h, 1]
            viol = nx * (bx - sc.corr_p[h, 0]) + ny * (by - sc.corr_p[h, 1])
            acc_obs = acc_obs + smoothed_l1(viol) * sc.corr_m[h]
    cost_obs = sw.wei_obs * jnp.sum(wq * acc_obs, axis=0)

    # --- feasibility (traj_optimizer.cpp:642-705) ---
    z_h1 = ddx * dsx + ddy * dsy
    z_h3 = ddy * dsx - ddx * dsy
    viola_vel = vn2 - max_vel * max_vel
    viola_acc = z_h1 * z_h1 * vel2_reci - max_acc * max_acc
    cur = z_h3 * vel32_reci_e
    feas = (smoothed_l1(viola_vel) + smoothed_l1(viola_acc)
            + 10.0 * (smoothed_l1(cur - max_cur) + smoothed_l1(-cur - max_cur)))
    cost_feas = sw.wei_feas * jnp.sum(wq * feas, axis=0)

    # --- dynamic obstacles (traj_optimizer.cpp:1311-1684) ---
    cost_dyn = 0.0
    alpha = sw.lse_alpha
    d_min = sw.surround_clearance + float(np.log(8.0)) / alpha
    E = len(sw.le)
    for o in range(O):
        dt_o = sc.misc[1 + o][None]                      # [1, TB]
        rel_t0 = sc.misc[1 + O + o][None]
        mask_o = sc.misc[1 + 2 * O + o][None] > 0.5
        pt_time = rel_t0 + frac * dT[None]               # [R, TB]
        total = dt_o * Po
        inside = pt_time < total
        ft = jnp.minimum(pt_time, total) / dt_o
        idxf = jnp.clip(jnp.floor(ft), 0.0, Po - 1.0)
        tau = ft - idxf

        cx, cy = sc.obs_c[o, 0], sc.obs_c[o, 1]          # [6*Po, TB]

        # in-horizon piecewise quintic (one-hot piece select, bcost style)
        def horner(tau_v, sel_fn, order):
            px = 0.0
            py = 0.0
            for p in range(Po):
                s = sel_fn(p)
                hx = 0.0
                hy = 0.0
                for c in range(5, order - 1, -1):
                    kf = 1.0
                    for r in range(order):
                        kf *= (c - r)
                    hx = hx * tau_v + kf * cx[6 * p + c][None]
                    hy = hy * tau_v + kf * cy[6 * p + c][None]
                px = px + s * hx
                py = py + s * hy
            return px, py

        sel_in = lambda p: (idxf == p).astype(dtype)
        p_in_x, p_in_y = horner(tau, sel_in, 0)
        inv_dt_o = 1.0 / dt_o

        # end state (tau = 1 on the last piece) for const-acc extrapolation
        pe_x = pe_y = ve_x = ve_y = ae_x = ae_y = 0.0
        for c in range(6):
            pe_x = pe_x + cx[6 * (Po - 1) + c][None]
            pe_y = pe_y + cy[6 * (Po - 1) + c][None]
            if c >= 1:
                ve_x = ve_x + c * cx[6 * (Po - 1) + c][None]
                ve_y = ve_y + c * cy[6 * (Po - 1) + c][None]
            if c >= 2:
                ae_x = ae_x + c * (c - 1) * cx[6 * (Po - 1) + c][None]
                ae_y = ae_y + c * (c - 1) * cy[6 * (Po - 1) + c][None]
        ve_x, ve_y = ve_x * inv_dt_o, ve_y * inv_dt_o
        ae_x, ae_y = ae_x * inv_dt_o * inv_dt_o, ae_y * inv_dt_o * inv_dt_o
        ex = jnp.maximum(pt_time - total, 0.0)
        pex_x = pe_x + ex * ve_x + 0.5 * ex * ex * ae_x
        pex_y = pe_y + ex * ve_y + 0.5 * ex * ex * ae_y

        p_u_x = jnp.where(inside, p_in_x, pex_x)
        p_u_y = jnp.where(inside, p_in_y, pex_y)

        # rotation frame: polynomial extrapolation of the last piece
        tau_r = jnp.where(inside, tau, 1.0 + ex / dt_o)

        # select on floats: a mixed bool-array/python-bool where() lowers to
        # an i8->i1 truncation Mosaic rejects
        def sel_r(p):
            s = (idxf == p).astype(dtype)
            return jnp.where(inside, s, 1.0 if p == Po - 1 else 0.0)
        v_r_x, v_r_y = horner(tau_r, sel_r, 1)
        vrn = jnp.sqrt(v_r_x * v_r_x + v_r_y * v_r_y)
        inv_vrn = 1.0 / jnp.maximum(vrn, 1e-12)
        uo = v_r_x * inv_vrn
        vo = v_r_y * inv_vrn

        rel_x = p_u_x - sig_x
        rel_y = p_u_y - sig_y
        near = rel_x * rel_x + rel_y * rel_y <= (1.5 * sw.veh_len) ** 2

        # hull geometry: ego normals/vertices use (u, v), obstacle (uo, vo)
        He, Ho, Rle, Rlo = [], [], [], []
        for e in range(E):
            ehx, ehy = sw.e_hat[e]
            lex, ley = sw.le[e]
            He.append((-v * ehx - u * ehy, u * ehx - v * ehy))
            Ho.append((-vo * ehx - uo * ehy, uo * ehx - vo * ehy))
            Rle.append((u * lex - v * ley, v * lex + u * ley))
            Rlo.append((uo * lex - vo * ley, vo * lex + uo * ley))

        d_all = []
        for e in range(E):
            hx, hy = He[e]
            d_tilde = hx * (rel_x - Rle[e][0]) + hy * (rel_y - Rle[e][1])
            cross = [hx * Rlo[f2][0] + hy * Rlo[f2][1] for f2 in range(E)]
            d_all.append(_neg_lse_over(cross, alpha) + d_tilde)
        for f2 in range(E):
            hx, hy = Ho[f2]
            d_tilde = hx * (-rel_x - Rlo[f2][0]) + hy * (-rel_y - Rlo[f2][1])
            cross = [hx * Rle[e][0] + hy * Rle[e][1] for e in range(E)]
            d_all.append(_neg_lse_over(cross, alpha) + d_tilde)

        d_val = d_min - _pos_lse_over(d_all, alpha)
        gate = near & mask_o & valid
        pen_d = jnp.where(gate, smoothed_l1(d_val), 0.0)
        cost_dyn = cost_dyn + jnp.sum(wq * pen_d, axis=0)

    cost_dyn = sw.wei_surround * cost_dyn
    total_cost = (jerk + sw.wei_time * T + cost_obs + cost_feas + cost_dyn)
    return sw.cost_scale * total_cost


def eval_fg(x, sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims):
    """(f [TB], g [DP, TB]) via per-lane VJP (lanes are independent, so a
    ones cotangent yields each lane's gradient)."""
    f, vjp = jax.vjp(lambda xv: eval_cost(xv, sc, kc, sw, dims), x)
    (g,) = vjp(jnp.ones_like(f))
    # padded decision rows carry no cost: zero their (already-zero) grads
    # defensively so L-BFGS reductions stay exact
    n_var = 2 * (dims.N - 1) + 1
    if DP > n_var:
        row = jax.lax.broadcasted_iota(jnp.int32, (DP, 1), 0)
        g = jnp.where(row < n_var, g, 0.0)
    return f, g
