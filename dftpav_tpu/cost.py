"""The trajectory-optimization objective, fully vectorized and differentiable.

This reproduces the *forward* cost of the reference's
PolyTrajOptimizer::costFunctionCallback + addPVAGradCost2CT + dynamicObsGradCostP
(traj_optimizer.cpp:206-350, 422-779, 1311-1684). All gradients — including the
hand-derived gradViola* coefficient/time chains, the MINCO adjoint solve
(calGrads_PT) and the gear-junction coupling (costFunctionCallback:308-319) —
are obtained with `jax.grad` through this function, which is mathematically
identical to the reference's analytic propagation (the reference differentiates
exactly this scalar).

Known intentional deviations from the reference (documented for parity review):
  * Multi-segment absolute-time offsets use a true cumulative sum of segment
    durations; the reference builds `trajtimes = [0, T0, T1, ...]`
    (traj_optimizer.cpp:230-234), which mis-offsets segments >= 2. Identical
    for S <= 2 (the common parking case).
  * The reference's dynamic-obstacle time gradient credits previous-segment
    duration sensitivity to the *current* segment (traj_optimizer.cpp:1674-1676);
    autodiff charges it to the correct segment. Identical for S == 1.

Shapes follow types.Scenario; this module is written for ONE scenario and is
vmapped by the solver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dftpav_tpu import minco
from dftpav_tpu.basis import SampleGrid, sample_grid
from dftpav_tpu.types import Dims, Scenario, Weights


# ---------------------------------------------------------------------------
# Smoothed L1 hinge (reference: positiveSmoothedL1, traj_optimizer.cpp:783-806)
# ---------------------------------------------------------------------------

_PE = 1.0e-4


def smoothed_l1(x: jnp.ndarray) -> jnp.ndarray:
    """C^2 hinge: 0 for x<=0, cubic blend on (0, pe), x - pe/2 above."""
    f3c = 1.0 / (_PE * _PE)
    f4c = -0.5 * f3c / _PE
    xc = jnp.clip(x, 0.0, _PE)  # clip keeps the cubic branch NaN-free under grad
    small = (f4c * xc + f3c) * xc * xc * xc
    return jnp.where(x <= 0.0, 0.0, jnp.where(x < _PE, small, x - 0.5 * _PE))


# ---------------------------------------------------------------------------
# Virtual <-> real time diffeomorphism (traj_optimizer.cpp:361-379)
# ---------------------------------------------------------------------------

def virtual_to_real(vt: jnp.ndarray, mini_t) -> jnp.ndarray:
    pos = (0.5 * vt + 1.0) * vt + 1.0
    neg = 1.0 / ((0.5 * vt - 1.0) * vt + 1.0)
    return jnp.where(vt > 0.0, pos, neg) + mini_t


def real_to_virtual(rt: jnp.ndarray, mini_t) -> jnp.ndarray:
    big = jnp.sqrt(jnp.maximum(2.0 * rt - 1.0 - 2.0 * mini_t, 0.0)) - 1.0
    small = 1.0 - jnp.sqrt(jnp.maximum(2.0 / jnp.maximum(rt - mini_t, 1e-12) - 1.0, 0.0))
    return jnp.where(rt > 1.0 + mini_t, big, small)


# ---------------------------------------------------------------------------
# Decision-variable packing (traj_optimizer.cpp:96-115)
# ---------------------------------------------------------------------------

class Unpacked(NamedTuple):
    inner: jnp.ndarray      # [S, N-1, 2]
    vt: jnp.ndarray         # [S] virtual total times
    gear_pos: jnp.ndarray   # [S-1, 2]
    gear_ang: jnp.ndarray   # [S-1]


def unpack(x: jnp.ndarray, dims: Dims) -> Unpacked:
    S, N = dims.S, dims.N
    n_in = S * (N - 1) * 2
    inner = x[:n_in].reshape(S, N - 1, 2)
    vt = x[n_in:n_in + S]
    gp = x[n_in + S:n_in + S + 2 * (S - 1)].reshape(max(S - 1, 0), 2)
    ga = x[n_in + S + 2 * (S - 1):]
    return Unpacked(inner, vt, gp, ga)


def pack(u: Unpacked) -> jnp.ndarray:
    return jnp.concatenate([
        u.inner.reshape(-1), u.vt, u.gear_pos.reshape(-1), u.gear_ang])


def initial_guess(scen: Scenario, w: Weights, dims: Dims) -> jnp.ndarray:
    """Build x0 from a scenario (reference: traj_optimizer.cpp:96-115)."""
    scen = jax.tree.map(jnp.asarray, scen)
    vt = real_to_virtual(scen.init_T, w.mini_t)
    if dims.S > 1:
        gear_pos = scen.fin_state[:-1, :, 0]
        gv = scen.fin_state[:-1, :, 1]
        gear_ang = jnp.arctan2(gv[:, 1], gv[:, 0])
    else:
        gear_pos = jnp.zeros((0, 2), scen.init_inner.dtype)
        gear_ang = jnp.zeros((0,), scen.init_inner.dtype)
    return pack(Unpacked(scen.init_inner, vt, gear_pos, gear_ang))


def boundary_states(scen: Scenario, u: Unpacked, w: Weights, dims: Dims):
    """Per-segment head/tail PVA with gear-junction decision overrides.

    Reference: costFunctionCallback:269-282 — junction position comes from the
    gear variable, junction velocity is ±non_sinv * (cos a, sin a) (tail of the
    earlier segment +, head of the later segment -), acceleration is kept from
    the front-end states.
    """
    heads, tails = scen.ini_state, scen.fin_state
    if dims.S > 1:
        ca = jnp.cos(u.gear_ang)
        sa = jnp.sin(u.gear_ang)
        gvel = w.non_sinv * jnp.stack([ca, sa], axis=-1)      # [S-1, 2]
        # junction j (between segments j and j+1) is real only when segment
        # j+1 is unmasked; padded tails must keep the original fin_state or
        # the last real segment's endpoint would become a free variable
        jmask = scen.seg_mask[1:, None]                        # [S-1, 1]
        heads = heads.at[1:, :, 0].set(
            jnp.where(jmask, u.gear_pos, heads[1:, :, 0]))
        heads = heads.at[1:, :, 1].set(
            jnp.where(jmask, -gvel, heads[1:, :, 1]))
        tails = tails.at[:-1, :, 0].set(
            jnp.where(jmask, u.gear_pos, tails[:-1, :, 0]))
        tails = tails.at[:-1, :, 1].set(
            jnp.where(jmask, gvel, tails[:-1, :, 1]))
    return heads, tails


# ---------------------------------------------------------------------------
# Dynamic-obstacle trajectory evaluation
# ---------------------------------------------------------------------------

def eval_obstacle(coef: jnp.ndarray, dt: jnp.ndarray, t: jnp.ndarray):
    """Evaluate one obstacle trajectory at times t (>= 0, may exceed horizon).

    coef: [Po, 6, 2] normalized coeffs, dt scalar piece duration, t [...].
    Returns (pos, vel, acc, R) with R the forward-singul rotation frame.
    Within the horizon this is piecewise polynomial evaluation; beyond, p/v/a
    use constant-acceleration extrapolation from the end state while R keeps
    extrapolating the last polynomial — both matching the reference
    (traj_optimizer.cpp:1372-1389 and Trajectory::getR via locatePieceIdx).
    """
    Po = coef.shape[0]
    total = dt * Po
    inside = t < total
    tc = jnp.minimum(t, total)
    idx = jnp.clip((tc / dt).astype(jnp.int32), 0, Po - 1)
    tau_in = tc / dt - idx.astype(coef.dtype)
    ci = coef[idx]
    p_in, v_in, a_in = minco.eval_derivatives(ci, dt, tau_in, orders=(0, 1, 2))
    # end state (tau = 1 on the last piece)
    ones = jnp.ones_like(t)
    p_end, v_end, a_end = minco.eval_derivatives(coef[-1], dt, ones,
                                                 orders=(0, 1, 2))
    ex = jnp.maximum(t - total, 0.0)[..., None]
    p_ex = p_end + ex * v_end + 0.5 * ex * ex * a_end
    v_ex = v_end + ex * a_end
    pos = jnp.where(inside[..., None], p_in, p_ex)
    vel = jnp.where(inside[..., None], v_in, v_ex)
    acc = jnp.where(inside[..., None], a_in, a_end)
    # rotation frame: polynomial extrapolation of the last piece beyond horizon
    # (idx is already clipped to the last piece there)
    tau_r = jnp.where(inside, tau_in, 1.0 + ex[..., 0] / dt)
    (v_r,) = minco.eval_derivatives(ci, dt, tau_r, orders=(1,))
    # rsqrt of the clamped SQUARED norm (sqrt(0) has an infinite
    # derivative; a masked zero-coefficient obstacle slot would NaN the
    # gradient through the select)
    vn2 = jnp.maximum(jnp.sum(v_r * v_r, axis=-1, keepdims=True), 1e-24)
    vu = v_r * jax.lax.rsqrt(vn2)
    R = jnp.stack([jnp.stack([vu[..., 0], -vu[..., 1]], -1),
                   jnp.stack([vu[..., 1], vu[..., 0]], -1)], -2)
    return pos, vel, acc, R


# ---------------------------------------------------------------------------
# Hull geometry constants
# ---------------------------------------------------------------------------

def hull_arrays(cfg, dtype=np.float64):
    """(vec_le [4,2], delta_le [4,2], inflated vehicle length) as numpy consts.

    Clockwise hull of the optimizer-inflated vehicle with the closing edge
    folded into delta (reference: traj_optimizer.cpp:1760-1776).
    """
    le = np.asarray(cfg.ego_hull(), dtype)
    delta = np.roll(le, -1, axis=0) - le
    veh_len = cfg.vehicle.length + 2.0 * cfg.opt.half_margin
    return le, delta, veh_len


# ---------------------------------------------------------------------------
# Per-segment penalty integrator (addPVAGradCost2CT)
# ---------------------------------------------------------------------------

def _rot_from_vel(dsig: jnp.ndarray, singul, inv_norm: jnp.ndarray):
    """ego_R = singul * [[dx, -dy], [dy, dx]] / |dsigma| (traj_optimizer.cpp:581-583)."""
    sg = jnp.asarray(singul, dsig.dtype)[..., None, None]
    R = jnp.stack([jnp.stack([dsig[..., 0], -dsig[..., 1]], -1),
                   jnp.stack([dsig[..., 1], dsig[..., 0]], -1)], -2)
    return sg * R * inv_norm[..., None, None]


def segment_penalties(b, dT, singul, trajtime, scen_seg, w: Weights,
                      grid: SampleGrid, hull, obstacles, dims: Dims):
    """Penalty integrals for one gear segment.

    b: [N,6,2] normalized coeffs; dT scalar; singul scalar ±1;
    trajtime: absolute start offset of this segment within the plan;
    scen_seg: (corr_n, corr_p, corr_mask) of this segment;
    obstacles: (obs_coef, obs_dt, obs_rel_t0, obs_mask) shared across segments.

    Returns dict(obs=, dyn=, feas=) of scalar costs.
    """
    dtype = b.dtype
    N, K1 = dims.N, dims.K1
    corr_n, corr_p, corr_mask = scen_seg
    le, delta_le, veh_len = hull
    le = jnp.asarray(le, dtype)
    delta_le = jnp.asarray(delta_le, dtype)
    beta = [jnp.asarray(bb, dtype) for bb in grid.beta[:3]]
    omg = jnp.asarray(grid.omg, dtype)
    pen_mask = jnp.asarray(grid.pen_mask)
    inv_k = jnp.asarray(grid.inv_k, dtype)
    frac = jnp.asarray(grid.frac, dtype)

    # --- sample sigma and derivatives: [N, K1, 2] ---
    sig = jnp.einsum("nkc,ncd->nkd", beta[0], b)
    dsig = jnp.einsum("nkc,ncd->nkd", beta[1], b) / dT
    ddsig = jnp.einsum("nkc,ncd->nkd", beta[2], b) / (dT * dT)

    vn2 = jnp.sum(dsig * dsig, axis=-1)
    valid = pen_mask & (jnp.sqrt(vn2) >= 1e-4)
    safe_vn2 = jnp.where(valid, vn2, 1.0)
    vn = jnp.sqrt(safe_vn2)
    inv_vn = 1.0 / vn
    vel2_reci = 1.0 / safe_vn2
    vel2_reci_e = 1.0 / (safe_vn2 + w.epis)
    vel32_reci_e = vel2_reci_e * jnp.sqrt(vel2_reci_e)

    step = dT * inv_k[:, None]                       # [N, 1] quadrature step
    wq = jnp.where(valid, omg * step, 0.0)           # [N, K1] quadrature weight

    # per-direction limits (traj_optimizer.cpp:447-457)
    fwd = singul > 0
    max_vel = jnp.where(fwd, w.max_forward_vel, w.max_backward_vel)
    max_acc = jnp.where(fwd, w.max_forward_acc, w.max_backward_acc)
    max_cur = jnp.where(fwd, w.max_forward_cur, w.max_backward_cur)

    ego_R = _rot_from_vel(dsig, singul, inv_vn)      # [N, K1, 2, 2]

    # --- static corridor penalty (traj_optimizer.cpp:592-622) ---
    bpt = sig[:, :, None, :] + jnp.einsum("nkij,ej->nkei", ego_R, le)
    viol = jnp.einsum("nkhd,nkehd->nkeh", corr_n,
                      bpt[:, :, :, None, :] - corr_p[:, :, None, :, :])
    pen = smoothed_l1(viol) * corr_mask[:, :, None, :]
    cost_obs = w.wei_obs * jnp.sum(wq[:, :, None, None] * pen)

    # --- feasibility (traj_optimizer.cpp:642-705) ---
    z_h1 = jnp.sum(ddsig * dsig, axis=-1)
    z_h3 = ddsig[..., 1] * dsig[..., 0] - ddsig[..., 0] * dsig[..., 1]
    viola_vel = vn2 - max_vel * max_vel
    acc2 = z_h1 * z_h1 * vel2_reci
    viola_acc = acc2 - max_acc * max_acc
    cur = z_h3 * vel32_reci_e
    cost_feas = w.wei_feas * jnp.sum(
        wq * (smoothed_l1(viola_vel) + smoothed_l1(viola_acc)
              + 10.0 * (smoothed_l1(cur - max_cur) + smoothed_l1(-cur - max_cur))))

    # --- dynamic obstacles (traj_optimizer.cpp:1311-1684) ---
    cost_dyn = jnp.zeros((), dtype)
    if dims.O > 0:
        obs_coef, obs_dt, obs_rel_t0, obs_mask = obstacles
        abs_t = trajtime + frac * dT                          # [N, K1]
        pt_time = obs_rel_t0[:, None, None] + abs_t[None]     # [O, N, K1]
        p_u, v_u, _a_u, R_u = jax.vmap(eval_obstacle)(obs_coef, obs_dt, pt_time)

        # proximity gate (traj_optimizer.cpp:1393)
        near = jnp.linalg.norm(p_u - sig[None], axis=-1) <= 1.5 * veh_len

        alpha = w.lse_alpha
        d_min = w.surround_clearance + jnp.log(8.0) / alpha

        dl_norm = jnp.linalg.norm(delta_le, axis=-1)          # [E]
        B = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], dtype)
        # ego-edge normals H_e = B R_e dle / |dle|: [N, K1, E, 2]
        H_e = jnp.einsum("ij,nkjl,el->nkei", B, ego_R, delta_le / dl_norm[:, None])
        # surround-edge normals H_o = B R_u dlo / |dlo|: [O, N, K1, F, 2]
        H_o = jnp.einsum("ij,onkjl,fl->onkfi", B, R_u, delta_le / dl_norm[:, None])

        Rl_e = jnp.einsum("nkij,ej->nkei", ego_R, le)         # ego vertices (body->world)
        Rl_o = jnp.einsum("onkij,fj->onkfi", R_u, le)         # obstacle vertices

        rel = p_u[:, :, :, None, :] - sig[None, :, :, None, :]  # [O,N,K1,1,2]
        d_U_tilde = jnp.sum(H_e[None] * (rel - Rl_e[None]), -1)      # [O,N,K1,E]
        cross_U = jnp.einsum("nkei,onkfi->onkef", H_e, Rl_o)         # [O,N,K1,E,F]
        d_U = -jax.nn.logsumexp(-alpha * cross_U, axis=-1) / alpha + d_U_tilde

        d_E_tilde = jnp.sum(H_o * (-rel - Rl_o), -1)                 # [O,N,K1,F]
        cross_E = jnp.einsum("onkfi,nkei->onkfe", H_o, Rl_e)
        d_E = -jax.nn.logsumexp(-alpha * cross_E, axis=-1) / alpha + d_E_tilde

        d_all = jnp.concatenate([d_U, d_E], axis=-1)                 # [O,N,K1,8]
        d_val = d_min - jax.nn.logsumexp(alpha * d_all, axis=-1) / alpha
        gate = near & obs_mask[:, None, None] & valid[None]
        pen_d = jnp.where(gate, smoothed_l1(d_val), 0.0)
        cost_dyn = w.wei_surround * jnp.sum(wq[None] * pen_d)

    return dict(obs=cost_obs, dyn=cost_dyn, feas=cost_feas)


# ---------------------------------------------------------------------------
# Total objective
# ---------------------------------------------------------------------------

def total_cost(x: jnp.ndarray, scen: Scenario, w: Weights, dims: Dims,
               cfg, trajtime_override=None) -> tuple[jnp.ndarray, dict]:
    """Scalar objective for one scenario; `jax.value_and_grad` of this is the
    solver oracle. Mirrors costFunctionCallback (traj_optimizer.cpp:206-350).

    trajtime_override ([S], optional) replaces the per-segment absolute-time
    offsets; used by ref_compat_value_and_grad to split the time chain."""
    scen = jax.tree.map(jnp.asarray, scen)
    dtype = x.dtype
    grid = sample_grid(dims.N, dims.K, dims.Kdes)
    maps = minco.maps_as(dims.N, dtype)
    hull = hull_arrays(cfg)

    u = unpack(x, dims)
    T = virtual_to_real(u.vt, w.mini_t)                       # [S]
    dT = T / dims.N
    heads, tails = boundary_states(scen, u, w, dims)

    bs = jax.vmap(minco.generate, in_axes=(0, 0, 0, 0, None))(
        u.inner, dT, heads, tails, maps)                      # [S, N, 6, 2]

    segw = scen.seg_mask.astype(dtype)
    smoo = jnp.sum(segw * jax.vmap(minco.jerk_cost)(bs, dT))
    time_cost = jnp.sum(segw * w.wei_time * T)

    if trajtime_override is not None:
        trajtime = trajtime_override
    elif getattr(cfg.opt, "ref_trajtime_compat", False):
        # reference quirk: segment i offset by T_{i-1} alone (see OptConfig)
        trajtime = jnp.concatenate([jnp.zeros((1,), dtype), T[:-1]])
    else:
        trajtime = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(T)[:-1]])
    obstacles = (scen.obs_coef, scen.obs_dt, scen.obs_rel_t0, scen.obs_mask)

    pens = jax.vmap(
        lambda b, dt, sg, tt, cn, cp, cm: segment_penalties(
            b, dt, sg, tt, (cn, cp, cm), w, grid, hull, obstacles, dims)
    )(bs, dT, scen.singul, trajtime, scen.corr_n, scen.corr_p, scen.corr_mask)

    cost_obs = jnp.sum(segw * pens["obs"])
    cost_dyn = jnp.sum(segw * pens["dyn"])
    cost_feas = jnp.sum(segw * pens["feas"])

    total = smoo + time_cost + cost_obs + cost_dyn + cost_feas
    aux = dict(smoo=smoo, time=time_cost, obs=cost_obs, dyn=cost_dyn,
               feas=cost_feas, T=T, coeffs=bs)
    return total, aux


def ref_compat_value_and_grad(scen: Scenario, w: Weights, dims: Dims, cfg,
                              scale=1.0):
    """(f, g) oracle that reproduces the compiled reference BIT-EXACTLY for
    S >= 2 with dynamic obstacles — including its gradient bug.

    The reference's hand-written adjoint misattributes the cross-segment
    absolute-time sensitivity: for a constraint point in segment i, the chain
    through the earlier segments' durations (pt_time depends on trajtime_i)
    is added to the CURRENT segment's gdT, once per earlier segment, scaled
    by the current piece count (traj_optimizer.cpp:1674-1676; after the
    1/piece_num in VirtualTGradCost this is exactly i * dF/dtrajtime_i added
    to dF/dT_i). Its forward cost meanwhile uses trajtime_i = T_{i-1}
    (traj_optimizer.cpp:230-234). The returned gradient is therefore NOT the
    gradient of the returned value — no forward-cost change can reproduce the
    C++ iterate path; this oracle splits the chain instead:

      f        = F(x, trajtime = [0, T_0, ..., T_{S-2}])
      g        = dF/dx holding trajtime fixed
      g_vt[i] += i * (dF/dtrajtime_i) * dT_i/dvt_i        (the reference bug)

    Verified bit-exact against the compiled C++ in
    tests/test_golden_cpp.py::test_golden_three_segments_trajtime_quirk.
    The default engine (total_cost + jax.grad) keeps the mathematically
    correct cumulative-sum attribution instead.
    """
    n_in = dims.S * (dims.N - 1) * 2

    def split(x, tt):
        f, _ = total_cost(x, scen, w, dims, cfg, trajtime_override=tt)
        return scale * f

    def fun(x):
        u = unpack(x, dims)
        T = virtual_to_real(u.vt, w.mini_t)
        tt = jnp.concatenate([jnp.zeros((1,), x.dtype), T[:-1]])
        f, (gx, gh) = jax.value_and_grad(split, argnums=(0, 1))(x, tt)
        # dT_i/dvt_i (virtual_to_real is elementwise)
        dT_dvt = jax.grad(
            lambda v: jnp.sum(virtual_to_real(v, w.mini_t)))(u.vt)
        idx = jnp.arange(dims.S, dtype=x.dtype)
        gx = gx.at[n_in:n_in + dims.S].add(idx * gh * dT_dvt)
        return f, gx

    return fun
