"""Batch-minor trajectory-optimization objective: same math as dftpav_tpu.cost
with the scenario batch as the trailing axis of every tensor.

Why: see dftpav_tpu.ops.__doc__. Every function here mirrors its namesake in
cost.py / minco.py (which carry the reference citations to
traj_optimizer.cpp / poly_traj_utils.hpp); shapes are the cost.py shapes with
a trailing [B]. Parity with the vmap path is enforced by tests/test_ops.py.

Scenario layout: `to_bminor` moves the leading batch axis of a standard
[B, ...] Scenario pytree to the back once, at solve entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dftpav_tpu import minco
from dftpav_tpu.basis import sample_grid
from dftpav_tpu.cost import (
    Unpacked,
    hull_arrays,
    smoothed_l1,
    virtual_to_real,
)
from dftpav_tpu.types import Dims, Scenario, Weights


def to_bminor(tree):
    """Move the leading batch axis of every leaf to the back."""
    return jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), tree)


# All contractions in this module run over dims of size 2..N-1 — far below
# anything the MXU helps with — so they are written as explicit
# broadcast-multiply-sum instead of einsum: einsum lowers to dot_general,
# and XLA:TPU materializes operand transposes around every dot_general
# (measured: the einsum form of this file moved 38 GB/eval at B=1024; the
# mul+sum form fuses into VPU passes with no copies).

def _apply_R(R, pts):
    """R [..., 2, 2, B] applied to constant points [E, 2] -> [..., E, 2, B]."""
    return jnp.sum(R[..., None, :, :, :] * pts[:, None, :, None], axis=-2)


def _rot90(R):
    """[[0,-1],[1,0]] @ R for R [..., 2, 2, B]."""
    return jnp.stack([-R[..., 1, :, :], R[..., 0, :, :]], axis=-3)


def from_bminor(tree):
    return jax.tree.map(lambda a: jnp.moveaxis(a, -1, 0), tree)


# ---------------------------------------------------------------------------
# Decision variables (cost.py unpack/pack with trailing B)
# ---------------------------------------------------------------------------

def unpack_b(x: jnp.ndarray, dims: Dims) -> Unpacked:
    S, N = dims.S, dims.N
    B = x.shape[-1]
    n_in = S * (N - 1) * 2
    inner = x[:n_in].reshape(S, N - 1, 2, B)
    vt = x[n_in:n_in + S]
    gp = x[n_in + S:n_in + S + 2 * (S - 1)].reshape(max(S - 1, 0), 2, B)
    ga = x[n_in + S + 2 * (S - 1):]
    return Unpacked(inner, vt, gp, ga)


def boundary_states_b(scen: Scenario, u: Unpacked, w: Weights, dims: Dims):
    """cost.boundary_states with trailing B (traj_optimizer.cpp:269-282)."""
    heads, tails = scen.ini_state, scen.fin_state          # [S, 2, 3, B]
    if dims.S > 1:
        ca = jnp.cos(u.gear_ang)                           # [S-1, B]
        sa = jnp.sin(u.gear_ang)
        gvel = w.non_sinv * jnp.stack([ca, sa], axis=-2)   # [S-1, 2, B]
        jmask = scen.seg_mask[1:, None]                    # [S-1, 1, B]
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
# MINCO generate / jerk cost (minco.py with trailing B)
# ---------------------------------------------------------------------------

def generate_b(inner, dT, heads, tails, maps):
    """minco.generate over [S, ..., B]: inner [S,N-1,2,B], dT [S,B],
    heads/tails [S,2,3,B] -> normalized coeffs [S,N,6,2,B]."""
    Mh, Mi, Mt = maps
    N = Mh.shape[0] // 6
    S, B = dT.shape[0], dT.shape[-1]
    ones = jnp.ones_like(dT)
    scale = jnp.stack([ones, dT, dT * dT])                 # [3, S, B]
    hs = heads.transpose(0, 2, 1, 3) * scale.transpose(1, 0, 2)[:, :, None]
    ts = tails.transpose(0, 2, 1, 3) * scale.transpose(1, 0, 2)[:, :, None]
    b = (jnp.sum(Mh[:, :, None, None] * hs[:, None], axis=2)
         + jnp.sum(Mi[:, :, None, None] * inner[:, None], axis=2)
         + jnp.sum(Mt[:, :, None, None] * ts[:, None], axis=2))
    return b.reshape(S, N, 6, 2, B)


def jerk_cost_b(b, dT):
    """minco.jerk_cost over [S,N,6,2,B] / [S,B] -> [S,B]."""
    k = jnp.arange(6, dtype=b.dtype)
    c = b * (dT[:, None, :] ** -k[:, None])[:, None, :, None, :]
    c3, c4, c5 = c[:, :, 3], c[:, :, 4], c[:, :, 5]        # [S,N,2,B]
    t1 = dT[:, None]
    t2 = t1 * t1
    t3 = t2 * t1
    t4 = t2 * t2
    t5 = t4 * t1
    e = (36.0 * jnp.sum(c3 * c3, -2) * t1
         + 144.0 * jnp.sum(c4 * c3, -2) * t2
         + 192.0 * jnp.sum(c4 * c4, -2) * t3
         + 240.0 * jnp.sum(c5 * c3, -2) * t3
         + 720.0 * jnp.sum(c5 * c4, -2) * t4
         + 720.0 * jnp.sum(c5 * c5, -2) * t5)               # [S,N,B]
    return jnp.sum(e, axis=1)


# ---------------------------------------------------------------------------
# Dynamic-obstacle evaluation (cost.eval_obstacle with trailing B, no gather)
# ---------------------------------------------------------------------------

def _tau_pows(tau):
    """tau [..., B] -> powers (1, tau, ..., tau^5) stacked at axis -2:
    [..., 6, B] (keeps the batch minor)."""
    pows = [jnp.ones_like(tau)]
    for _ in range(5):
        pows.append(pows[-1] * tau)
    return jnp.stack(pows, axis=-2)


def eval_obstacle_b(coef, dt, t):
    """cost.eval_obstacle with trailing B and the piece gather replaced by a
    static sum over pieces (gathers along padded minor dims are slow on TPU;
    Po extra polynomial evals fuse into the same VPU pass).

    coef: [O,Po,6,2,B]; dt: [O,B]; t: [O,S,N,K1,B].
    Returns pos/vel [O,S,N,K1,2,B], R [O,S,N,K1,2,2,B].
    """
    O, Po = coef.shape[0], coef.shape[1]
    dtb = dt[:, None, None, None]                          # [O,1,1,1,B]
    total = dtb * Po
    inside = t < total
    tc = jnp.minimum(t, total)
    ft = tc / dtb                                           # piece-float time
    idxf = jnp.clip(jnp.floor(ft), 0, Po - 1)
    tau_in = ft - idxf

    pows = _tau_pows(tau_in)                                # [O,S,N,K1,6,B]
    k = np.arange(6)
    # basis rows for orders 0..2
    b0 = pows
    b1 = jnp.concatenate([jnp.zeros_like(pows[..., :1, :]),
                          pows[..., :5, :]
                          * jnp.asarray(k[1:], coef.dtype)[:, None]], axis=-2)
    b2 = jnp.concatenate([jnp.zeros_like(pows[..., :2, :]),
                          pows[..., :4, :]
                          * jnp.asarray((k[2:] * (k[2:] - 1)).astype(np.float64),
                                        coef.dtype)[:, None]], axis=-2)

    def poly(basis, order):
        # sum over pieces with a one-hot select; fuses into one VPU pass
        acc = 0.0
        for po in range(Po):
            sel = (idxf == po).astype(coef.dtype)[..., None, :]  # [O,S,N,K1,1,B]
            ci = coef[:, po]                                      # [O,6,2,B]
            val = jnp.sum((basis * sel)[..., None, :]
                          * ci[:, None, None, None], axis=-3)
            acc = acc + val
        return acc * dtb[..., None, :] ** (-order)

    # NOTE: basis has axis order [O,S,N,K1,6,B]
    p_in = poly(b0, 0)
    v_in = poly(b1, 1)
    a_in = poly(b2, 2)

    # end state at tau=1 of the last piece
    c_last = coef[:, -1]                                    # [O,6,2,B]
    kk = jnp.asarray(np.arange(6, dtype=np.float64), coef.dtype)
    p_end = jnp.sum(c_last, axis=1)                         # [O,2,B]
    v_end = jnp.sum(c_last * kk[:, None, None], axis=1) / dt[:, None]
    a_end = jnp.sum(c_last * (kk * (kk - 1.0))[:, None, None],
                    axis=1) / (dt * dt)[:, None]

    ex = jnp.maximum(t - total, 0.0)[..., None, :]          # [O,S,N,K1,1,B]
    bshape = (O,) + (1,) * (t.ndim - 2)
    p_endb = p_end.reshape(bshape + p_end.shape[1:])
    v_endb = v_end.reshape(bshape + v_end.shape[1:])
    a_endb = a_end.reshape(bshape + a_end.shape[1:])
    p_ex = p_endb + ex * v_endb + 0.5 * ex * ex * a_endb
    v_ex = v_endb + ex * a_endb
    ins = inside[..., None, :]
    pos = jnp.where(ins, p_in, p_ex)
    vel = jnp.where(ins, v_in, v_ex)
    acc = jnp.where(ins, a_in, a_endb + jnp.zeros_like(a_in))

    # rotation frame: polynomial extrapolation of the last piece past the end
    tau_r = jnp.where(inside, tau_in, 1.0 + ex[..., 0, :] / dtb)
    pows_r = _tau_pows(tau_r)
    b1r = jnp.concatenate([jnp.zeros_like(pows_r[..., :1, :]),
                           pows_r[..., :5, :]
                           * jnp.asarray(k[1:], coef.dtype)[:, None]], axis=-2)
    v_r = 0.0
    for po in range(Po):
        sel = jnp.where(inside, (idxf == po), po == Po - 1)
        msk = b1r * sel.astype(coef.dtype)[..., None, :]
        v_r = v_r + jnp.sum(msk[..., None, :]
                            * coef[:, po][:, None, None, None], axis=-3)
    # rsqrt of the clamped SQUARED norm (sqrt(0) has an infinite
    # derivative; a masked zero-coefficient obstacle slot would NaN the
    # gradient through the piece-select)
    vn2 = jnp.maximum(jnp.sum(v_r * v_r, axis=-2), 1e-24)
    vu = v_r * jax.lax.rsqrt(vn2)[..., None, :]
    R = jnp.stack([jnp.stack([vu[..., 0, :], -vu[..., 1, :]], -2),
                   jnp.stack([vu[..., 1, :], vu[..., 0, :]], -2)], -3)
    return pos, vel, acc, R


# ---------------------------------------------------------------------------
# Total objective (cost.total_cost + cost.segment_penalties with trailing B)
# ---------------------------------------------------------------------------

def _rot_from_vel_b(dsig, singul, inv_norm):
    """[S,N,K1,2,B] -> ego_R [S,N,K1,2,2,B] (traj_optimizer.cpp:581-583)."""
    sg = singul[:, None, None, None, None]                  # [S,1,1,1,1,B]
    R = jnp.stack([jnp.stack([dsig[..., 0, :], -dsig[..., 1, :]], -2),
                   jnp.stack([dsig[..., 1, :], dsig[..., 0, :]], -2)], -3)
    return sg * R * inv_norm[..., None, None, :]


def total_cost_b(x: jnp.ndarray, scen: Scenario, w: Weights, dims: Dims,
                 cfg) -> tuple[jnp.ndarray, dict]:
    """Per-lane objective [B] for a batch-minor scenario pytree.

    Mirrors cost.total_cost + cost.segment_penalties exactly (same reference
    citations); the S-segment vmap becomes an explicit leading S axis.
    """
    dtype = x.dtype
    S, N, K1 = dims.S, dims.N, dims.K1
    B = x.shape[-1]
    grid = sample_grid(dims.N, dims.K, dims.Kdes)
    maps = minco.maps_as(dims.N, dtype)
    le_np, delta_np, veh_len = hull_arrays(cfg)
    le = jnp.asarray(le_np, dtype)
    delta_le = jnp.asarray(delta_np, dtype)

    u = unpack_b(x, dims)
    T = virtual_to_real(u.vt, w.mini_t)                     # [S,B]
    dT = T / N
    heads, tails = boundary_states_b(scen, u, w, dims)
    bs = generate_b(u.inner, dT, heads, tails, maps)        # [S,N,6,2,B]

    segw = scen.seg_mask.astype(dtype)                      # [S,B]
    smoo = jnp.sum(segw * jerk_cost_b(bs, dT), axis=0)      # [B]
    time_cost = jnp.sum(segw * w.wei_time * T, axis=0)

    if getattr(cfg.opt, "ref_trajtime_compat", False):
        trajtime = jnp.concatenate([jnp.zeros((1, B), dtype), T[:-1]])
    else:
        trajtime = jnp.concatenate(
            [jnp.zeros((1, B), dtype), jnp.cumsum(T, axis=0)[:-1]])  # [S,B]

    beta = [jnp.asarray(bb, dtype) for bb in grid.beta[:3]]
    omg = jnp.asarray(grid.omg, dtype)
    pen_mask = jnp.asarray(grid.pen_mask)
    inv_k = jnp.asarray(grid.inv_k, dtype)
    frac = jnp.asarray(grid.frac, dtype)

    # --- samples [S,N,K1,2,B] ---
    def sample(betar):
        # [N,K1,6] x [S,N,6,2,B] -> [S,N,K1,2,B], contraction over 6
        return jnp.sum(betar[:, :, :, None, None] * bs[:, :, None], axis=3)

    sig = sample(beta[0])
    dsig = sample(beta[1]) / dT[:, None, None, None]
    ddsig = sample(beta[2]) / (dT * dT)[:, None, None, None]

    vn2 = jnp.sum(dsig * dsig, axis=-2)                     # [S,N,K1,B]
    valid = pen_mask[None, :, :, None] & (jnp.sqrt(vn2) >= 1e-4)
    safe_vn2 = jnp.where(valid, vn2, 1.0)
    vn = jnp.sqrt(safe_vn2)
    inv_vn = 1.0 / vn
    vel2_reci = 1.0 / safe_vn2
    vel2_reci_e = 1.0 / (safe_vn2 + w.epis)
    vel32_reci_e = vel2_reci_e * jnp.sqrt(vel2_reci_e)

    # quadrature weight [S,N,K1,B]; the segment mask is folded in here, which
    # is exactly cost.total_cost's `segw * pens` reduction (every penalty
    # term is wq-weighted)
    step_full = dT[:, None, None, :] * inv_k[None, :, None, None]
    wq = jnp.where(valid, omg[None, :, :, None] * step_full, 0.0)
    wq = wq * segw[:, None, None, :]

    fwd = scen.singul > 0                                   # [S,B]
    def lim(a, b2):
        return jnp.where(fwd, a, b2)[:, None, None, :]
    max_vel = lim(w.max_forward_vel, w.max_backward_vel)
    max_acc = lim(w.max_forward_acc, w.max_backward_acc)
    max_cur = lim(w.max_forward_cur, w.max_backward_cur)

    sgl = scen.singul.astype(dtype)
    ego_R = _rot_from_vel_b(dsig, sgl, inv_vn)              # [S,N,K1,2,2,B]

    # --- static corridor penalty (traj_optimizer.cpp:592-622) ---
    backend = getattr(cfg.opt, "corridor_backend", "xla")
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        from dftpav_tpu.ops.pallas_penalty import corridor_cost_pallas

        cost_obs = corridor_cost_pallas(
            sig, dsig, sgl, wq, scen.corr_n, scen.corr_p, scen.corr_mask,
            le_np, w.wei_obs,
            interpret=jax.default_backend() != "tpu")
    else:
        # bpt [S,N,K1,E,2,B] = sig + R @ le
        bpt = sig[:, :, :, None] + _apply_R(ego_R, le)
        # viol [S,N,K1,E,H,B]
        rel_c = bpt[:, :, :, :, None, :, :] - scen.corr_p[:, :, :, None]
        viol = jnp.sum(scen.corr_n[:, :, :, None] * rel_c, axis=-2)
        pen = smoothed_l1(viol) * scen.corr_mask[:, :, :, None]
        cost_obs = w.wei_obs * jnp.sum(
            wq[:, :, :, None, None, :] * pen, axis=(0, 1, 2, 3, 4))

    # --- feasibility (traj_optimizer.cpp:642-705) ---
    z_h1 = jnp.sum(ddsig * dsig, axis=-2)
    z_h3 = ddsig[..., 1, :] * dsig[..., 0, :] - ddsig[..., 0, :] * dsig[..., 1, :]
    viola_vel = vn2 - max_vel * max_vel
    acc2 = z_h1 * z_h1 * vel2_reci
    viola_acc = acc2 - max_acc * max_acc
    cur = z_h3 * vel32_reci_e
    cost_feas = w.wei_feas * jnp.sum(
        wq * (smoothed_l1(viola_vel) + smoothed_l1(viola_acc)
              + 10.0 * (smoothed_l1(cur - max_cur)
                        + smoothed_l1(-cur - max_cur))), axis=(0, 1, 2))

    # --- dynamic obstacles (traj_optimizer.cpp:1311-1684) ---
    cost_dyn = jnp.zeros((B,), dtype)
    if dims.O > 0:
        abs_t = trajtime[:, None, None, :] + frac[None, :, :, None] * dT[:, None, None, :]
        pt_time = scen.obs_rel_t0[:, None, None, None, :] + abs_t[None]
        p_u, v_u, _a_u, R_u = eval_obstacle_b(scen.obs_coef, scen.obs_dt,
                                              pt_time)      # [O,S,N,K1,2,B]

        near = jnp.sqrt(jnp.sum((p_u - sig[None]) ** 2, axis=-2)) \
            <= 1.5 * veh_len                                 # [O,S,N,K1,B]

        alpha = w.lse_alpha
        d_min = w.surround_clearance + jnp.log(8.0) / alpha

        dl_norm = np.linalg.norm(delta_np, axis=-1)
        e_hat = jnp.asarray(delta_np / dl_norm[:, None], dtype)  # [E,2]
        H_e = _apply_R(_rot90(ego_R), e_hat)                 # [S,N,K1,E,2,B]
        H_o = _apply_R(_rot90(R_u), e_hat)                   # [O,S,N,K1,F,2,B]

        Rl_e = _apply_R(ego_R, le)                           # [S,N,K1,E,2,B]
        Rl_o = _apply_R(R_u, le)                             # [O,S,N,K1,F,2,B]

        rel = p_u[:, :, :, :, None] - sig[None, :, :, :, None]  # [O,S,N,K1,1,2,B]
        d_U_tilde = jnp.sum(H_e[None] * (rel - Rl_e[None]), axis=-2)  # [O,S,N,K1,E,B]
        # cross_U[o,...,e,f,B] = sum_i H_e[...,e,i,B] Rl_o[o,...,f,i,B]
        cross_U = jnp.sum(H_e[None, :, :, :, :, None] * Rl_o[:, :, :, :, None],
                          axis=-2)
        d_U = -jax.nn.logsumexp(-alpha * cross_U, axis=-2) / alpha + d_U_tilde

        d_E_tilde = jnp.sum(H_o * (-rel - Rl_o), axis=-2)             # [O,S,N,K1,F,B]
        cross_E = jnp.sum(H_o[:, :, :, :, :, None] * Rl_e[None, :, :, :, None],
                          axis=-2)
        d_E = -jax.nn.logsumexp(-alpha * cross_E, axis=-2) / alpha + d_E_tilde

        d_all = jnp.concatenate([d_U, d_E], axis=-2)                  # [O,S,N,K1,8,B]
        d_val = d_min - jax.nn.logsumexp(alpha * d_all, axis=-2) / alpha
        gate = near & scen.obs_mask[:, None, None, None] & valid[None]
        pen_d = jnp.where(gate, smoothed_l1(d_val), 0.0)
        cost_dyn = w.wei_surround * jnp.sum(
            wq[None] * pen_d, axis=(0, 1, 2, 3))

    total = smoo + time_cost + cost_obs + cost_dyn + cost_feas
    aux = dict(smoo=smoo, time=time_cost, obs=cost_obs, dyn=cost_dyn,
               feas=cost_feas, T=T, coeffs=bs)
    return total, aux
