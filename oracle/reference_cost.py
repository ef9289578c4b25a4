"""NumPy scalar-loop oracle of the reference planner's objective.

This follows the control flow of the C++ cost evaluation point-by-point
(PolyTrajOptimizer::costFunctionCallback / addPVAGradCost2CT /
dynamicObsGradCostP, /root/reference/src/Plan/traj_planner/src/
traj_optimizer.cpp:206-779,1311-1707) as an *independent* reimplementation:
real-time polynomial bases, per-sample Python loops, the same guards and
weights. It exists purely to validate the vectorized JAX objective in
dftpav_tpu/cost.py — any semantic divergence between the two shows up as a
cost mismatch in tests/test_cost.py.
"""

from __future__ import annotations

import numpy as np

from dftpav_tpu import minco
from dftpav_tpu.types import Dims

PE = 1.0e-4


def smoothed_l1(x: float) -> float:
    if x <= 0.0:
        return 0.0
    if x < PE:
        f3c = 1.0 / (PE * PE)
        f4c = -0.5 * f3c / PE
        return (f4c * x + f3c) * x * x * x
    return x - 0.5 * PE


def virtual_to_real(vt: np.ndarray, mini_t: float) -> np.ndarray:
    out = np.empty_like(vt)
    for i, v in enumerate(vt):
        out[i] = ((0.5 * v + 1.0) * v + 1.0 if v > 0.0
                  else 1.0 / ((0.5 * v - 1.0) * v + 1.0)) + mini_t
    return out


def log_sum_exp(alpha: float, dists: np.ndarray) -> float:
    d0 = dists.max() if alpha > 0 else dists.min()
    return float(np.log(np.exp(alpha * (dists - d0)).sum()) / alpha + d0)


def _gen_coeffs(inner, dT, head, tail, N):
    """Real-time coefficients via a dense solve of the same normalized system."""
    A = minco.minco_matrix(N)
    rhs = np.zeros((6 * N, 2))
    rhs[0], rhs[1], rhs[2] = head[:, 0], head[:, 1] * dT, head[:, 2] * dT * dT
    for i in range(N - 1):
        rhs[6 * i + 5] = inner[i]
    rhs[-3], rhs[-2], rhs[-1] = tail[:, 0], tail[:, 1] * dT, tail[:, 2] * dT * dT
    b = np.linalg.solve(A, rhs).reshape(N, 6, 2)
    k = np.arange(6, dtype=float)
    return b * (dT ** -k)[None, :, None]  # c[k] multiplies t^k


def _poly_eval(c, t, order):
    """Evaluate d^order/dt^order of sum_k c[k] t^k; c: [6, 2]."""
    out = np.zeros(2)
    for k in range(order, 6):
        f = 1.0
        for r in range(order):
            f *= k - r
        out += f * c[k] * t ** (k - order)
    return out


def _obstacle_state(coef, dt, t):
    """Match cost.eval_obstacle / the reference's extrapolation semantics."""
    Po = coef.shape[0]
    total = dt * Po
    karr = np.arange(6, dtype=float)
    if t < total:
        idx = min(int(t / dt), Po - 1)
        creal = coef[idx] * (dt ** -karr)[:, None]
        tl = t - idx * dt
        p = _poly_eval(creal, tl, 0)
        v = _poly_eval(creal, tl, 1)
        a = _poly_eval(creal, tl, 2)
        vr = v
    else:
        creal = coef[Po - 1] * (dt ** -karr)[:, None]
        pe = _poly_eval(creal, dt, 0)
        ve = _poly_eval(creal, dt, 1)
        ae = _poly_eval(creal, dt, 2)
        ex = t - total
        p = pe + ve * ex + 0.5 * ae * ex * ex
        v = ve + ae * ex
        a = ae
        vr = _poly_eval(creal, dt + ex, 1)  # frame keeps polynomial extrapolation
    vn = max(np.linalg.norm(vr), 1e-12)
    R = np.array([[vr[0], -vr[1]], [vr[1], vr[0]]]) / vn
    return p, v, a, R


def reference_total_cost(x, scen, w, dims: Dims, cfg) -> dict:
    """Forward cost replicating the C++ loop structure. Returns component dict."""
    S, N = dims.S, dims.N
    n_in = S * (N - 1) * 2
    inner = np.asarray(x[:n_in], float).reshape(S, N - 1, 2)
    vt = np.asarray(x[n_in:n_in + S], float)
    gear_pos = np.asarray(x[n_in + S:n_in + S + 2 * (S - 1)], float).reshape(S - 1, 2)
    gear_ang = np.asarray(x[n_in + S + 2 * (S - 1):], float)

    T = virtual_to_real(vt, float(w.mini_t))
    B_h = np.array([[0.0, -1.0], [1.0, 0.0]])

    vp = cfg.vehicle.inflate(cfg.opt.half_margin)
    hl, hw, dcr = vp.length / 2.0, vp.width / 2.0, vp.d_cr
    vec_le = [np.array([dcr + hl, hw]), np.array([dcr + hl, -hw]),
              np.array([dcr - hl, -hw]), np.array([dcr - hl, hw])]
    vec_le.append(vec_le[0])
    vec_lo = list(vec_le)
    E = len(vec_le) - 1
    F = len(vec_lo) - 1

    alpha_lse = float(w.lse_alpha)
    d_min = float(w.surround_clearance) + np.log(8.0) / alpha_lse

    costs = dict(smoo=0.0, time=0.0, obs=0.0, dyn=0.0, feas=0.0)
    trajtime = 0.0

    obs_coef = np.asarray(scen.obs_coef, float)
    obs_dt = np.asarray(scen.obs_dt, float)
    obs_rel = np.asarray(scen.obs_rel_t0, float)
    obs_mask = np.asarray(scen.obs_mask, bool)

    for s in range(S):
        if not bool(scen.seg_mask[s]):
            continue
        head = np.array(scen.ini_state[s], float)
        tail = np.array(scen.fin_state[s], float)
        if s > 0:
            th = gear_ang[s - 1]
            head[:, 0] = gear_pos[s - 1]
            head[:, 1] = [-w.non_sinv * np.cos(th), -w.non_sinv * np.sin(th)]
        if s < S - 1:
            th = gear_ang[s]
            tail[:, 0] = gear_pos[s]
            tail[:, 1] = [w.non_sinv * np.cos(th), w.non_sinv * np.sin(th)]

        dT = T[s] / N
        c = _gen_coeffs(inner[s], dT, head, tail, N)
        singul = int(scen.singul[s])

        # jerk energy (getTrajJerkCost closed form)
        t1, t2 = dT, dT * dT
        t3, t4, t5 = t2 * dT, t2 * t2, t2 * t2 * dT
        for i in range(N):
            c3, c4, c5 = c[i, 3], c[i, 4], c[i, 5]
            costs["smoo"] += (36 * c3 @ c3 * t1 + 144 * c4 @ c3 * t2
                              + 192 * c4 @ c4 * t3 + 240 * c5 @ c3 * t3
                              + 720 * c5 @ c4 * t4 + 720 * c5 @ c5 * t5)
        costs["time"] += float(w.wei_time) * T[s]

        if singul > 0:
            max_vel, max_acc, max_cur = (float(w.max_forward_vel),
                                         float(w.max_forward_acc),
                                         float(w.max_forward_cur))
        else:
            max_vel, max_acc, max_cur = (float(w.max_backward_vel),
                                         float(w.max_backward_acc),
                                         float(w.max_backward_cur))

        for i in range(N):
            K = dims.Kdes if (i == 0 or i == N - 1) else dims.K
            step = dT / K
            for j in range(K + 1):
                s1 = j * step
                sig = _poly_eval(c[i], s1, 0)
                dsig = _poly_eval(c[i], s1, 1)
                ddsig = _poly_eval(c[i], s1, 2)
                omg = 0.5 if (j == 0 or j == K) else 1.0
                z_h0 = np.linalg.norm(dsig)
                if z_h0 < 1e-4 or (j == 0 and i == 0) or (i == N - 1 and j == K):
                    continue
                vel2_reci = 1.0 / (z_h0 * z_h0)
                vel2_reci_e = 1.0 / (z_h0 * z_h0 + float(w.epis))
                vel32 = vel2_reci_e * np.sqrt(vel2_reci_e)
                ego_R = (singul * np.array([[dsig[0], -dsig[1]],
                                            [dsig[1], dsig[0]]]) / z_h0)

                # corridor
                for le in vec_le[:4]:
                    bpt = sig + ego_R @ le
                    for h in range(dims.H):
                        if not bool(scen.corr_mask[s, i, j, h]):
                            continue
                        nvec = np.asarray(scen.corr_n[s, i, j, h], float)
                        pvec = np.asarray(scen.corr_p[s, i, j, h], float)
                        viol = nvec @ (bpt - pvec)
                        if viol > 0:
                            costs["obs"] += (omg * step * float(w.wei_obs)
                                             * smoothed_l1(viol))

                # feasibility
                z_h1 = ddsig @ dsig
                z_h3 = ddsig @ B_h @ dsig
                viola_vel = z_h0 * z_h0 - max_vel**2
                viola_acc = z_h1 * z_h1 * vel2_reci - max_acc**2
                cur = z_h3 * vel32
                wf = float(w.wei_feas)
                costs["feas"] += omg * step * wf * smoothed_l1(viola_vel)
                costs["feas"] += omg * step * wf * smoothed_l1(viola_acc)
                costs["feas"] += omg * step * wf * 10.0 * smoothed_l1(cur - max_cur)
                costs["feas"] += omg * step * wf * 10.0 * smoothed_l1(-cur - max_cur)

                # dynamic obstacles
                for o in range(dims.O):
                    if not obs_mask[o]:
                        continue
                    pt_time = obs_rel[o] + trajtime + i * dT + s1
                    p_u, _v_u, _a_u, R_u = _obstacle_state(
                        obs_coef[o], obs_dt[o], pt_time)
                    if np.linalg.norm(p_u - sig) > vp.length * 1.5:
                        continue
                    d_U = np.zeros(E)
                    for e in range(E):
                        le, dle = vec_le[e], vec_le[e + 1] - vec_le[e]
                        Ht = B_h @ ego_R @ dle / np.linalg.norm(dle)
                        d_tilde = Ht @ (p_u - sig - ego_R @ le)
                        cross = np.array([Ht @ (R_u @ vec_lo[o2])
                                          for o2 in range(F)])
                        d_U[e] = log_sum_exp(-alpha_lse, cross) + d_tilde
                    d_E = np.zeros(F)
                    for o2 in range(F):
                        lo, dlo = vec_lo[o2], vec_lo[o2 + 1] - vec_lo[o2]
                        Ht = B_h @ R_u @ dlo / np.linalg.norm(dlo)
                        d_tilde = Ht @ (sig - p_u - R_u @ lo)
                        cross = np.array([Ht @ (ego_R @ vec_le[e])
                                          for e in range(E)])
                        d_E[o2] = log_sum_exp(-alpha_lse, cross) + d_tilde
                    d_val = d_min - log_sum_exp(
                        alpha_lse, np.concatenate([d_U, d_E]))
                    if d_val > 0:
                        costs["dyn"] += (omg * step * float(w.wei_surround)
                                         * smoothed_l1(d_val))
        trajtime += T[s]

    costs["total"] = sum(costs.values())
    return costs
