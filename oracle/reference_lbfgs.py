"""NumPy scalar-loop oracle of the reference L-BFGS (lbfgs.hpp:276-752).

Used to verify that dftpav_tpu.lbfgs (lax.while_loop version) follows the same
optimization path: same line-search decisions, same memory updates, same stop
criteria. Independent reimplementation from the algorithm description.
"""

from __future__ import annotations

import numpy as np


def line_search_lewisoverton(fun, x0, f0, g0, d, stp, p):
    count = 0
    brackt, touched = False, False
    mu, nu = 0.0, p.max_step
    dginit = float(g0 @ d)
    if dginit > 0:
        return x0, f0, g0, count, -5
    finit = f0
    dgtest = p.f_dec_coeff * dginit
    dstest = p.s_curv_coeff * dginit
    while True:
        x = x0 + stp * d
        f, g = fun(x)
        count += 1
        # Non-finite trial value brackets high instead of aborting — matches
        # dftpav_tpu.lbfgs._line_search (deliberate deviation from
        # lbfgs.hpp:321-324 for f32 robustness).
        bad_f = not np.isfinite(f)
        if (not bad_f) and p.past > 0 and \
                abs(finit - f) / (abs(finit) + 1.0) < p.delta / p.past:
            return x, f, g, count, 1
        if bad_f or f > finit + stp * dgtest:
            nu = stp
            brackt = True
        else:
            if float(g @ d) < dstest:
                mu = stp
            else:
                return x, f, g, count, 1
        if count >= p.max_linesearch:
            return x, f, g, count, 2
        if brackt and (nu - mu) < p.machine_prec * nu:
            return x, f, g, count, -2
        stp = 0.5 * (mu + nu) if brackt else 2.0 * stp
        if stp < p.min_step:
            return x, f, g, count, -3
        if stp > p.max_step:
            if touched:
                return x, f, g, count, -4
            touched = True
            stp = p.max_step


def minimize(fun, x0, p, max_iterations=None):
    """Returns (x, f, g, k, status) with the same status codes as
    dftpav_tpu.lbfgs.Status."""
    max_iter = max_iterations if max_iterations is not None else p.max_iterations
    m = p.mem_size
    n = x0.shape[0]
    x = np.array(x0, float)
    f, g = fun(x)
    pf = np.zeros(max(p.past, 1))
    pf[0] = f
    d = -g
    if np.max(np.abs(g)) / max(1.0, np.max(np.abs(x))) < p.g_epsilon:
        return x, f, g, 0, 0
    step = 1.0 / np.linalg.norm(d)
    lm_s = np.zeros((m, n))
    lm_y = np.zeros((m, n))
    lm_ys = np.ones(m)
    end, bound, k = 0, 0, 1
    while True:
        xp, gp = x.copy(), g.copy()
        x, f, g, _cnt, code = line_search_lewisoverton(fun, xp, f, gp, d, step, p)
        if code < 0 or code == 2:
            x, g = xp, gp
            return x, f, g, k, (code if code < 0 else 3)
        if np.max(np.abs(g)) / max(1.0, np.max(np.abs(x))) < p.g_epsilon:
            return x, f, g, k, 0
        if p.past > 0:
            if k >= p.past:
                rate = abs(pf[k % p.past] - f) / max(1.0, abs(f))
                if rate < p.delta:
                    return x, f, g, k, 1
            pf[k % p.past] = f
        if k >= max_iter:
            return x, f, g, k, 2
        k += 1
        s = x - xp
        y = g - gp
        ys = float(y @ s)
        yy = float(y @ y)
        cau = float(s @ s) * np.linalg.norm(gp) * p.cautious_factor
        d = -g
        if ys > cau:
            lm_s[end] = s
            lm_y[end] = y
            lm_ys[end] = ys
            bound = min(bound + 1, m)
            end = (end + 1) % m
            alphas = np.zeros(m)
            j = end
            for _ in range(bound):
                j = (j + m - 1) % m
                alphas[j] = float(lm_s[j] @ d) / lm_ys[j]
                d -= alphas[j] * lm_y[j]
            d *= ys / yy
            for _ in range(bound):
                beta = float(lm_y[j] @ d) / lm_ys[j]
                d += (alphas[j] - beta) * lm_s[j]
                j = (j + 1) % m
        step = 1.0
