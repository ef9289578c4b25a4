"""Batch-minor L-BFGS: dftpav_tpu.lbfgs with an explicit trailing lane axis.

Same algorithm and iterate path as lbfgs.minimize (which carries the
lbfgs.hpp reference citations); instead of `vmap` the batch is the trailing
axis of every array and per-lane control flow is explicit masking — the exact
transform vmap would apply, with two deliberate improvements:

  * converged lanes enter each line search pre-accepted, so the inner while
    loop runs only as long as the *slowest active* lane (vmap re-runs full
    searches on finished lanes);
  * reductions are over axis 0 of [D, B] / [m, D, B] arrays, so every
    elementwise op and reduction tiles with the B lanes minor — the layout
    that motivated dftpav_tpu.ops (see ops.__doc__).

The evaluation callback must map x [D, B] -> (f [B], g [D, B]).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.config import LBFGSParams
from dftpav_tpu.lbfgs import Result, Status
from dftpav_tpu.utils.vma import vary_like


def _dot(a, b):
    return jnp.sum(a * b, axis=0)


class _LSCarry(NamedTuple):
    x: jnp.ndarray        # [D, B]
    f: jnp.ndarray        # [B]
    g: jnp.ndarray        # [D, B]
    stp: jnp.ndarray      # [B]
    mu: jnp.ndarray
    nu: jnp.ndarray
    brackt: jnp.ndarray
    touched: jnp.ndarray
    count: jnp.ndarray    # [B] int32
    code: jnp.ndarray     # [B] int32: 0 continue, 1 accept, 2 maxls, <0 err


def _line_search(fun, xp, gp, d, f0, stp0, p: LBFGSParams, active0):
    """lbfgs._line_search with trailing B (lbfgs.hpp:276-389).

    Lanes with active0 False start accepted and never evaluate.
    """
    dtype = xp.dtype
    B = xp.shape[-1]
    dginit = _dot(gp, d)                                   # [B]
    dgtest = p.f_dec_coeff * dginit
    dstest = p.s_curv_coeff * dginit
    finit = f0

    def cond(c: _LSCarry):
        return jnp.any(c.code == 0)

    def body(c: _LSCarry):
        act = c.code == 0                                   # [B]
        x_try = xp + c.stp * d
        f_try, g_try = fun(x_try)
        # frozen lanes keep their carry (vmap-equivalent masking)
        x = jnp.where(act, x_try, c.x)
        f = jnp.where(act, f_try, c.f)
        g = jnp.where(act, g_try, c.g)
        count = c.count + act.astype(jnp.int32)

        bad_f = ~jnp.isfinite(f_try)
        early = (p.past > 0) & (jnp.abs(finit - f_try) / (jnp.abs(finit) + 1.0)
                                < p.delta / max(p.past, 1))
        armijo_fail = bad_f | (f_try > finit + c.stp * dgtest)
        wolfe_fail = _dot(g_try, d) < dstest

        nu = jnp.where(act & armijo_fail, c.stp, c.nu)
        brackt = c.brackt | (act & armijo_fail)
        mu = jnp.where(act & ~armijo_fail & wolfe_fail, c.stp, c.mu)

        accept = (early & ~bad_f) | (~armijo_fail & ~wolfe_fail)
        code = jnp.where(act & accept, 1, c.code)
        cont = code == 0
        code = jnp.where(cont & (count >= p.max_linesearch), 2, code)
        code = jnp.where(cont & brackt & ((nu - mu) < p.machine_prec * nu),
                         Status.ERR_WIDTHTOOSMALL, code)
        stp = jnp.where(brackt, 0.5 * (mu + nu), c.stp * 2.0)
        code = jnp.where((code == 0) & (stp < p.min_step), Status.ERR_MINSTEP,
                         code)
        over = stp > p.max_step
        code = jnp.where((code == 0) & over & c.touched, Status.ERR_MAXSTEP,
                         code)
        touched = c.touched | (act & over)
        stp = jnp.where(over, jnp.asarray(p.max_step, dtype), stp)
        stp = jnp.where(act, stp, c.stp)
        return _LSCarry(x, f, g, stp, mu, nu, brackt, touched, count, code)

    code0 = jnp.where(active0,
                      jnp.where(dginit > 0.0, Status.ERR_INCREASEGRADIENT, 0),
                      1)
    # constant-seeded carries must carry f0's varying axes under shard_map
    stp_i, mu_i, nu_i, brackt_i, touched_i, count_i = vary_like(
        f0, jnp.broadcast_to(jnp.asarray(stp0, dtype), (B,)),
        jnp.zeros((B,), dtype), jnp.full((B,), p.max_step, dtype),
        jnp.zeros((B,), bool), jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32))
    init = _LSCarry(
        x=xp, f=f0, g=gp, stp=stp_i,
        mu=mu_i,
        nu=nu_i,
        brackt=brackt_i, touched=touched_i,
        count=count_i,
        code=code0.astype(jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.f, out.g, out.count, out.code


class _Carry(NamedTuple):
    x: jnp.ndarray       # [D, B]
    f: jnp.ndarray       # [B]
    g: jnp.ndarray       # [D, B]
    d: jnp.ndarray       # [D, B]
    step: jnp.ndarray    # [B]
    lm_s: jnp.ndarray    # [m, D, B] newest-first
    lm_y: jnp.ndarray    # [m, D, B]
    lm_ys: jnp.ndarray   # [m, B]
    pf: jnp.ndarray      # [past, B]
    bound: jnp.ndarray   # [B] int32
    k: jnp.ndarray       # [B] int32
    n_evals: jnp.ndarray  # [B] int32
    status: jnp.ndarray  # [B] int32


def _two_loop(g, lm_s, lm_y, lm_ys, bound, ys, yy):
    """lbfgs._two_loop with trailing B (lbfgs.hpp:709-741)."""
    m = lm_s.shape[0]
    d = -g
    alphas = []
    for i in range(m):
        live = i < bound                                   # [B]
        a = jnp.where(live, _dot(lm_s[i], d) / lm_ys[i], 0.0)
        d = d - a * lm_y[i]
        alphas.append(a)
    d = d * (ys / yy)
    for i in range(m - 1, -1, -1):
        b = jnp.where(i < bound, _dot(lm_y[i], d) / lm_ys[i], 0.0)
        d = d + (alphas[i] - b) * lm_s[i]
    return d


def minimize_b(fun: Callable, x0: jnp.ndarray, p: LBFGSParams,
               max_iterations: int | None = None) -> Result:
    """Minimize per-lane: fun(x [D,B]) -> (f [B], g [D,B]). Returns a Result
    whose fields carry the trailing [B] (x is [D, B])."""
    dtype = x0.dtype
    m = p.mem_size
    max_iter = p.max_iterations if max_iterations is None else max_iterations
    D, B = x0.shape

    f0, g0 = fun(x0)
    d0 = -g0
    gnorm = jnp.max(jnp.abs(g0), axis=0)
    xnorm = jnp.max(jnp.abs(x0), axis=0)
    already = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon

    pf0 = jnp.zeros((max(p.past, 1), B), dtype).at[0].set(f0)
    lm_s0, lm_y0, lm_ys0, bound0, k0, ne0 = vary_like(
        f0, jnp.zeros((m, D, B), dtype), jnp.zeros((m, D, B), dtype),
        jnp.ones((m, B), dtype), jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.int32), jnp.ones((B,), jnp.int32))
    init = _Carry(
        x=x0, f=f0, g=g0, d=d0,
        step=1.0 / jnp.maximum(jnp.sqrt(_dot(d0, d0)), 1e-300),
        lm_s=lm_s0, lm_y=lm_y0,
        lm_ys=lm_ys0, pf=pf0,
        bound=bound0,
        k=k0, n_evals=ne0,
        status=jnp.where(already, Status.CONVERGENCE,
                         Status.RUNNING).astype(jnp.int32),
    )

    def cond(c: _Carry):
        return jnp.any(c.status == Status.RUNNING)

    def body(c: _Carry):
        run = c.status == Status.RUNNING                    # [B]
        xp, gp = c.x, c.g
        x, f, g, ls_count, ls_code = _line_search(fun, xp, gp, c.d, c.f,
                                                  c.step, p, run)
        n_evals = c.n_evals + ls_count

        failed = (ls_code < 0) | (ls_code == 2)
        x = jnp.where(run & ~failed, x, xp)
        g = jnp.where(run & ~failed, g, gp)
        f = jnp.where(run, f, c.f)
        status = jnp.where(
            run & (ls_code < 0), ls_code,
            jnp.where(run & (ls_code == 2), Status.MAXLS, c.status))

        gnorm = jnp.max(jnp.abs(g), axis=0)
        xnorm = jnp.max(jnp.abs(x), axis=0)
        conv = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
        status = jnp.where((status == Status.RUNNING) & conv,
                           Status.CONVERGENCE, status)
        pf = c.pf
        if p.past > 0:
            slot = jnp.mod(c.k, p.past)                     # [B]
            pf_slot = jnp.take_along_axis(pf, slot[None], axis=0)[0]
            rate = jnp.abs(pf_slot - f) / jnp.maximum(1.0, jnp.abs(f))
            stop = (c.k >= p.past) & (rate < p.delta)
            status = jnp.where((status == Status.RUNNING) & stop, Status.STOP,
                               status)
            newpf = jnp.where(status == Status.RUNNING, f, pf_slot)
            onehot = (jnp.arange(max(p.past, 1))[:, None] == slot[None])
            pf = jnp.where(onehot, newpf[None], pf)
        status = jnp.where((status == Status.RUNNING) & (c.k >= max_iter),
                           Status.MAXITER, status)
        k = jnp.where(status == Status.RUNNING, c.k + 1, c.k)

        s = x - xp
        y = g - gp
        ys = _dot(y, s)
        yy = _dot(y, y)
        cau = _dot(s, s) * jnp.sqrt(_dot(gp, gp)) * p.cautious_factor
        do_update = (ys > cau) & (status == Status.RUNNING)

        lm_s = jnp.where(do_update,
                         jnp.concatenate([s[None], c.lm_s[:-1]]), c.lm_s)
        lm_y = jnp.where(do_update,
                         jnp.concatenate([y[None], c.lm_y[:-1]]), c.lm_y)
        lm_ys = jnp.where(do_update,
                          jnp.concatenate([ys[None], c.lm_ys[:-1]]), c.lm_ys)
        bound = jnp.where(do_update, jnp.minimum(c.bound + 1, m), c.bound)

        d_new = _two_loop(g, lm_s, lm_y, lm_ys, bound, ys,
                          jnp.maximum(yy, 1e-300))
        d = jnp.where(do_update, d_new, -g)
        d = jnp.where(run, d, c.d)

        return _Carry(x=x, f=f, g=g, d=d,
                      step=vary_like(f, jnp.ones((B,), dtype)),
                      lm_s=lm_s, lm_y=lm_y, lm_ys=lm_ys, pf=pf,
                      bound=bound, k=k, n_evals=n_evals, status=status)

    out = jax.lax.while_loop(cond, body, init)
    return Result(x=out.x, f=out.f, g=out.g, n_iters=out.k,
                  n_evals=out.n_evals, status=out.status)
