"""Batched L-BFGS with Lewis-Overton line search.

Functional re-implementation of the reference's header-only solver
(geo_utils2d/lbfgs.hpp: lbfgs_optimize at :440, line_search_lewisoverton at
:276), designed for XLA:

  * every loop is a `lax.while_loop`/`lax.fori_loop` with static bounds on the
    history ring, so the whole solve jits to one program;
  * written for a SINGLE problem and batched with `jax.vmap` — under vmap the
    while loops step all lanes until every lane is done, which is exactly the
    masked-batch semantics we want (converged lanes keep their fixed point);
  * the evaluation callback returns (f, grad) and is typically
    `jax.value_and_grad` of a cost; per-iteration work is dominated by it.

Semantics preserved from the reference (they shape the optimization path and
therefore parity): weak-Wolfe bracketing with doubling/bisection, the
`past`-delta early accept inside the line search (lbfgs.hpp:325-328), the
cautious skip of history updates (lbfgs.hpp:704-706), the gnorm/xnorm relative
convergence test, and the past-f stopping criterion.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dftpav_tpu.config import LBFGSParams
from dftpav_tpu.utils.vma import vary_like


class Status:
    """Return codes; nonnegative = usable result (see traj_optimizer.cpp:176-188)."""

    CONVERGENCE = 0   # gnorm test
    STOP = 1          # past-delta test
    MAXITER = 2       # iteration cap (treated as success by the planner)
    MAXLS = 3         # line-search eval cap (treated as success by the planner)
    RUNNING = 99
    ERR_INVALID_FUNCVAL = -1
    ERR_WIDTHTOOSMALL = -2
    ERR_MINSTEP = -3
    ERR_MAXSTEP = -4
    ERR_INCREASEGRADIENT = -5

    @staticmethod
    def ok(status):
        return status >= 0


class Result(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    n_iters: jnp.ndarray
    n_evals: jnp.ndarray
    status: jnp.ndarray


class _LSCarry(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    stp: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray
    brackt: jnp.ndarray
    touched: jnp.ndarray
    count: jnp.ndarray
    code: jnp.ndarray  # 0 = continue, 1 = accept, <0 error


def _line_search(fun, xp, gp, d, f0, stp0, p: LBFGSParams):
    """Lewis-Overton weak-Wolfe search (lbfgs.hpp:276-389).

    Returns (x, f, g, count, code) with code 1 on acceptance, negative error
    code otherwise (Status.ERR_*; MAXLS is reported as code 2).
    """
    dtype = xp.dtype
    dginit = jnp.vdot(gp, d)
    dgtest = p.f_dec_coeff * dginit
    dstest = p.s_curv_coeff * dginit
    finit = f0

    def cond(c: _LSCarry):
        return c.code == 0

    def body(c: _LSCarry):
        x = xp + c.stp * d
        f, g = fun(x)
        count = c.count + 1

        # The reference aborts the whole solve on inf/NaN (lbfgs.hpp:321-324).
        # In f64 that path never triggers, but the f32 fast path overflows f32
        # range during step-doubling long before max_step, and ~20% of lanes
        # would abort on values they recover from by bisecting back toward the
        # finite end of the bracket. So a non-finite trial value is treated as
        # an Armijo failure (bracket high) instead of an error; the iterate
        # path in f64 is unchanged.
        bad_f = ~jnp.isfinite(f)
        early = (p.past > 0) & (jnp.abs(finit - f) / (jnp.abs(finit) + 1.0)
                                < p.delta / max(p.past, 1))
        armijo_fail = bad_f | (f > finit + c.stp * dgtest)
        wolfe_fail = jnp.vdot(g, d) < dstest

        nu = jnp.where(armijo_fail, c.stp, c.nu)
        brackt = c.brackt | armijo_fail
        mu = jnp.where(~armijo_fail & wolfe_fail, c.stp, c.mu)

        accept = (early & ~bad_f) | (~armijo_fail & ~wolfe_fail)
        code = jnp.where(accept, 1, 0)
        # post-checks in reference order (only if still continuing)
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
        touched = c.touched | over
        stp = jnp.where(over, jnp.asarray(p.max_step, dtype), stp)
        return _LSCarry(x, f, g, stp, mu, nu, brackt, touched, count, code)

    # constant-seeded carries must carry f0's varying axes under shard_map
    stp_i, mu_i, nu_i, brackt_i, touched_i, count_i = vary_like(
        f0, jnp.asarray(stp0, dtype), jnp.zeros((), dtype),
        jnp.asarray(p.max_step, dtype), jnp.zeros((), bool),
        jnp.zeros((), bool), jnp.zeros((), jnp.int32))
    init = _LSCarry(
        x=xp, f=f0, g=gp, stp=stp_i,
        mu=mu_i, nu=nu_i,
        brackt=brackt_i, touched=touched_i,
        count=count_i,
        code=jnp.where(dginit > 0.0, Status.ERR_INCREASEGRADIENT, 0),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.f, out.g, out.count, out.code


class _Carry(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    d: jnp.ndarray
    step: jnp.ndarray
    lm_s: jnp.ndarray   # [m, D] newest-first
    lm_y: jnp.ndarray   # [m, D]
    lm_ys: jnp.ndarray  # [m]
    pf: jnp.ndarray     # [past]
    bound: jnp.ndarray
    k: jnp.ndarray
    n_evals: jnp.ndarray
    status: jnp.ndarray


def _two_loop(g, lm_s, lm_y, lm_ys, bound, ys, yy):
    """Nocedal two-loop recursion (lbfgs.hpp:709-741) over a newest-first
    rolled history.

    The reference's ring buffer needs dynamic modular indexing; on TPU each
    dynamically-indexed loop step is a separately-launched region with ~ms
    overhead, which made the frame 20x the cost evaluation. Storing history
    newest-first (a [m, D] roll per update) makes every index static, so the
    whole recursion fuses into one block of 2m small vector ops. Same math,
    same iterate path.
    """
    m = lm_s.shape[0]
    d = -g
    alphas = []
    for i in range(m):  # newest -> oldest
        live = i < bound
        a = jnp.vdot(lm_s[i], d) / lm_ys[i]
        a = jnp.where(live, a, 0.0)
        d = d - a * lm_y[i]
        alphas.append(a)
    d = d * (ys / yy)
    for i in range(m - 1, -1, -1):  # oldest -> newest
        live = i < bound
        b = jnp.where(live, jnp.vdot(lm_y[i], d) / lm_ys[i], 0.0)
        d = d + (alphas[i] - b) * lm_s[i]
    return d


def minimize(fun: Callable, x0: jnp.ndarray, p: LBFGSParams,
             max_iterations: int | None = None) -> Result:
    """Minimize fun (returning (f, grad)) from x0. Single problem; vmap to batch."""
    dtype = x0.dtype
    m = p.mem_size
    max_iter = p.max_iterations if max_iterations is None else max_iterations
    D = x0.shape[0]

    f0, g0 = fun(x0)
    d0 = -g0
    gnorm = jnp.max(jnp.abs(g0))
    xnorm = jnp.max(jnp.abs(x0))
    already = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon

    pf0 = jnp.zeros((max(p.past, 1),), dtype).at[0].set(f0)
    lm_s0, lm_y0, lm_ys0, bound0, k0, ne0 = vary_like(
        f0, jnp.zeros((m, D), dtype), jnp.zeros((m, D), dtype),
        jnp.ones((m,), dtype), jnp.zeros((), jnp.int32),
        jnp.ones((), jnp.int32), jnp.ones((), jnp.int32))
    init = _Carry(
        x=x0, f=f0, g=g0, d=d0,
        step=1.0 / jnp.maximum(jnp.linalg.norm(d0), 1e-300),
        lm_s=lm_s0, lm_y=lm_y0,
        lm_ys=lm_ys0, pf=pf0,
        bound=bound0,
        k=k0, n_evals=ne0,
        status=jnp.where(already, Status.CONVERGENCE, Status.RUNNING),
    )

    def cond(c: _Carry):
        return c.status == Status.RUNNING

    def body(c: _Carry):
        xp, gp = c.x, c.g
        x, f, g, ls_count, ls_code = _line_search(fun, xp, gp, c.d, c.f,
                                                  c.step, p)
        n_evals = c.n_evals + ls_count

        # line-search failure (incl. eval cap): revert x/g, keep last f
        # (lbfgs.hpp:604-609; MAXLS is negative there too but the planner
        # treats it as success, traj_optimizer.cpp:184-188)
        failed = (ls_code < 0) | (ls_code == 2)
        x = jnp.where(failed, xp, x)
        g = jnp.where(failed, gp, g)
        status = jnp.where(ls_code < 0, ls_code,
                           jnp.where(ls_code == 2, Status.MAXLS, Status.RUNNING))

        # convergence tests (lbfgs.hpp:620-650)
        gnorm = jnp.max(jnp.abs(g))
        xnorm = jnp.max(jnp.abs(x))
        conv = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
        status = jnp.where((status == Status.RUNNING) & conv,
                           Status.CONVERGENCE, status)
        pf = c.pf
        if p.past > 0:
            slot = jnp.mod(c.k, p.past)
            rate = jnp.abs(pf[slot] - f) / jnp.maximum(1.0, jnp.abs(f))
            stop = (c.k >= p.past) & (rate < p.delta)
            status = jnp.where((status == Status.RUNNING) & stop, Status.STOP,
                               status)
            pf = pf.at[slot].set(jnp.where(status == Status.RUNNING, f, pf[slot]))
        status = jnp.where((status == Status.RUNNING) & (c.k >= max_iter),
                           Status.MAXITER, status)
        # k advances only while continuing (lbfgs.hpp increments after the
        # termination tests)
        k = jnp.where(status == Status.RUNNING, c.k + 1, c.k)

        # memory update with cautious test (lbfgs.hpp:670-706)
        s = x - xp
        y = g - gp
        ys = jnp.vdot(y, s)
        yy = jnp.vdot(y, y)
        cau = jnp.vdot(s, s) * jnp.linalg.norm(gp) * p.cautious_factor
        do_update = (ys > cau) & (status == Status.RUNNING)

        # newest-first roll (see _two_loop for why not a ring buffer)
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

        return _Carry(x=x, f=f, g=g, d=d,
                      step=vary_like(f, jnp.ones((), dtype)),
                      lm_s=lm_s, lm_y=lm_y, lm_ys=lm_ys, pf=pf,
                      bound=bound, k=k, n_evals=n_evals, status=status)

    out = jax.lax.while_loop(cond, body, init)
    return Result(x=out.x, f=out.f, g=out.g, n_iters=out.k,
                  n_evals=out.n_evals, status=out.status)
