"""Whole-solve Pallas TPU kernel: the entire batched L-BFGS trajectory
optimization runs VMEM-resident, one kernel program per 128-lane tile.

Round 1 measured the XLA engine at ~39 ms per L-BFGS iteration at B=1024:
cost+grad evals stream ~4.7 GB of intermediates through HBM, and the batched
line search pays the MAX trial count across all 1024 lanes per iteration
(lane mean 2.07, max ~9) because every trial is a separate full-batch eval
(PERF.md). This kernel removes both walls:

  * The full objective + gradient (ops/kcost.eval_fg — jax.vjp traced INSIDE
    the kernel body) runs on VMEM-resident [R, TB] tiles; no intermediate
    ever touches HBM.
  * The solver is restructured from (iteration loop x line-search loop) into
    ONE round loop: every round evaluates each active lane's current trial
    point; lanes whose trial satisfies Lewis-Overton accept and complete
    their iteration (convergence tests, cautious history update, two-loop
    direction) in the same round, others bracket and retry. Lanes advance
    ASYNCHRONOUSLY — a round does useful work for ~every lane, so the cost is
    the per-lane mean eval count, not the batch max. The L-BFGS frame
    (two-loop over m=16 x D=16) is a few hundred VPU ops per round —
    negligible at tile scale, so running it unconditionally every round is
    free.
  * Each 128-lane tile runs the loop independently (sequential grid programs
    on the core): a tile whose lanes converge early exits early — straggler
    lanes only stall their own tile, not the whole batch.

Same iterate path per lane as ops/blbfgs (same Lewis-Overton bracketing,
cautious updates, stopping tests — lbfgs.hpp semantics); parity is asserted
in tests/test_megakernel.py. S == 1 problem class (the bench/replan class);
multi-gear batches use the ops/bcost engine.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dftpav_tpu.config import LBFGSParams, PlannerConfig
from dftpav_tpu.lbfgs import Status
from dftpav_tpu.ops import bcost, kcost
from dftpav_tpu.ops.kcost import DP, KConsts, KScenario, StaticW
from dftpav_tpu.types import Dims, Scenario, SolveResult, Weights


class _Carry(NamedTuple):
    xp: jnp.ndarray       # [DP, TB] iteration base point
    fp: jnp.ndarray       # [TB]
    gp: jnp.ndarray       # [DP, TB]
    d: jnp.ndarray        # [DP, TB]
    stp: jnp.ndarray      # [TB] current trial step
    finit: jnp.ndarray    # [TB] line-search constants
    dgtest: jnp.ndarray
    dstest: jnp.ndarray
    mu: jnp.ndarray       # [TB] bracketing state
    nu: jnp.ndarray
    brackt: jnp.ndarray   # [TB] float 0/1 mask (bool lanes in the carry
    touched: jnp.ndarray  # [TB] float 0/1 mask  lower to an i8->i1 vector
                          #     truncation Mosaic rejects)
    lscnt: jnp.ndarray    # [TB] i32
    # newest-first history as TUPLES of [DP, TB] / [TB] arrays: slicing a
    # stacked [m, DP, TB] gives offset layouts Mosaic cannot reduce over
    # ("input layout must have zero offsets over dimensions being reduced")
    lm_s: tuple           # m x [DP, TB]
    lm_y: tuple           # m x [DP, TB]
    lm_ys: tuple          # m x [TB]
    bound: jnp.ndarray    # [TB] i32
    k: jnp.ndarray        # [TB] i32 iteration counter
    pf: jnp.ndarray       # [past, TB]
    n_evals: jnp.ndarray  # [TB] i32
    status: jnp.ndarray   # [TB] i32


def _dot(a, b):
    return jnp.sum(a * b, axis=0)


def _two_loop_t(g, lm_s, lm_y, lm_ys, bound, ys, yy):
    """blbfgs._two_loop over tuple-form history (identical math; tuple
    elements are full arrays, so every reduction sees a zero-offset
    layout Mosaic accepts)."""
    m = len(lm_s)
    d = -g
    alphas = []
    for i in range(m):
        live = i < bound                                   # [TB]
        a = jnp.where(live, _dot(lm_s[i], d) / lm_ys[i], 0.0)
        d = d - a * lm_y[i]
        alphas.append(a)
    d = d * (ys / yy)
    for i in range(m - 1, -1, -1):
        b = jnp.where(i < bound, _dot(lm_y[i], d) / lm_ys[i], 0.0)
        d = d + (alphas[i] - b) * lm_s[i]
    return d


def _solve_rounds(x0, sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims,
                  p: LBFGSParams, max_iter: int) -> _Carry:
    """The fused round loop over values (runs inside the kernel; also
    testable as plain XLA)."""
    dtype = x0.dtype
    TB = x0.shape[-1]
    m, past = p.mem_size, max(p.past, 1)
    i32 = jnp.int32

    def fg(x):
        return kcost.eval_fg(x, sc, kc, sw, dims)

    f0, g0 = fg(x0)
    d0 = -g0
    gnorm = jnp.max(jnp.abs(g0), axis=0)
    xnorm = jnp.max(jnp.abs(x0), axis=0)
    already = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
    dginit0 = _dot(g0, d0)
    stp0 = 1.0 / jnp.maximum(jnp.sqrt(_dot(d0, d0)), 1e-30)

    init = _Carry(
        xp=x0, fp=f0, gp=g0, d=d0, stp=stp0,
        finit=f0, dgtest=p.f_dec_coeff * dginit0,
        dstest=p.s_curv_coeff * dginit0,
        mu=jnp.zeros((TB,), dtype), nu=jnp.full((TB,), p.max_step, dtype),
        brackt=jnp.zeros((TB,), dtype), touched=jnp.zeros((TB,), dtype),
        lscnt=jnp.zeros((TB,), i32),
        lm_s=tuple(jnp.zeros((DP, TB), dtype) for _ in range(m)),
        lm_y=tuple(jnp.zeros((DP, TB), dtype) for _ in range(m)),
        lm_ys=tuple(jnp.ones((TB,), dtype) for _ in range(m)),
        bound=jnp.zeros((TB,), i32), k=jnp.ones((TB,), i32),
        pf=jnp.concatenate([f0[None], jnp.zeros((past - 1, TB), dtype)])
        if past > 1 else f0[None],
        n_evals=jnp.ones((TB,), i32),
        status=jnp.where(already, Status.CONVERGENCE,
                         Status.RUNNING).astype(i32),
    )

    onehot_rows = jax.lax.broadcasted_iota(i32, (past, TB), 0)

    def cond(c: _Carry):
        return jnp.any(c.status == Status.RUNNING)

    def body(c: _Carry) -> _Carry:
        act = c.status == Status.RUNNING
        x_try = c.xp + c.stp[None] * c.d
        f_try, g_try = fg(x_try)
        n_evals = c.n_evals + act.astype(i32)

        # --- Lewis-Overton decision (lbfgs.hpp:276-389, as in blbfgs) ---
        dg = _dot(g_try, c.d)
        bad = ~jnp.isfinite(f_try)
        early = ((p.past > 0)
                 & (jnp.abs(c.finit - f_try) / (jnp.abs(c.finit) + 1.0)
                    < p.delta / past))
        armijo_fail = bad | (f_try > c.finit + c.stp * c.dgtest)
        wolfe_fail = dg < c.dstest
        accept = act & ((early & ~bad) | (~armijo_fail & ~wolfe_fail))
        cont = act & ~accept

        # --- bracket/step update for continuing lanes ---
        nu = jnp.where(cont & armijo_fail, c.stp, c.nu)
        brackt_b = (c.brackt > 0.5) | (cont & armijo_fail)
        mu = jnp.where(cont & ~armijo_fail & wolfe_fail, c.stp, c.mu)
        lscnt = c.lscnt + cont.astype(i32)
        code = jnp.zeros((TB,), i32)
        code = jnp.where(cont & (lscnt >= p.max_linesearch), 2, code)
        code = jnp.where(cont & (code == 0) & brackt_b
                         & ((nu - mu) < p.machine_prec * nu),
                         Status.ERR_WIDTHTOOSMALL, code)
        stp_n = jnp.where(brackt_b, 0.5 * (mu + nu), c.stp * 2.0)
        code = jnp.where(cont & (code == 0) & (stp_n < p.min_step),
                         Status.ERR_MINSTEP, code)
        over = stp_n > p.max_step
        code = jnp.where(cont & (code == 0) & over & (c.touched > 0.5),
                         Status.ERR_MAXSTEP, code)
        touched_b = (c.touched > 0.5) | (cont & over)
        stp_n = jnp.where(over, jnp.asarray(p.max_step, dtype), stp_n)
        ls_fail = cont & (code != 0)
        status = jnp.where(ls_fail,
                           jnp.where(code == 2, Status.MAXLS, code), c.status)

        # --- iteration end for accepted lanes (blbfgs body semantics) ---
        gnorm = jnp.max(jnp.abs(g_try), axis=0)
        xnorm = jnp.max(jnp.abs(x_try), axis=0)
        conv = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
        status = jnp.where(accept & conv, Status.CONVERGENCE, status)

        if p.past > 0:
            slot = jnp.mod(c.k, past)
            onehot = onehot_rows == slot[None]
            pf_slot = jnp.sum(jnp.where(onehot, c.pf, 0.0), axis=0)
            rate = jnp.abs(pf_slot - f_try) / jnp.maximum(1.0, jnp.abs(f_try))
            stop = (c.k >= past) & (rate < p.delta)
            status = jnp.where(accept & (status == Status.RUNNING) & stop,
                               Status.STOP, status)
            newpf = jnp.where(status == Status.RUNNING, f_try, pf_slot)
            pf = jnp.where(onehot & accept[None], newpf[None], c.pf)
        else:
            pf = c.pf
        status = jnp.where(accept & (status == Status.RUNNING)
                           & (c.k >= max_iter), Status.MAXITER, status)
        k = jnp.where(accept & (status == Status.RUNNING), c.k + 1, c.k)

        # --- cautious history update + new direction ---
        s = x_try - c.xp
        y = g_try - c.gp
        ys = _dot(y, s)
        yy = _dot(y, y)
        cau = _dot(s, s) * jnp.sqrt(_dot(c.gp, c.gp)) * p.cautious_factor
        do_up = accept & (status == Status.RUNNING) & (ys > cau)
        lm_s = tuple(jnp.where(do_up, new, old) for new, old
                     in zip((s,) + c.lm_s[:-1], c.lm_s))
        lm_y = tuple(jnp.where(do_up, new, old) for new, old
                     in zip((y,) + c.lm_y[:-1], c.lm_y))
        lm_ys = tuple(jnp.where(do_up, new, old) for new, old
                      in zip((ys,) + c.lm_ys[:-1], c.lm_ys))
        bound = jnp.where(do_up, jnp.minimum(c.bound + 1, m), c.bound)
        d_new = _two_loop_t(g_try, lm_s, lm_y, lm_ys, bound, ys,
                            jnp.maximum(yy, 1e-30))
        d_next = jnp.where(do_up, d_new, -g_try)
        d = jnp.where(accept[None], d_next, c.d)

        # --- next line-search setup for accepted lanes ---
        dginit = _dot(g_try, d_next)
        status = jnp.where(accept & (status == Status.RUNNING)
                           & (dginit > 0.0),
                           Status.ERR_INCREASEGRADIENT, status)
        finit = jnp.where(accept, f_try, c.finit)
        dgtest = jnp.where(accept, p.f_dec_coeff * dginit, c.dgtest)
        dstest = jnp.where(accept, p.s_curv_coeff * dginit, c.dstest)
        mu = jnp.where(accept, 0.0, mu)
        nu = jnp.where(accept, jnp.asarray(p.max_step, dtype), nu)
        brackt = (brackt_b & ~accept).astype(dtype)
        touched = (touched_b & ~accept).astype(dtype)
        lscnt = jnp.where(accept, 0, lscnt)
        stp = jnp.where(accept, 1.0, jnp.where(cont, stp_n, c.stp))

        xp = jnp.where(accept[None], x_try, c.xp)
        gp = jnp.where(accept[None], g_try, c.gp)
        fp = jnp.where(accept | ls_fail, f_try, c.fp)

        return _Carry(xp=xp, fp=fp, gp=gp, d=d, stp=stp, finit=finit,
                      dgtest=dgtest, dstest=dstest, mu=mu, nu=nu,
                      brackt=brackt, touched=touched, lscnt=lscnt,
                      lm_s=lm_s, lm_y=lm_y, lm_ys=lm_ys, bound=bound,
                      k=k, pf=pf, n_evals=n_evals, status=status)

    return jax.lax.while_loop(cond, body, init)


def _kernel(x0_ref, bnd_ref, misc_ref, cn_ref, cp_ref, cm_ref, obsc_ref,
            P_ref, Q_ref, gridc_ref, xout_ref, stats_ref,
            *, dims, sw, p, max_iter):
    sc = KScenario(bnd=bnd_ref[:], misc=misc_ref[:], corr_n=cn_ref[:],
                   corr_p=cp_ref[:], corr_m=cm_ref[:], obs_c=obsc_ref[:])
    kc = KConsts(P=P_ref[:], Q=Q_ref[:], gridc=gridc_ref[:])
    out = _solve_rounds(x0_ref[:], sc, kc, sw, dims, p, max_iter)
    xout_ref[:] = out.xp
    f32 = out.xp.dtype
    TB = out.fp.shape[0]
    zero = jnp.zeros((TB,), f32)
    stats_ref[:] = jnp.stack([
        out.fp, out.status.astype(f32), out.k.astype(f32),
        out.n_evals.astype(f32), zero, zero, zero, zero])


def _prep(batch: Scenario, w: Weights, dims: Dims, cfg: PlannerConfig,
          dtype):
    """Shared setup: clamp boundaries, pack x0 into padded [DP, B] rows,
    build kernel-layout slabs + constants."""
    from dftpav_tpu import cost as cost_mod
    from dftpav_tpu.solver import clamp_boundary_states

    batch = jax.vmap(lambda s: clamp_boundary_states(s, w))(batch)
    x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch)
    D = x0.shape[1]
    B = x0.shape[0]
    x0p = jnp.zeros((DP, B), dtype).at[:D].set(x0.T.astype(dtype))
    sc = kcost.prep_scenario(batch, dims, dtype)
    kc = kcost.make_consts(dims, dtype)
    return batch, x0p, sc, kc, D


def _finalize(batch, out_x, out_f, out_status, out_k, w, dims, cfg, D):
    """Final trajectory coefficients + SolveResult from optimized variables
    (once per solve, outside the hot loop — same path as
    solve_batch_bminor)."""
    from dftpav_tpu import cost as cost_mod
    from dftpav_tpu import minco

    x_fin = out_x[:D]
    u = bcost.unpack_b(x_fin, dims)
    T = cost_mod.virtual_to_real(u.vt, w.mini_t)
    dT = T / dims.N
    bm = bcost.to_bminor(batch)
    heads, tails = bcost.boundary_states_b(bm, u, w, dims)
    maps = minco.maps_as(dims.N, out_x.dtype)
    with jax.default_matmul_precision("float32"):
        coeffs = bcost.generate_b(u.inner, dT, heads, tails, maps)

    cost = out_f / cfg.opt.cost_scale
    ok = out_status >= 0
    success = ok & (cost < cfg.opt.reject_cost)
    return SolveResult(coeffs=jnp.moveaxis(coeffs, -1, 0), dT=dT.T,
                       cost=cost, n_iters=out_k,
                       status=out_status, success=success)


def solve_batch_rounds(batch: Scenario, w: Weights, dims: Dims,
                       cfg: PlannerConfig,
                       max_iterations: int | None = None) -> SolveResult:
    """The asynchronous-lane round loop as a PLAIN XLA program (no Pallas).

    Two structural wins over solver.solve_batch_bminor, independent of any
    kernel fusion:
      * per round, EVERY active lane evaluates its own current line-search
        trial — the batch pays the per-lane mean trial count, not the batch
        max (the dominant cost at B=1024 per PERF.md);
      * the objective is the kcost formulation: MINCO solve + constraint
        basis sampling collapsed into host-precomputed sample-map matmuls
        (P_o @ rhs), so the banded system never materializes on device.
    Weights must be concrete (compile-time) values. S == 1 problem class.
    """
    assert dims.S == 1, "round-loop engine covers the single-gear class"
    dtype = batch.init_T.dtype
    p = cfg.opt.lbfgs
    max_iter = p.max_iterations if max_iterations is None else max_iterations
    sw = StaticW.build(w, cfg, concrete=False)
    with jax.default_matmul_precision("float32"):
        batch, x0p, sc, kc, D = _prep(batch, w, dims, cfg, dtype)
        out = _solve_rounds(x0p, sc, kc, sw, dims, p, max_iter)
    return _finalize(batch, out.xp, out.fp, out.status, out.k, w, dims,
                     cfg, D)


def solve_batch_fused(batch: Scenario, w: Weights, dims: Dims,
                      cfg: PlannerConfig, max_iterations: int | None = None,
                      tb: int = 128, interpret: bool = False) -> SolveResult:
    """Drop-in equivalent of solver.solve_batch_bminor on the fused kernel.

    batch: Scenario with leading [B] (B % tb == 0), S == 1. Weights must be
    concrete (compile-time) values — the kernel bakes them in.
    """
    assert dims.S == 1, "fused kernel covers the single-gear class"
    dtype = jnp.float32 if not interpret else batch.init_T.dtype
    B = batch.ini_state.shape[0]
    assert B % tb == 0, (B, tb)
    p = cfg.opt.lbfgs
    max_iter = p.max_iterations if max_iterations is None else max_iterations
    sw = StaticW.build(w, cfg)
    batch, x0p, sc, kc, D = _prep(batch, w, dims, cfg, dtype)

    def lane_spec(shape):
        nlead = len(shape)
        return pl.BlockSpec(shape + (tb,),
                            lambda b, nlead=nlead: (0,) * nlead + (b,),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nlead = len(shape)
        return pl.BlockSpec(shape, lambda b, nlead=nlead: (0,) * nlead,
                            memory_space=pltpu.VMEM)

    R = dims.N * dims.K1
    kern = functools.partial(_kernel, dims=dims, sw=sw, p=p,
                             max_iter=max_iter)
    x_out, stats = pl.pallas_call(
        kern,
        grid=(B // tb,),
        in_specs=[
            lane_spec((DP,)),                 # x0
            lane_spec((DP,)),                 # bnd
            lane_spec((8,)),                  # misc
            lane_spec((dims.H, 2, R)),        # corr_n
            lane_spec((dims.H, 2, R)),        # corr_p
            lane_spec((dims.H, R)),           # corr_m
            lane_spec((max(dims.O, 1), 2, 6 * dims.Po)),  # obs_c
            const_spec((3, R, kc.P.shape[-1])),
            const_spec((DP, kc.Q.shape[-1])),
            const_spec((2, R, 1)),
        ],
        out_specs=[lane_spec((DP,)), lane_spec((8,))],
        out_shape=[
            jax.ShapeDtypeStruct((DP, B), dtype),
            jax.ShapeDtypeStruct((8, B), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x0p, sc.bnd, sc.misc, sc.corr_n, sc.corr_p, sc.corr_m, sc.obs_c,
      kc.P, kc.Q, kc.gridc)

    return _finalize(batch, x_out, stats[0], stats[1].astype(jnp.int32),
                     stats[2].astype(jnp.int32), w, dims, cfg, D)
