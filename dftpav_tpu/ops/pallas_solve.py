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

Same per-lane algorithm as ops/blbfgs (same Lewis-Overton bracketing,
cautious updates, stopping tests — lbfgs.hpp semantics); short-horizon
iterate-path parity and full-convergence basin equivalence are asserted in
tests/test_megakernel.py (different reduction graphs drift apart in float
after ~20 iterations — see the test docstrings). Any gear-segment count S
is supported (kcost handles junction overrides); measured hardware numbers
and the Mosaic lowering constraints that shaped this file are in PERF.md.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dftpav_tpu.config import (EngineFlags, LBFGSParams, PlannerConfig,
                               resolve_vt_scale)
from dftpav_tpu.lbfgs import Status
from dftpav_tpu.ops import bcost, kcost
from dftpav_tpu.ops.kcost import (DP, KConsts, KScenario, StaticW, bnd_rows,
                                  dp_of, misc_rows)
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
    lscnt: jnp.ndarray    # [TB] f32 counter (integer-valued; int lanes in
                          #     the carry hit the same Mosaic relayout gaps
                          #     as bools, so counters/statuses ride as f32)
    # newest-first history as TUPLES of [DP, TB] / [TB] arrays: slicing a
    # stacked [m, DP, TB] gives offset layouts Mosaic cannot reduce over
    # ("input layout must have zero offsets over dimensions being reduced")
    lm_s: tuple           # m x [DP, TB]
    lm_y: tuple           # m x [DP, TB]
    lm_ys: tuple          # m x [TB]
    bound: jnp.ndarray    # [TB] f32 (integer-valued)
    k: jnp.ndarray        # [TB] f32 iteration counter
    pf: jnp.ndarray       # [past, TB]
    n_evals: jnp.ndarray  # [TB] f32
    status: jnp.ndarray   # [TB] f32 (Status codes)


# Solver-frame MXU modes (the `frame` argument threaded through _dot /
# _clean_row / _clean_mat; EngineFlags.frame selects it per solve).
# "f32": every frame matmul an fp32 contract (~6 bf16 MXU passes).
# "fast": the relayout/reduction matmuls that exist purely for Mosaic
# layout reasons run as few-pass bf16 splits — 2-pass dots (~2^-17
# relative, far below every solver tolerance), EXACT 3-split identity
# cleans (8+8+8 mantissa bits covers f32's 24), and exact single-pass 0/1
# mask expansion. "bf16": single-pass everywhere (exploration only).


def _bf16_split(v, parts: int):
    """v (f32) as a list of `parts` bf16 values summing (exactly, for
    parts=3) to v."""
    out = []
    rem = v
    for _ in range(parts - 1):
        hi = rem.astype(jnp.bfloat16)
        out.append(hi)
        rem = rem - hi.astype(v.dtype)
    out.append(rem.astype(jnp.bfloat16))
    return out


def _dot(a, b, frame="f32"):
    """Decision-space dot product, [DP, TB] x [DP, TB] -> [TB].

    Expressed as a ones-row matmul instead of jnp.sum(a*b, axis=0): inside
    the Mosaic kernel the loop-carried operands can carry non-zero sublane
    offsets, which vector.multi_reduction rejects for float ADD ("input
    layout must have zero offsets over dimensions that are being reduced");
    matmul operands are relayouted freely. DP is tiny (16-64), so the MXU
    pass costs nothing.

    Fast frame: the ones side is exact, so splitting the PRODUCT into
    hi/lo bf16 gives ~2^-17 relative in two single-pass matmuls.
    """
    prod = a * b
    ones = jnp.ones((1, prod.shape[0]), prod.dtype)
    if frame == "fast":
        hi, lo = _bf16_split(prod, 2)
        dflt = jax.lax.Precision.DEFAULT
        ones_b = ones.astype(jnp.bfloat16)
        dot = lambda p: jax.lax.dot_general(
            ones_b, p, (((1,), (0,)), ((), ())),
            preferred_element_type=prod.dtype, precision=dflt)
        return dot(hi) + dot(lo)
    prec = (jax.lax.Precision.DEFAULT if frame == "bf16"
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(ones, prod, (((1,), (0,)), ((), ())),
                               preferred_element_type=prod.dtype,
                               precision=prec)


def _clean_row(v, frame="f32"):
    """Relayout a per-lane [TB] (or [1, TB]) float vector to a standard
    [1, TB] via a 1x1 matmul (Mosaic relayouts matmul operands freely; see
    _dot). Identity numerically: 1.0 * v with f32 accumulation.

    Every per-lane scalar in the round loop rides as an explicit [1, TB]
    row: 1-D loop carries get implicit-dim layouts whose interplay trips
    unimplemented Mosaic relayouts ("Not implemented: Sublane broadcast")
    even on plain elementwise adds."""
    v2 = v if v.ndim == 2 else v[None]
    one = jnp.ones((1, 1), v2.dtype)
    if frame == "fast":
        return _ident_apply(one, v2)
    prec = (jax.lax.Precision.DEFAULT if frame == "bf16"
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(one, v2, (((1,), (0,)), ((), ())),
                               preferred_element_type=v2.dtype,
                               precision=prec)


def _ident_apply(ident, v):
    """EXACT identity matmul in 3 single-bf16 passes: v splits into three
    bf16 components (24 mantissa bits total), the 0/1 identity is exact in
    bf16, each pass's products are exact, and the identity contraction has
    one nonzero per output so no accumulation rounding occurs."""
    dflt = jax.lax.Precision.DEFAULT
    ident_b = ident.astype(jnp.bfloat16)
    acc = None
    for part in _bf16_split(v, 3):
        t = jax.lax.dot_general(ident_b, part, (((1,), (0,)), ((), ())),
                                preferred_element_type=v.dtype,
                                precision=dflt)
        acc = t if acc is None else acc + t
    return acc


def _clean_mat(v, frame="f32"):
    """Relayout a [DP, TB] value to a standard layout (identity matmul)."""
    n = v.shape[0]
    ident = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(v.dtype)
    if frame == "fast":
        return _ident_apply(ident, v)
    # "bf16": single-pass clean TRUNCATES the carry to bf16 each round —
    # kept only as an experiment knob (quality must be re-gated)
    prec = (jax.lax.Precision.DEFAULT if frame == "bf16"
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(ident, v, (((1,), (0,)), ((), ())),
                               preferred_element_type=v.dtype,
                               precision=prec)


def _selrow(mask, a, b):
    """jnp.where with a [1, TB] mask over [DP, TB] values.

    The mask is expanded by an outer-product matmul rather than a broadcast:
    broadcasting gives it a sublane-REPLICATED layout, and select_n then
    demands the (non-replicated) value operands relayout to match — an
    invalid relayout Mosaic rejects. The matmul-produced mask has a standard
    dense layout, so the select sees agreeing layouts. NaN-safe (a real
    select, not an arithmetic lerp). The outer product of exact 0/1 values
    is exact at ANY matmul precision, so it always runs single-pass."""
    ones = jnp.ones((a.shape[0], 1), a.dtype)
    mf = jax.lax.dot_general(ones, mask.astype(a.dtype),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=a.dtype,
                             precision=jax.lax.Precision.DEFAULT)
    return jnp.where(mf > 0.5, a, b)


def _two_loop_t(g, lm_s, lm_y, lm_ys, bound, ys, yy, dot=_dot):
    """blbfgs._two_loop over tuple-form history (identical math; tuple
    elements are full arrays, so every reduction sees a zero-offset
    layout Mosaic accepts)."""
    m = len(lm_s)
    d = -g
    alphas = []
    for i in range(m):
        live = i < bound                                   # [TB]
        a = jnp.where(live, dot(lm_s[i], d) / lm_ys[i], 0.0)
        d = d - a * lm_y[i]
        alphas.append(a)
    d = d * (ys / yy)
    for i in range(m - 1, -1, -1):
        b = jnp.where(i < bound, dot(lm_y[i], d) / lm_ys[i], 0.0)
        d = d + (alphas[i] - b) * lm_s[i]
    return d


def slab_rows(dims: Dims, p: LBFGSParams) -> int:
    """Rows of the packed solver-state slab (see _carry_to_slab; padded to
    a sublane multiple of 8)."""
    m, past = p.mem_size, max(p.past, 1)
    dp = dp_of(dims)
    raw = (3 + 2 * m) * dp + m + past + 14
    return ((raw + 7) // 8) * 8


def _carry_to_slab(c: _Carry) -> jnp.ndarray:
    """Pack the FULL round-loop state into one [slab_rows, TB] array.

    The multi-phase lane compaction (EngineFlags.phases) hands this slab
    across kernel launches so a continued lane resumes with exactly the
    state it would have had mid-run: iterates, gradient, direction,
    line-search bracket, the whole L-BFGS history, and the past-f window —
    making the phased solve bit-identical to the uninterrupted one."""
    mats = (c.xp, c.gp, c.d) + c.lm_s + c.lm_y
    rows = (c.fp, c.stp, c.finit, c.dgtest, c.dstest, c.mu, c.nu,
            c.brackt, c.touched, c.lscnt, c.bound, c.k, c.n_evals,
            c.status) + c.lm_ys
    slab = jnp.concatenate(
        list(mats) + [r if r.ndim == 2 else r[None] for r in rows]
        + [c.pf if c.pf.ndim == 2 else c.pf[None]])
    pad = -slab.shape[0] % 8                 # sublane-align (see slab_rows)
    if pad:
        slab = jnp.concatenate([slab, jnp.broadcast_to(c.xp[:1] * 0.0,
                                                       (pad,) + c.fp.shape[-1:])])
    return slab


def _slab_to_carry(slab, dims: Dims, p: LBFGSParams) -> _Carry:
    """Inverse of _carry_to_slab (row slices; Mosaic relayouts them freely
    through the loop-entry cleans)."""
    m, past = p.mem_size, max(p.past, 1)
    dp = dp_of(dims)
    o = 0

    def mat():
        nonlocal o
        v = slab[o:o + dp]
        o += dp
        return v

    def row():
        nonlocal o
        v = slab[o:o + 1]
        o += 1
        return v

    xp, gp, d = mat(), mat(), mat()
    lm_s = tuple(mat() for _ in range(m))
    lm_y = tuple(mat() for _ in range(m))
    (fp, stp, finit, dgtest, dstest, mu, nu, brackt, touched, lscnt,
     bound, k, n_evals, status) = (row() for _ in range(14))
    lm_ys = tuple(row() for _ in range(m))
    pf = slab[o:o + past]
    return _Carry(xp=xp, fp=fp, gp=gp, d=d, stp=stp, finit=finit,
                  dgtest=dgtest, dstest=dstest, mu=mu, nu=nu,
                  brackt=brackt, touched=touched, lscnt=lscnt,
                  lm_s=lm_s, lm_y=lm_y, lm_ys=lm_ys, bound=bound, k=k,
                  pf=pf, n_evals=n_evals, status=status)


def _solve_rounds(x0, sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims,
                  p: LBFGSParams, max_iter: int,
                  unroll_chunks: bool = False,
                  flags: EngineFlags | None = None,
                  resume=None) -> _Carry:
    """The fused round loop over values (runs inside the kernel; also
    testable as plain XLA). flags.mxu="x3" runs the objective's sample-map
    matmuls as 3-pass bf16 splits (kcost._dot3) while the solver frame
    (canonicalization matmuls, dot products, two-loop) stays on exact
    fp32 contracts — the in-round mixed-precision line search."""
    flags = flags or EngineFlags()
    frame = flags.frame
    # bind the frame mode into the layout helpers for this trace (the
    # module-level names are shadowed locally; globals() reaches the
    # originals since the local names are assigned in this scope)
    g_ = globals()
    _dot = functools.partial(g_["_dot"], frame=frame)
    _clean_row = functools.partial(g_["_clean_row"], frame=frame)
    _clean_mat = functools.partial(g_["_clean_mat"], frame=frame)
    adaptive_step = flags.adaptive_step
    clean_hist = flags.clean_hist
    dtype = x0.dtype
    DPx, TB = x0.shape
    m, past = p.mem_size, max(p.past, 1)
    i32 = dtype  # integer-valued carries ride as floats (see _Carry)

    def fg(x):
        return kcost.eval_fg(x, sc, kc, sw, dims,
                             unroll_chunks=unroll_chunks, flags=flags)

    if flags.t_prescale and resume is None:
        # initial time-scaling line search: evaluate the initial point at
        # a few total-duration multiples and start each lane from its
        # best. The initial T heuristic (e.g. dist/3) is the slowest-
        # converging direction when it is far off; 3 extra objective
        # evaluations (~3 rounds) can replace dozens of L-BFGS rounds
        # spent stretching time. Experiment knob (EngineFlags.t_prescale).
        from dftpav_tpu.cost import real_to_virtual, virtual_to_real

        S, N = dims.S, dims.N
        sig = resolve_vt_scale(flags.vt_scale, dims.ns_tuple)
        n_in = 2 * S * (N - 1)
        # vt-row selector built from iota INSIDE the trace (a captured
        # host constant would trip pallas_call's closed-constant check)
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (S, DPx), 1)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (S, DPx), 0)
        sel = (r_idx == n_in + s_idx).astype(dtype)
        # packed row s stores vt / sigma_s (see kcost._pre): scale back to
        # true vt before the time mapping, re-divide on write-back
        sig_row = sum(float(sig[s]) * (s_idx[:, :1] == s).astype(dtype)
                      for s in range(S))                 # [S, 1]
        dot = lambda A, B: jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())), preferred_element_type=dtype)

        def scaled(c):
            V = dot(sel, x0)                           # [S, TB] packed rows
            T = virtual_to_real(V * sig_row, sw.mini_t)
            V2 = real_to_virtual(T * c, sw.mini_t) / sig_row
            return x0 + dot(sel.T, V2 - V)

        xbest = x0
        fbest, gbest = fg(x0)
        fbest = _clean_row(fbest)
        for c in (0.65, 1.5, 2.4):
            xc = scaled(c)
            fc, gc = fg(xc)
            fc = _clean_row(fc)
            better = fc < fbest
            xbest = _selrow(better, xc, xbest)
            gbest = _selrow(better, gc, gbest)
            fbest = jnp.where(better, fc, fbest)
        x0, f0, g0 = xbest, fbest[0], gbest
    elif resume is None:
        f0, g0 = fg(x0)
    if resume is not None:
        # continue from a packed solver-state slab (multi-phase lane
        # compaction): lanes frozen at the previous phase's budget
        # (MAXITER) flip back to RUNNING and proceed bit-identically to an
        # uninterrupted run; every other status idles through the loop
        init = _slab_to_carry(resume, dims, p)
        init = init._replace(status=jnp.where(
            init.status == Status.MAXITER,
            jnp.asarray(float(Status.RUNNING), dtype), init.status))
    else:
        f0 = _clean_row(f0)                              # [1, TB]
        d0 = -g0
        gnorm = jnp.max(jnp.abs(g0), axis=0, keepdims=True)
        xnorm = jnp.max(jnp.abs(x0), axis=0, keepdims=True)
        already = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
        dginit0 = _dot(g0, d0)
        stp0 = 1.0 / jnp.maximum(jnp.sqrt(_dot(d0, d0)), 1e-30)

        # init members derive from x0 so their varying-manual-axes type
        # under shard_map matches the (data-derived) body outputs — fresh
        # jnp.zeros(...) would be unvarying and fail the while_loop carry
        # check
        zrow = x0[:1] * 0.0                              # varying [1, TB]
        zmat = x0 * 0.0
        init = _Carry(
            xp=x0, fp=f0, gp=g0, d=d0, stp=stp0,
            finit=f0, dgtest=p.f_dec_coeff * dginit0,
            dstest=p.s_curv_coeff * dginit0,
            mu=zrow, nu=zrow + p.max_step,
            brackt=zrow, touched=zrow,
            lscnt=zrow,
            lm_s=tuple(zmat for _ in range(m)),
            lm_y=tuple(zmat for _ in range(m)),
            lm_ys=tuple(zrow + 1.0 for _ in range(m)),
            bound=zrow, k=zrow + 1.0,
            pf=jnp.concatenate(
                [f0, jnp.broadcast_to(zrow, (past - 1, TB))])
            if past > 1 else f0,
            n_evals=zrow + 1.0,
            status=jnp.where(already, Status.CONVERGENCE,
                             Status.RUNNING).astype(dtype) + zrow,
        )

    onehot_rows = jax.lax.broadcasted_iota(jnp.int32, (past, TB), 0)
    onehot_rows = onehot_rows.astype(dtype)

    def cond(c: _Carry):
        return jnp.any(c.status == Status.RUNNING)

    def body(c: _Carry) -> _Carry:
        # canonicalize every carry layout (tiny matmul relayouts): Mosaic's
        # layout inference otherwise assigns the loop-carried values mixed
        # offset/replicated layouts whose pairwise ops need relayouts it has
        # not implemented (sublane broadcasts, replication changes)
        # history cleans are optional: the [DP, TB] identity matmuls over
        # m=16 slots are ~25% of per-round matmul FLOPs, and the history is
        # only touched through matmul-relayoutable ops (_dot, _selrow)
        ch_mat = _clean_mat if clean_hist else (lambda v: v)
        ch_row = _clean_row if clean_hist else (lambda v: v)
        c = _Carry(
            xp=_clean_mat(c.xp), fp=_clean_row(c.fp), gp=_clean_mat(c.gp),
            d=_clean_mat(c.d), stp=_clean_row(c.stp),
            finit=_clean_row(c.finit), dgtest=_clean_row(c.dgtest),
            dstest=_clean_row(c.dstest), mu=_clean_row(c.mu),
            nu=_clean_row(c.nu), brackt=_clean_row(c.brackt),
            touched=_clean_row(c.touched), lscnt=_clean_row(c.lscnt),
            lm_s=tuple(ch_mat(v) for v in c.lm_s),
            lm_y=tuple(ch_mat(v) for v in c.lm_y),
            lm_ys=tuple(ch_row(v) for v in c.lm_ys),
            bound=_clean_row(c.bound), k=_clean_row(c.k),
            # pf stays cleaned: the onehot sum-reduce over it needs a
            # zero-offset layout
            pf=_clean_mat(c.pf), n_evals=_clean_row(c.n_evals),
            status=_clean_row(c.status))
        act = c.status == Status.RUNNING
        x_try = c.xp + c.stp * c.d
        f_try, g_try = fg(x_try)
        f_try = _clean_row(f_try)                        # [1, TB]
        n_evals = c.n_evals + act.astype(dtype)

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
        lscnt = c.lscnt + cont.astype(dtype)
        code = jnp.zeros((1, TB), dtype)
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
        gnorm = jnp.max(jnp.abs(g_try), axis=0, keepdims=True)
        xnorm = jnp.max(jnp.abs(x_try), axis=0, keepdims=True)
        conv = gnorm / jnp.maximum(1.0, xnorm) < p.g_epsilon
        status = jnp.where(accept & conv, Status.CONVERGENCE, status)

        if p.past > 0:
            slot = jnp.mod(c.k, past)                    # [1, TB]
            onehot = onehot_rows == slot
            pf_slot = jnp.sum(jnp.where(onehot, c.pf, 0.0), axis=0,
                              keepdims=True)
            rate = jnp.abs(pf_slot - f_try) / jnp.maximum(1.0, jnp.abs(f_try))
            stop = (c.k >= past) & (rate < p.delta)
            status = jnp.where(accept & (status == Status.RUNNING) & stop,
                               Status.STOP, status)
            newpf = jnp.where(status == Status.RUNNING, f_try, pf_slot)
            pf = jnp.where(onehot & accept, newpf, c.pf)
        else:
            pf = c.pf
        # lanes still running after the convergence/stop tests complete
        # their FULL state transition (history, direction, next-search
        # setup, k) and only THEN may be marked MAXITER — so a lane frozen
        # at a phase budget carries exactly the state it would have had
        # mid-run, and the multi-phase resume (EngineFlags.phases) is
        # bit-identical to the uninterrupted solve
        running = accept & (status == Status.RUNNING)
        k = jnp.where(running, c.k + 1, c.k)

        # --- cautious history update + new direction ---
        s = x_try - c.xp
        y = g_try - c.gp
        ys = _dot(y, s)
        yy = _dot(y, y)
        cau = _dot(s, s) * jnp.sqrt(_dot(c.gp, c.gp)) * p.cautious_factor
        do_up = running & (ys > cau)
        lm_s = tuple(_selrow(do_up, new, old) for new, old
                     in zip((s,) + c.lm_s[:-1], c.lm_s))
        lm_y = tuple(_selrow(do_up, new, old) for new, old
                     in zip((y,) + c.lm_y[:-1], c.lm_y))
        lm_ys = tuple(jnp.where(do_up, new, old) for new, old
                      in zip((ys,) + c.lm_ys[:-1], c.lm_ys))
        bound = jnp.where(do_up, jnp.minimum(c.bound + 1, m), c.bound)
        d_new = _two_loop_t(g_try, lm_s, lm_y, lm_ys, bound, ys,
                            jnp.maximum(yy, 1e-30), dot=_dot)
        d_next = _selrow(do_up, d_new, -g_try)
        d = _selrow(accept, d_next, c.d)

        # --- next line-search setup for accepted lanes ---
        dginit = _dot(g_try, d_next)
        status = jnp.where(running & (dginit > 0.0),
                           Status.ERR_INCREASEGRADIENT, status)
        status = jnp.where(running & (status == Status.RUNNING)
                           & (k > max_iter), Status.MAXITER, status)
        finit = jnp.where(accept, f_try, c.finit)
        dgtest = jnp.where(accept, p.f_dec_coeff * dginit, c.dgtest)
        dstest = jnp.where(accept, p.s_curv_coeff * dginit, c.dstest)
        mu = jnp.where(accept, 0.0, mu)
        nu = jnp.where(accept, jnp.asarray(p.max_step, dtype), nu)
        brackt = (brackt_b & ~accept).astype(dtype)
        touched = (touched_b & ~accept).astype(dtype)
        lscnt = jnp.where(accept, 0, lscnt)
        if adaptive_step:
            # warm-start the next line search from the lane's ACCEPTED
            # step instead of the constant 1.0 (lbfgs.hpp behavior): lanes
            # whose good step is persistently < 1 skip the reject/bisect
            # trials. Multiplied and capped at 1 so well-scaled lanes keep
            # the unit Newton step; same stationary points, different
            # trial sequence (off by default for lbfgs.hpp path parity).
            stp_init = jnp.clip(c.stp * flags.adaptive_step_mult,
                                flags.adaptive_step_lo, 1.0)
        else:
            stp_init = jnp.ones_like(c.stp)
        stp = jnp.where(accept, stp_init, jnp.where(cont, stp_n, c.stp))

        xp = _clean_mat(_selrow(accept, x_try, c.xp))
        gp = _clean_mat(_selrow(accept, g_try, c.gp))
        d = _clean_mat(d)
        fp = jnp.where(accept | ls_fail, f_try, c.fp)

        return _Carry(xp=xp, fp=fp, gp=gp, d=d, stp=stp, finit=finit,
                      dgtest=dgtest, dstest=dstest, mu=mu, nu=nu,
                      brackt=brackt, touched=touched, lscnt=lscnt,
                      lm_s=lm_s, lm_y=lm_y, lm_ys=lm_ys, bound=bound,
                      k=k, pf=pf, n_evals=n_evals, status=status)

    return jax.lax.while_loop(cond, body, init)


def _kernel(x0_ref, bnd_ref, misc_ref, cn_ref, cp_ref, cm_ref, obsc_ref,
            P_ref, Q_ref, gridc_ref, *refs,
            dims, sw, p, max_iter, flags, emit_carry=False, resume=False):
    """Whole-solve kernel. Positional refs after the shared inputs:
    [slab_in (resume)] xout stats [slab_out (emit_carry)]. The carry slab
    (see _carry_to_slab) lets the multi-phase lane compaction continue a
    solve bit-identically in a later kernel launch."""
    sc = KScenario(bnd=bnd_ref[:], misc=misc_ref[:], corr_n=cn_ref[:],
                   corr_p=cp_ref[:], corr_m=cm_ref[:], obs_c=obsc_ref[:])
    kc = KConsts(P=P_ref[:], Q=Q_ref[:], gridc=gridc_ref[:])
    o = 0
    slab_in = None
    if resume:
        slab_in = refs[0][:]
        o = 1
    xout_ref, stats_ref = refs[o], refs[o + 1]
    out = _solve_rounds(x0_ref[:], sc, kc, sw, dims, p, max_iter,
                        unroll_chunks=True, flags=flags, resume=slab_in)
    xout_ref[:] = out.xp
    f32 = out.xp.dtype
    TB = out.fp.shape[-1]
    zero = jnp.zeros((1, TB), f32)
    # reported k is clamped to the budget (capped lanes run their full
    # state transition before MAXITER marks, leaving k = budget + 1)
    stats_ref[:] = jnp.concatenate([
        out.fp, out.status, jnp.minimum(out.k, float(max_iter)),
        out.n_evals, zero, zero, zero, zero])
    if emit_carry:
        refs[o + 2][:] = _carry_to_slab(out)


def _prep(batch: Scenario, w: Weights, dims: Dims, cfg: PlannerConfig,
          dtype, vt_scale: tuple | None = None):
    """Shared setup: clamp boundaries, pack x0 into padded [DP, B] rows,
    build kernel-layout slabs + constants."""
    from dftpav_tpu import cost as cost_mod
    from dftpav_tpu.solver import clamp_boundary_states

    batch = jax.vmap(lambda s: clamp_boundary_states(s, w))(batch)
    x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch)
    D = x0.shape[1]
    B = x0.shape[0]
    if vt_scale is not None and any(v != 1.0 for v in vt_scale):
        # kcost._pre multiplies the vt rows back by sigma_s (see its
        # docstring note): pack the preconditioned coordinates here
        n_in = 2 * dims.S * (dims.N - 1)
        sig = jnp.asarray(vt_scale, x0.dtype)
        x0 = x0.at[:, n_in:n_in + dims.S].divide(sig[None])
    x0p = jnp.zeros((dp_of(dims), B), dtype).at[:D].set(x0.T.astype(dtype))
    sc = kcost.prep_scenario(batch, dims, dtype)
    kc = kcost.make_consts(dims, dtype)
    return batch, x0p, sc, kc, D


def _finalize(batch, out_x, out_f, out_status, out_k, w, dims, cfg, D,
              vt_scale: tuple | None = None):
    """Final trajectory coefficients + SolveResult from optimized variables
    (once per solve, outside the hot loop — same path as
    solve_batch_bminor)."""
    from dftpav_tpu import cost as cost_mod
    from dftpav_tpu import minco

    x_fin = out_x[:D]
    if vt_scale is not None and any(v != 1.0 for v in vt_scale):
        n_in = 2 * dims.S * (dims.N - 1)
        sig = jnp.asarray(vt_scale, x_fin.dtype)
        x_fin = x_fin.at[n_in:n_in + dims.S].multiply(sig[:, None])
    u = bcost.unpack_b(x_fin, dims)
    T = cost_mod.virtual_to_real(u.vt, w.mini_t)
    dT = T / dims.N
    bm = bcost.to_bminor(batch)
    heads, tails = bcost.boundary_states_b(bm, u, w, dims)
    with jax.default_matmul_precision("float32"):
        if dims.Ns is None:
            maps = minco.maps_as(dims.N, out_x.dtype)
            coeffs = bcost.generate_b(u.inner, dT, heads, tails, maps)
        else:
            # per-segment piece classes: generate each segment on its own
            # n_s pieces, then re-express exactly on the class-uniform
            # N-piece grid (minco.subdivide) so the output contract
            # ([S, N, 6, 2], dT = T/N) is unchanged for every consumer
            segs = []
            for s, n_s in enumerate(dims.ns_tuple):
                maps_s = minco.maps_as(n_s, out_x.dtype)
                c_s = bcost.generate_b(
                    u.inner[s:s + 1, :n_s - 1], (T[s] / n_s)[None],
                    heads[s:s + 1], tails[s:s + 1], maps_s)  # [1,n_s,6,2,B]
                r = dims.N // n_s
                A = jnp.asarray(minco.subdivision_matrix(r), out_x.dtype)
                sub = jnp.einsum("imk,qkdb->qimdb", A, c_s[0])
                segs.append(sub.reshape(dims.N, 6, 2, c_s.shape[-1]))
            coeffs = jnp.stack(segs)                     # [S, N, 6, 2, B]

    cost = out_f / cfg.opt.cost_scale
    ok = out_status >= 0
    success = ok & (cost < cfg.opt.reject_cost)
    return SolveResult(coeffs=jnp.moveaxis(coeffs, -1, 0), dT=dT.T,
                       cost=cost, n_iters=out_k,
                       status=out_status, success=success)


def solve_batch_rounds(batch: Scenario, w: Weights, dims: Dims,
                       cfg: PlannerConfig,
                       max_iterations: int | None = None,
                       flags: EngineFlags | None = None) -> SolveResult:
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
    assert not getattr(cfg.opt, "ref_trajtime_compat", False) or dims.S == 1, \
        "the reference trajtimes quirk is vmap-engine-only"
    flags = flags or EngineFlags()
    vt_scale = resolve_vt_scale(flags.vt_scale, dims.ns_tuple)
    dtype = batch.init_T.dtype
    p = cfg.opt.lbfgs
    max_iter = p.max_iterations if max_iterations is None else max_iterations
    sw = StaticW.build(w, cfg, concrete=False)
    with jax.default_matmul_precision("float32"):
        batch, x0p, sc, kc, D = _prep(batch, w, dims, cfg, dtype, vt_scale)
        out = _solve_rounds(x0p, sc, kc, sw, dims, p, max_iter, flags=flags)
    # raw carry leaves k = budget + 1 on capped lanes (they complete the
    # full state transition before the MAXITER mark — see _solve_rounds);
    # reported n_iters clamps to the budget like blbfgs and the kernel
    k = jnp.minimum(out.k, float(max_iter))
    return _finalize(batch, out.xp, out.fp[0],
                     out.status[0].astype(jnp.int32),
                     k[0].astype(jnp.int32), w, dims, cfg, D, vt_scale)


def solve_batch_fused(batch: Scenario, w: Weights, dims: Dims,
                      cfg: PlannerConfig, max_iterations: int | None = None,
                      tb: int = 128, interpret: bool = False,
                      x0_override=None, return_x: bool = False,
                      mxu_precision: str | None = None,
                      flags: EngineFlags | None = None):
    """Drop-in equivalent of solver.solve_batch_bminor on the fused kernel.

    batch: Scenario with leading [B] (B % tb == 0). Weights must be
    concrete (compile-time) values — the kernel bakes them in.
    x0_override ([dp_of(dims), B]) warm-starts from a packed decision
    matrix (used by the warm-replan stream and the mixed-precision
    two-phase solve); return_x adds the final packed decision matrix to
    the return.
    flags.mxu:
      "x3" (mixed, the headline): objective sample-map matmuls run as
          3-pass bf16 splits (~2x the fp32-contract round rate, error
          ~2^-17), the solver frame stays on exact fp32 contracts;
      "f32": every matmul an fp32 contract (~6 bf16 MXU passes) —
          the conservative default;
      "bf16": single-pass bf16 everywhere — fastest, but degrades the
          line search (measured: cost p50 5750 vs 4361, premature STOP at
          21 iters); kept for the exploration phase of
          solve_batch_fused_mixed.
    mxu_precision: legacy alias for flags.mxu ("float32"/"x3"/"bfloat16").
    """
    if flags is None:
        mxu = {"float32": "f32", "x3": "x3", "bfloat16": "bf16",
               None: "f32"}[mxu_precision]
        flags = EngineFlags(mxu=mxu)
    if flags.mxu != "bf16":
        with jax.default_matmul_precision("float32"):
            return _solve_batch_fused(batch, w, dims, cfg, max_iterations,
                                      tb, interpret, x0_override, return_x,
                                      flags=flags)
    return _solve_batch_fused(batch, w, dims, cfg, max_iterations, tb,
                              interpret, x0_override, return_x, flags=flags)


def solve_batch_fused_mixed(batch: Scenario, w: Weights, dims: Dims,
                            cfg: PlannerConfig,
                            max_iterations: int | None = None,
                            tb: int = 128,
                            phase1_iterations: int | None = None,
                            flags: EngineFlags | None = None
                            ) -> SolveResult:
    """Two-phase fused solve: bf16 exploration + f32 refinement.

    Phase 1 runs the kernel with default (bf16) MXU matmuls — ~4x faster
    per round but noisy enough to stop early in slightly-off basins
    (PERF.md) — and phase 2 restarts L-BFGS in f32 from phase 1's iterate,
    converging in few rounds. Costs one extra kernel launch and compile
    class; quality gates (success, cost p50) must match the pure-f32 solve.
    """
    import dataclasses as _dc

    flags = flags or EngineFlags()
    p = cfg.opt.lbfgs
    mi = p.max_iterations if max_iterations is None else max_iterations
    p1 = max(mi // 3, 20) if phase1_iterations is None else phase1_iterations
    _res1, x1 = solve_batch_fused(batch, w, dims, cfg, max_iterations=p1,
                                  tb=tb, return_x=True,
                                  flags=_dc.replace(flags, mxu="bf16"))
    return solve_batch_fused(batch, w, dims, cfg, max_iterations=mi, tb=tb,
                             x0_override=x1,
                             flags=_dc.replace(flags, mxu="f32"))


def _solve_batch_fused(batch, w, dims, cfg, max_iterations, tb, interpret,
                       x0_override=None, return_x=False,
                       flags: EngineFlags | None = None):
    flags = flags or EngineFlags()
    vt_scale = resolve_vt_scale(flags.vt_scale, dims.ns_tuple)
    dtype = jnp.float32 if not interpret else batch.init_T.dtype
    B = batch.ini_state.shape[0]
    assert B % tb == 0, (B, tb)
    p = cfg.opt.lbfgs
    max_iter = p.max_iterations if max_iterations is None else max_iterations
    sw = StaticW.build(w, cfg)
    batch, x0p, sc, kc, D = _prep(batch, w, dims, cfg, dtype, vt_scale)
    if x0_override is not None:
        x0p = jnp.asarray(x0_override, dtype)

    def lane_spec(shape):
        nlead = len(shape)
        return pl.BlockSpec(shape + (tb,),
                            lambda b, nlead=nlead: (0,) * nlead + (b,),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nlead = len(shape)
        return pl.BlockSpec(shape, lambda b, nlead=nlead: (0,) * nlead,
                            memory_space=pltpu.VMEM)

    R = kcost.r_rows(dims)
    dp = dp_of(dims)

    srows = slab_rows(dims, p)

    def run(x0_, sc_, budget, slab=None, emit_carry=False):
        """One whole-solve kernel launch over the lanes of x0_/sc_.

        slab: packed solver state to resume from (_carry_to_slab);
        emit_carry additionally outputs the final state slab. Returns
        (x, stats[, slab_out])."""
        B_ = x0_.shape[-1]
        resume = slab is not None
        kern = functools.partial(_kernel, dims=dims, sw=sw, p=p,
                                 max_iter=budget, flags=flags,
                                 emit_carry=emit_carry, resume=resume)
        in_specs = [
            lane_spec((dp,)),                 # x0
            lane_spec((bnd_rows(dims),)),     # bnd
            lane_spec((misc_rows(dims),)),    # misc
            lane_spec((dims.H, 2, dims.S * R)),   # corr_n
            lane_spec((dims.H, 2, dims.S * R)),   # corr_p
            lane_spec((dims.H, dims.S * R)),      # corr_m
            lane_spec((max(dims.O, 1), 2, 6 * dims.Po)),  # obs_c
            const_spec(tuple(kc.P.shape)),      # [S, 3, R, C]
            const_spec(tuple(kc.Q.shape)),      # [S, Cq, C]
            const_spec(tuple(kc.gridc.shape)),  # [S, 2, R, 1]
        ]
        args = [x0_, sc_.bnd, sc_.misc, sc_.corr_n, sc_.corr_p,
                sc_.corr_m, sc_.obs_c, kc.P, kc.Q, kc.gridc]
        if resume:
            in_specs.append(lane_spec((srows,)))
            args.append(slab)
        out_specs = [lane_spec((dp,)), lane_spec((8,))]
        out_shape = [jax.ShapeDtypeStruct((dp, B_), dtype),
                     jax.ShapeDtypeStruct((8, B_), dtype)]
        if emit_carry:
            out_specs.append(lane_spec((srows,)))
            out_shape.append(jax.ShapeDtypeStruct((srows, B_), dtype))
        return pl.pallas_call(
            kern,
            grid=(B_ // tb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)

    phases = tuple(flags.phases or ())
    tail_iters = sum(it for _, it in phases)
    assert tail_iters < max_iter, (flags.phases, max_iter)
    out1 = run(x0p, sc, max_iter - tail_iters, emit_carry=bool(phases))
    x_out, stats = out1[0], out1[1]
    slab = out1[2] if phases else None

    # Multi-phase lane compaction (EngineFlags.phases): gather the lanes
    # that exhausted the phase budget (status == MAXITER) into a dense
    # ceil(frac*B) sub-batch — device-side stable sort, zero host round
    # trips — and continue them FROM THE PACKED SOLVER-STATE SLAB, so the
    # phased solve is bit-identical per lane to the uninterrupted run
    # (history, bracket state, and the past-f window all carry over; the
    # per-phase budget is cumulative through k). Padding lanes are already
    # non-RUNNING and idle through the continuation; tiles whose lanes all
    # finish exit early.
    for i, (frac, iters) in enumerate(phases):
        budget_i = max_iter - sum(it for _, it in phases[i + 1:])
        n_i = min(B, max(tb, int(round(frac * B / tb)) * tb))
        need = stats[1] == float(Status.MAXITER)
        order = jnp.argsort(jnp.where(need, 0, 1), stable=True)
        idx = order[:n_i]                                    # [n_i]
        sc_sub = KScenario(*(a[..., idx] for a in sc))
        last = i == len(phases) - 1
        out2 = run(x_out[:, idx], sc_sub, budget_i, slab=slab[:, idx],
                   emit_carry=not last)
        x2, st2 = out2[0], out2[1]
        sel = need[idx]                                      # continued?
        x_out = x_out.at[:, idx].set(
            jnp.where(sel[None], x2, x_out[:, idx]))
        for r_ in range(4):
            stats = stats.at[r_, idx].set(
                jnp.where(sel, st2[r_], stats[r_][idx]))
        if not last:
            slab = slab.at[:, idx].set(out2[2])

    res = _finalize(batch, x_out, stats[0], stats[1].astype(jnp.int32),
                    stats[2].astype(jnp.int32), w, dims, cfg, D, vt_scale)
    return (res, x_out) if return_x else res
