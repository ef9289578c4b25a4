"""Batched trajectory optimizer: the PolyTrajOptimizer::OptimizeTrajectory
equivalent (reference: traj_optimizer.cpp:7-202), vmapped over scenarios.

Usage:
    solve = make_solver(cfg, dims)                      # jitted, batched
    result = solve(scenario_batch, weights)             # SolveResult with [B] axis
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dftpav_tpu import cost as cost_mod
from dftpav_tpu import lbfgs, minco
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.types import Dims, Scenario, SolveResult, Weights


def clamp_boundary_states(scen: Scenario, w: Weights) -> Scenario:
    """Clamp boundary velocity/acc magnitudes below the per-direction limits
    (reference: traj_optimizer.cpp:54-76)."""
    fwd = scen.singul > 0
    max_vel = jnp.where(fwd, w.max_forward_vel, w.max_backward_vel)
    max_acc = jnp.where(fwd, w.max_forward_acc, w.max_backward_acc)

    def clamp(states, lim, col):
        v = states[:, :, col]
        n = jnp.linalg.norm(v, axis=-1)
        scale = jnp.where(n >= lim, (lim - 1e-2) / jnp.maximum(n, 1e-12), 1.0)
        return states.at[:, :, col].set(v * scale[:, None])

    ini, fin = scen.ini_state, scen.fin_state
    ini = clamp(clamp(ini, max_vel, 1), max_acc, 2)
    fin = clamp(clamp(fin, max_vel, 1), max_acc, 2)
    return scen._replace(ini_state=ini, fin_state=fin)


def solve_one(scen: Scenario, w: Weights, dims: Dims, cfg: PlannerConfig,
              max_iterations: int | None = None) -> SolveResult:
    """Solve a single scenario (vmap over a batch of pytrees to batch).

    Traced under bf16x3 ("float32") matmul precision: the TPU MXU's default
    bf16 truncation costs ~3 decimal digits in the MINCO solve and basis
    einsums, which stalls the line search (lanes exhaust max_linesearch at
    ~2.5x the converged cost). bf16x3 restores f32-true matmuls at ~3x MXU
    cost — negligible here, the matrices are tiny.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_one(scen, w, dims, cfg, max_iterations)


def _solve_one(scen: Scenario, w: Weights, dims: Dims, cfg: PlannerConfig,
               max_iterations: int | None = None) -> SolveResult:
    scen = clamp_boundary_states(scen, w)
    x0 = cost_mod.initial_guess(scen, w, dims)

    scale = cfg.opt.cost_scale
    if getattr(cfg.opt, "ref_gradient_compat", False):
        fun = cost_mod.ref_compat_value_and_grad(scen, w, dims, cfg, scale)
    else:
        fun = jax.value_and_grad(
            lambda x: scale * cost_mod.total_cost(x, scen, w, dims, cfg)[0])
    res = lbfgs.minimize(fun, x0, cfg.opt.lbfgs, max_iterations=max_iterations)

    u = cost_mod.unpack(res.x, dims)
    T = cost_mod.virtual_to_real(u.vt, w.mini_t)
    dT = T / dims.N
    heads, tails = cost_mod.boundary_states(scen, u, w, dims)
    maps = minco.maps_as(dims.N, res.x.dtype)
    coeffs = jax.vmap(minco.generate, in_axes=(0, 0, 0, 0, None))(
        u.inner, dT, heads, tails, maps)

    cost = res.f / scale
    ok = res.status >= 0
    success = ok & (cost < cfg.opt.reject_cost)
    return SolveResult(coeffs=coeffs, dT=dT, cost=cost, n_iters=res.n_iters,
                       status=res.status, success=success)


def solve_batch_bminor(batch: Scenario, w: Weights, dims: Dims,
                       cfg: PlannerConfig,
                       max_iterations: int | None = None) -> SolveResult:
    """Batch solve in the batch-minor layout (see dftpav_tpu.ops.__doc__).

    Same math and iterate path as vmap(solve_one) — parity-tested in
    tests/test_ops.py — but every tensor carries the scenario batch as its
    trailing axis, cutting cost+grad HBM traffic ~50x on TPU.
    """
    from dftpav_tpu.ops import bcost, blbfgs

    with jax.default_matmul_precision("float32"):
        batch = jax.vmap(lambda s: clamp_boundary_states(s, w))(batch)
        x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch)
        bm = bcost.to_bminor(batch)
        scale = cfg.opt.cost_scale

        def f_sum(xT):
            f, _aux = bcost.total_cost_b(xT, bm, w, dims, cfg)
            fs = scale * f
            return jnp.sum(fs), fs

        def fun(xT):
            (_, f), g = jax.value_and_grad(f_sum, has_aux=True)(xT)
            return f, g

        res = blbfgs.minimize_b(fun, x0.T, cfg.opt.lbfgs,
                                max_iterations=max_iterations)

        u = bcost.unpack_b(res.x, dims)
        T = cost_mod.virtual_to_real(u.vt, w.mini_t)        # [S, B]
        dT = T / dims.N
        heads, tails = bcost.boundary_states_b(bm, u, w, dims)
        maps = minco.maps_as(dims.N, res.x.dtype)
        coeffs = bcost.generate_b(u.inner, dT, heads, tails, maps)

        cost = res.f / scale
        ok = res.status >= 0
        success = ok & (cost < cfg.opt.reject_cost)
        return SolveResult(coeffs=jnp.moveaxis(coeffs, -1, 0),
                           dT=dT.T, cost=cost, n_iters=res.n_iters,
                           status=res.status, success=success)


def make_solver(cfg: PlannerConfig, dims: Dims,
                max_iterations: int | None = None, jit: bool = True,
                engine: str = "bminor",
                flags: "EngineFlags | None" = None):
    """Build a batched solver: (Scenario with leading [B] axis, Weights) -> SolveResult.

    Engines (all the same math; see PERF.md for hardware numbers):
      "bminor" (default): batch-minor layout, nested iteration/line-search
          loops; supports any S and traced weights.
      "rounds": asynchronous-lane round loop (ops/pallas_solve) as plain
          XLA — each round advances every active lane by one objective
          evaluation, so the batch pays mean (not max) line-search trials.
      "fused": the whole-solve Pallas kernel (one VMEM-resident program per
          128-lane tile; the bench headline). Weights are baked in at
          compile time (retraces per distinct weight set).
      "fused-mixed": two-phase fused solve — bf16 exploration + f32
          refinement (see solve_batch_fused_mixed).
      "vmap": the readable per-scenario reference path.

    flags: EngineFlags tuning knobs for the kcost engines (rounds/fused).
    None resolves to EngineFlags.from_env() — library defaults (exact
    lbfgs.hpp parity semantics) with any set DFTPAV_* env vars applied;
    benchmarks pass EngineFlags.tuned() explicitly.
    """
    from dftpav_tpu.config import EngineFlags

    if engine != "vmap" and getattr(cfg.opt, "ref_gradient_compat", False):
        raise ValueError(
            "ref_gradient_compat (the reference's cross-segment time-grad "
            "quirk) is implemented only by the per-scenario engine; use "
            "make_solver(..., engine='vmap')")
    if dims.Ns is not None and engine not in ("rounds", "fused",
                                              "fused-mixed"):
        raise ValueError(
            "per-segment piece classes (Dims.Ns) are implemented by the "
            "kcost-based engines (rounds/fused); the bminor/vmap paths "
            "assume uniform N")
    if flags is None:
        flags = EngineFlags.from_env()
    if engine in ("fused", "fused-mixed"):
        import os as _os

        from dftpav_tpu.ops.pallas_solve import (solve_batch_fused,
                                                 solve_batch_fused_mixed)
        import numpy as _np

        impl = (solve_batch_fused_mixed if engine == "fused-mixed"
                else solve_batch_fused)
        compiled = {}

        def fused(batch, w):
            wkey = tuple(float(_np.asarray(v)) for v in w)
            shapes = tuple((tuple(a.shape), str(a.dtype)) for a in batch)
            key = (wkey, shapes)
            if key not in compiled:
                wk = w
                jitted = jax.jit(lambda b: impl(
                    b, wk, dims=dims, cfg=cfg,
                    max_iterations=max_iterations, flags=flags))
                # serialized-executable cache: a previously-compiled class
                # cold-loads in <1 s instead of re-paying the 150-230 s
                # remote compile (utils/exec_cache; DFTPAV_EXEC_CACHE=0
                # disables)
                from dftpav_tpu.utils import exec_cache
                compiled[key] = exec_cache.load_or_compile(
                    jitted, (batch,),
                    key_parts=(engine, flags, dims, max_iterations, wkey,
                               repr(cfg)),
                    verbose=_os.environ.get("DFTPAV_EXEC_CACHE_VERBOSE")
                    == "1")
            return compiled[key](batch)

        return fused
    if engine == "rounds":
        from dftpav_tpu.ops.pallas_solve import solve_batch_rounds
        fn = functools.partial(solve_batch_rounds, dims=dims, cfg=cfg,
                               max_iterations=max_iterations, flags=flags)
    elif engine == "bminor":
        fn = functools.partial(solve_batch_bminor, dims=dims, cfg=cfg,
                               max_iterations=max_iterations)
    else:
        fn = jax.vmap(
            functools.partial(solve_one, dims=dims, cfg=cfg,
                              max_iterations=max_iterations),
            in_axes=(0, None))
    return jax.jit(fn) if jit else fn


def solve_with_retry(solve, batch: Scenario, w: Weights,
                     time_scales=(1.6, 0.7), pad_to: int = 128):
    """Solve, then re-solve the FAILED lanes with rescaled initial
    durations, keeping each lane's first successful result.

    The reference deals with hard instances by retrying (relaxed-direction
    kino search, traj_manager.cpp:90-103; the server keeps the previous
    trajectory when the optimizer fails, traj_server_ros.cpp:166-186).
    For the batched engine the analogous recovery is a retry ladder on the
    initial time guess: most residual failures are line-search stalls from
    a bad init_T (too-stiff warm-start spline), and a stretched (or
    shrunk) initial duration reaches a different basin. Failed lanes are
    host-gathered into a small padded batch (tile-size multiple for the
    fused kernel), re-solved per scale, and scattered back.

    `solve`: a (batch, w) -> SolveResult callable from make_solver (any
    engine; batch sizes padded to `pad_to` must be compile-compatible —
    the fused kernel retraces once per retry batch size).
    """
    res = solve(batch, w)
    success = np.asarray(res.success).copy()
    out = jax.tree.map(np.asarray, res)
    for scale in time_scales:
        idx = np.nonzero(~success)[0]
        if idx.size == 0:
            break
        n = int(-(-idx.size // pad_to) * pad_to)
        sel = np.concatenate([idx, np.repeat(idx[:1], n - idx.size)])
        sub = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[sel]), batch)
        sub = sub._replace(init_T=sub.init_T * scale)
        r2 = solve(sub, w)
        ok2 = np.asarray(r2.success)[: idx.size]
        fixed = idx[ok2]
        if fixed.size:
            take = np.nonzero(ok2)[0]
            out = type(out)(*(
                _scatter_rows(f_out, fixed, np.asarray(f_new)[take])
                for f_out, f_new in zip(out, r2)))
            success[fixed] = True
    return out._replace(success=success)


def _scatter_rows(dst, idx, rows):
    dst = np.asarray(dst).copy()
    dst[idx] = rows
    return dst
