"""Headline benchmark: batched trajectory optimizations/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference C++ planner solves one trajectory per replan inside a
~10 ms budget on an i7-10700 (BASELINE.md) => ~100 solves/s/device.
vs_baseline is measured solves/s divided by that.

Timing is synchronized through a host readback (the axon remote-TPU relay
acks async dispatch immediately; see .claude/skills/verify/SKILL.md).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# NOTE on compile times: JAX's persistent compilation cache can be forced
# on for the axon relay (utils/cache.enable_persistent_cache) and WRITES
# work, but executable deserialization on the read path hangs the relay
# indefinitely (measured twice, 500 s+), so it stays off here and every
# bench process pays the remote compile. Local chipless AOT compiles the
# same program in ~55 s (tools/aot_fused.py) — the wall is the relay's
# remote-compile service, not XLA/Mosaic.

BASELINE_SOLVES_PER_S = 100.0


def _frontend_batch_cached(dims, B, seed):
    """Front-end-sourced scenarios (real kino-A*/corridor geometry) with an
    npz cache — generation is ~3 min host-side at B=1024."""
    from dftpav_tpu import scenarios
    from dftpav_tpu.types import Scenario

    key = f"frontend_b{B}_s{seed}_S{dims.S}N{dims.N}K{dims.K}" \
          f"{dims.Kdes}O{dims.O}"
    if dims.Ns is not None:
        key += "Ns" + "-".join(str(n) for n in dims.Ns)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_cache", key + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return Scenario(**{k: z[k] for k in z.files})
    scens = scenarios.frontend_batch(dims, B, seed=seed, dtype=np.float32,
                                     n_obstacles=2)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **scens._asdict())
    return scens


# the S=2 per-segment class ladder: every quantized (n0, n1) combo the
# front end produces (tools/s2_distribution.py), benched classes = the six
# covering >= 95% of two-gear plans
MG_ALL = ((8, 2), (4, 2), (2, 8), (2, 2), (4, 8), (8, 8), (2, 4), (4, 4),
          (8, 4))
MG_BENCHED = ((8, 2), (4, 2), (2, 8), (2, 2), (4, 8), (8, 8), (2, 4))


def _mg_dims(ns):
    from dftpav_tpu.types import Dims

    return Dims(S=2, N=8, K=16, Kdes=32, H=4, O=2, Po=8, Ns=tuple(ns))


def _multigear_pool_cached(n_plans, seed):
    """Pooled two-gear front-end plans bucketed by class (npz cache)."""
    from dftpav_tpu import scenarios
    from dftpav_tpu.types import Scenario

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_cache", f"mgpool_n{n_plans}_s{seed}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            names = [f[:-len("_ini_state")] for f in z.files
                     if f.endswith("_ini_state")]
            buckets = {}
            for nm in names:
                ns = tuple(int(v) for v in nm.split("-"))
                buckets[ns] = Scenario(**{
                    k: z[f"{nm}_{k}"] for k in Scenario._fields})
            return buckets, int(z["n_s2"])
    buckets_l, n_s2 = scenarios.frontend_pool_multigear(
        [_mg_dims(ns) for ns in MG_ALL], n_plans, seed=seed,
        dtype=np.float32, n_obstacles=2)
    out = {}
    flat = {"n_s2": np.asarray(n_s2)}
    for ns, lst in buckets_l.items():
        if not lst:
            continue
        stacked = scenarios.stack_scenarios(lst)
        out[ns] = stacked
        nm = "-".join(str(v) for v in ns)
        for k, v in stacked._asdict().items():
            flat[f"{nm}_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flat)
    return out, n_s2


def _tile_to(scens, B):
    """Repeat/trim a stacked Scenario to exactly B lanes."""
    import jax

    n = scens.ini_state.shape[0]
    reps = -(-B // n)
    return jax.tree.map(
        lambda a: np.concatenate([np.asarray(a)] * reps)[:B], scens)


def main():
    from dftpav_tpu import scenarios, solver
    from dftpav_tpu.config import EngineFlags, PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config

    import dataclasses as _dc

    cfg = PlannerConfig()
    # The tuned engine stack (PERF.md): in-round mixed-precision matmuls,
    # floorless x1.2 adaptive warm step, auto per-slot virtual-time
    # preconditioning. Passed EXPLICITLY (library defaults stay at exact
    # lbfgs.hpp parity semantics); DFTPAV_* env vars still override.
    flags = EngineFlags.from_env(EngineFlags.tuned())
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    B = int(os.environ.get("BENCH_BATCH", "8192"))
    # Headline multi-phase lane-compaction schedule (round 5, PERF.md):
    # cut points sized from the measured iters CDF (tools/iters_cdf.py);
    # the still-running minority is gathered into dense tiles at 50/72/100
    # iterations so tiles stop paying ~150 rounds for a median-72 workload.
    # Fractions quantize to tb/B-tile multiples, so the same flags object
    # serves any batch size. Applied to the cold headline + frontend
    # distribution only — warm/gated streams (budget 50) and the small
    # multigear batches run phase-free.
    if flags.phases == () and os.environ.get("BENCH_PHASES", "1") == "1":
        hl_flags = _dc.replace(flags, phases=((0.828125, 22),
                                              (0.515625, 28), (0.25, 50)))
    else:
        hl_flags = flags
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "150"))
    # --source frontend: headline batch comes from the real front end
    # (kino A* + corridor growth over randomized lots); default "both"
    # benches the synthetic headline AND the frontend distribution with the
    # same compiled solver.
    import sys as _sys
    source = os.environ.get("BENCH_SOURCE", "both")
    if "--source" in _sys.argv:
        source = _sys.argv[_sys.argv.index("--source") + 1]
    # headline engine: the whole-solve Pallas kernel (hardware-proven
    # 10,175 solves/s at B=8192/150 iters with the tuned stack + 3-phase
    # lane compaction, success 0.999, cost p50 within the 2%-of-bminor
    # gate — see PERF.md round 5); override with BENCH_ENGINE / --engine
    engine = os.environ.get("BENCH_ENGINE", "fused")
    if "--engine" in _sys.argv:
        engine = _sys.argv[_sys.argv.index("--engine") + 1]

    if source == "frontend":
        scens = _frontend_batch_cached(dims, B, seed=7)
    else:
        scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                          n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    solve = solver.make_solver(cfg, dims, max_iterations=max_iter,
                               engine=engine, flags=hl_flags)
    batch = jax.tree.map(jnp.asarray, scens)

    t0 = time.time()
    res = solve(batch, w)
    cost = np.asarray(res.cost)  # sync
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        res = solve(batch, w)
        cost = np.asarray(res.cost)
        best = min(best, time.time() - t1)

    succ = np.asarray(res.success.astype(jnp.int32))
    iters = np.asarray(res.n_iters)
    solves_per_s = B / best

    # perf accounting (VERDICT r4 task 8): tail percentiles + an analytic
    # FLOP estimate so "tail dominates / VPU-bound" is checkable from this
    # JSON alone. FLOPs per objective eval per lane (kcost layout): the
    # sample-map matmuls (3 orders x 2 dims x 2rC, x3 split = 3 passes,
    # fwd + ~2x in the chunked VJP) plus the dominant elementwise penalty
    # blocks (corridor E*H terms, feasibility, and the dual-LSE obstacle
    # block — transcendental-heavy VPU work, ~3x fwd in the VJP).
    from dftpav_tpu.ops import kcost as _kc
    r_act = sum(_kc.seg_active(dims, s) for s in range(dims.S))
    Cw = dims.N + 5
    mm_eval = 3 * (12 * r_act * Cw) * 3        # fwd+VJP, 3-pass splits
    ew_row = 160 + 40 + 1100 * dims.O          # fwd elementwise per row
    ew_eval = 3 * ew_row * r_act
    flops_eval = mm_eval + ew_eval
    evals = iters * 1.15                       # ~mean line-search trials
    flops_per_solve = float(np.mean(evals)) * flops_eval
    achieved_tflops = flops_per_solve * solves_per_s / 1e12
    MXU_PEAK_TFLOPS = 197.0                    # v5e bf16
    perf_fields = {
        "iters_p90": int(np.percentile(iters, 90)),
        "iters_p99": int(np.percentile(iters, 99)),
        "flops_per_solve_est": round(flops_per_solve / 1e6, 1),  # MFLOP
        "achieved_tflops_est": round(achieved_tflops, 3),
        "mfu_pct_vs_mxu_peak": round(100 * achieved_tflops
                                     / MXU_PEAK_TFLOPS, 3),
    }

    # warm-started receding-horizon replans (the reference's actual 20 Hz
    # workload, traj_server_ros.cpp:406-501): iterate counts collapse ~3x
    # and a replan budget of 50 iterations matches the reference's
    # Budget-bounded replan semantics (traj_server_ros.cpp:474). The stream
    # runs the SAME engine as the headline (the warm guess rides in the
    # rewritten scenario, so the fused kernel warm-starts too).
    from dftpav_tpu import replan as replan_mod
    rp = replan_mod.make_replanner(cfg, dims, dt_shift=0.1,
                                   max_iterations=50, engine=engine,
                                   flags=flags)
    b1, r1 = rp(batch, res, w)
    _ = np.asarray(r1.cost)
    t0 = time.time()
    b2, r2 = rp(b1, r1, w)
    cost_w = np.asarray(r2.cost)
    warm_wall = time.time() - t0
    succ_w = np.asarray(r2.success.astype(jnp.int32))

    # gated warm stream (VERDICT r4 task 6): only lanes whose batched
    # CheckReplan fires re-solve (traj_server_ros.cpp:359-402 semantics);
    # the replan-QPS capacity is B/4 lanes per tick. Ticks advance from the
    # headline solution; the published number is lanes advanced per second
    # on the mixed steady state (most lanes mid-trajectory, the near-end /
    # collision minority re-solving).
    gated_fields = {}
    if os.environ.get("BENCH_GATED", "1") == "1":
        gr = replan_mod.make_gated_replanner(
            cfg, dims, dt_shift=0.1, max_iterations=50, engine=engine,
            flags=flags, capacity=0.25)
        gb, gp, ga = batch, res, jnp.zeros((B,), jnp.float32)
        for _ in range(3):                      # develop a mixed state
            gb, gp, ga, n_need = gr(gb, gp, ga, w)
        _ = np.asarray(gp.cost)
        t0 = time.time()
        gb, gp, ga, n_need = gr(gb, gp, ga, w)
        _ = np.asarray(gp.cost)
        gated_wall = time.time() - t0
        gated_fields = {
            "gated_lanes_per_s": round(B / gated_wall, 1),
            "gated_replanned": int(np.asarray(n_need)),
            "gated_success_rate": round(float(np.asarray(
                gp.success.astype(jnp.int32)).mean()), 4),
        }

    # small-batch p50 solve latency (BASELINE.md: < 10 ms target; single
    # calls through the axon relay sit on its ~25-33 ms RTT floor, so the
    # published latency is RTT-bound — see PERF.md latency table)
    latency_fields = {}
    if os.environ.get("BENCH_LATENCY", "1") == "1":
        import functools as _ft

        from dftpav_tpu.ops.pallas_solve import solve_batch_fused as _sbf
        from dftpav_tpu.utils import exec_cache as _ec
        for Bl in (1, 32, 128):
            tbl = min(128, Bl)
            sub = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[:Bl]),
                               scens)
            jl = jax.jit(_ft.partial(_sbf, w=w, dims=dims, cfg=cfg,
                                     max_iterations=max_iter, tb=tbl,
                                     flags=flags))
            fn = _ec.load_or_compile(
                jl, (sub,), key_parts=("latency", Bl, tbl, flags, dims,
                                       max_iter, repr(cfg)))
            walls = []
            _ = np.asarray(fn(sub).cost)
            for _i in range(15):
                t0 = time.time()
                _ = np.asarray(fn(sub).cost)
                walls.append(time.time() - t0)
            latency_fields[f"latency_p50_ms_b{Bl}"] = round(
                1e3 * float(np.median(walls)), 1)

    # frontend-sourced distribution with the same compiled solver (source
    # "both"; skipped when the headline itself is frontend-sourced)
    frontend_fields = {}
    if source == "both":
        # frontend fixture capped at 1024 lanes (generation is ~3 min
        # host-side per 1024; the distribution, not the batch wall, is
        # what this line validates)
        Bf = min(B, 1024)
        solve_f = (solve if Bf == B else solver.make_solver(
            cfg, dims, max_iterations=max_iter, engine=engine,
            flags=hl_flags))
        fb = jax.tree.map(jnp.asarray,
                          _frontend_batch_cached(dims, Bf, seed=7))
        res_f = solve_f(fb, w)
        _ = np.asarray(res_f.cost)
        t1 = time.time()
        res_f = solve_f(fb, w)
        cost_f = np.asarray(res_f.cost)
        wall_f = time.time() - t1
        frontend_fields = {
            "frontend_solves_per_s": round(Bf / wall_f, 1),
            "frontend_success_rate": round(
                float(np.asarray(res_f.success.astype(jnp.int32)).mean()), 4),
            "frontend_cost_p50": round(float(np.nanmedian(cost_f)), 1),
            "frontend_iters_p50": int(np.median(np.asarray(res_f.n_iters))),
        }

    # multi-gear (S=2 reverse-park) throughput from real front-end
    # geometry — the reference's flagship workload (traj_manager.cpp:160-238
    # parking = gear reversals). Classes are PER-SEGMENT piece classes
    # (Dims.Ns) — the reference's adaptive piecing (max(round(dur/1s), 2),
    # traj_manager.cpp:543) under static shapes. The benched ladder covers
    # >= 95% of the two-gear front-end distribution
    # (tools/s2_distribution.py); the line is the admission-weighted
    # aggregate: throughput = 1 / sum(share_c / rate_c), success =
    # sum(share_c * succ_c) / coverage. ONE engine configuration across
    # classes (vt_scale="auto" resolves per slot, so short reversal
    # segments keep unpreconditioned time rows).
    multigear_fields = {}
    if os.environ.get("BENCH_MULTIGEAR", "1") == "1" and source != "frontend":
        pool, n_s2 = _multigear_pool_cached(
            int(os.environ.get("BENCH_MG_POOL", "800")), seed=11)
        B2 = 256
        per_class = {}
        for ns in MG_BENCHED:
            if ns not in pool or pool[ns].ini_state.shape[0] < 8:
                continue
            dims2 = _mg_dims(ns)
            fb2 = jax.tree.map(jnp.asarray, _tile_to(pool[ns], B2))
            solve2 = solver.make_solver(
                cfg, dims2, max_iterations=max_iter,
                engine=os.environ.get("BENCH_MULTIGEAR_ENGINE", "fused"),
                flags=flags)
            res2 = solve2(fb2, w)
            _ = np.asarray(res2.cost)
            t2 = time.time()
            res2 = solve2(fb2, w)
            cost2 = np.asarray(res2.cost)
            wall2 = time.time() - t2
            # deployment semantics on residual failures: the reference
            # retries hard instances / keeps the previous trajectory
            # (traj_manager.cpp:90-103, traj_server_ros.cpp:166-186); the
            # batched analogue is the init_T retry ladder — failed lanes
            # re-solve with rescaled initial durations on the SAME
            # compiled class (pad_to=B2)
            res2r = solver.solve_with_retry(
                solve2, fb2, w,
                time_scales=(1.6, 0.7, 2.5, 1.25, 0.45, 3.5, 2.0, 0.55,
                             5.0, 1.1),
                pad_to=B2)
            share = pool[ns].ini_state.shape[0] / max(n_s2, 1)
            per_class[ns] = dict(
                rate=B2 / wall2,
                succ=float(np.asarray(res2r.success).mean()),
                succ_direct=float(np.asarray(
                    res2.success.astype(jnp.int32)).mean()),
                cost=float(np.nanmedian(np.asarray(res2r.cost))),
                share=share)
        if per_class:
            cov = sum(v["share"] for v in per_class.values())
            agg_rate = cov / sum(v["share"] / v["rate"]
                                 for v in per_class.values())
            agg_succ = sum(v["share"] * v["succ"]
                           for v in per_class.values()) / cov
            lead = per_class.get(MG_BENCHED[0])
            multigear_fields = {
                "multigear_solves_per_s": round(agg_rate, 1),
                "multigear_success_rate": round(agg_succ, 4),
                "multigear_coverage": round(cov, 4),
                "multigear_classes": len(per_class),
                "multigear_batch": B2,
                "multigear_cost_p50": round(lead["cost"], 1) if lead
                else None,
                "multigear_success_direct": round(
                    sum(v["share"] * v["succ_direct"]
                        for v in per_class.values()) / cov, 4),
                "multigear_per_class": {
                    "-".join(str(n) for n in ns): {
                        "rate": round(v["rate"], 1),
                        "succ": round(v["succ"], 4),
                        "succ_direct": round(v["succ_direct"], 4),
                        "share": round(v["share"], 4)}
                    for ns, v in per_class.items()},
            }

    print(json.dumps({
        "metric": "traj_optimizations_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "batch": B,
        "batch_wall_ms": round(best * 1e3, 1),
        "success_rate": round(float(succ.mean()), 4),
        "iters_p50": int(np.median(iters)),
        "cost_p50": round(float(np.nanmedian(cost)), 1),
        "warm_replans_per_s": round(B / warm_wall, 1),
        "warm_success_rate": round(float(succ_w.mean()), 4),
        "warm_cost_p50": round(float(np.nanmedian(cost_w)), 1),
        "compile_s": round(compile_s, 1),
        "engine": engine,
        "source": source,
        "adaptive_step": "1" if flags.adaptive_step else "0",
        "phases": [list(p_) for p_ in hl_flags.phases],
        "exec_cache": os.environ.get("DFTPAV_EXEC_CACHE", "1"),
        **perf_fields,
        **gated_fields,
        **latency_fields,
        **frontend_fields,
        **multigear_fields,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
