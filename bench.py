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

# Solver acceleration envs (see PERF.md "Adaptive line-search" +
# "Time-variable preconditioning"):
#  - adaptive warm step: next line search starts from the lane's previous
#    accepted step x1.2 (no floor) instead of the constant 1.0;
#  - DFTPAV_VT_SCALE=0.25: the virtual-time rows are solved at 4x scale,
#    rebalancing their gradient against the meter-scale waypoints.
# Measured together at B=1024: 5,306 solves/s, success 1.0, cost p50
# +0.23% vs bminor (vs 4,134 at +0.5% with neither). Env-gated (not the
# library default) so lbfgs.hpp trial-sequence parity tests keep exact
# semantics; the executable cache keys on these.
os.environ.setdefault("DFTPAV_ADAPTIVE_STEP", "1")
os.environ.setdefault("DFTPAV_ADAPTIVE_STEP_LO", "0.001")
os.environ.setdefault("DFTPAV_ADAPTIVE_STEP_MULT", "1.2")
os.environ.setdefault("DFTPAV_VT_SCALE", "0.25")


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


def main():
    from dftpav_tpu import scenarios, solver
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config

    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    B = int(os.environ.get("BENCH_BATCH", "1024"))
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
    # 4,620 solves/s at B=1024/150 iters with mxu=x3 + adaptive step,
    # success 0.999, cost p50 within 2% of bminor — see PERF.md);
    # override with BENCH_ENGINE / --engine
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
                               engine=engine)
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

    # warm-started receding-horizon replans (the reference's actual 20 Hz
    # workload, traj_server_ros.cpp:406-501): iterate counts collapse ~3x
    # and a replan budget of 50 iterations matches the reference's
    # Budget-bounded replan semantics (traj_server_ros.cpp:474). The stream
    # runs the SAME engine as the headline (the warm guess rides in the
    # rewritten scenario, so the fused kernel warm-starts too).
    from dftpav_tpu import replan as replan_mod
    rp = replan_mod.make_replanner(cfg, dims, dt_shift=0.1,
                                   max_iterations=50, engine=engine)
    b1, r1 = rp(batch, res, w)
    _ = np.asarray(r1.cost)
    t0 = time.time()
    b2, r2 = rp(b1, r1, w)
    cost_w = np.asarray(r2.cost)
    warm_wall = time.time() - t0
    succ_w = np.asarray(r2.success.astype(jnp.int32))

    # frontend-sourced distribution with the same compiled solver (source
    # "both"; skipped when the headline itself is frontend-sourced)
    frontend_fields = {}
    if source == "both":
        fb = jax.tree.map(jnp.asarray, _frontend_batch_cached(dims, B, seed=7))
        res_f = solve(fb, w)
        _ = np.asarray(res_f.cost)
        t1 = time.time()
        res_f = solve(fb, w)
        cost_f = np.asarray(res_f.cost)
        wall_f = time.time() - t1
        frontend_fields = {
            "frontend_solves_per_s": round(B / wall_f, 1),
            "frontend_success_rate": round(
                float(np.asarray(res_f.success.astype(jnp.int32)).mean()), 4),
            "frontend_cost_p50": round(float(np.nanmedian(cost_f)), 1),
            "frontend_iters_p50": int(np.median(np.asarray(res_f.n_iters))),
        }

    # multi-gear (S=2 reverse-park class) throughput from real front-end
    # geometry — the reference's flagship workload (traj_manager.cpp:160-238
    # parking = gear reversals). The class is the PER-SEGMENT piece class
    # (8, 2): long approach on 8 pieces, short reversal on 2 — exactly the
    # reference's adaptive piecing (max(round(dur/1s), 2),
    # traj_manager.cpp:543) under static shapes (Dims.Ns); scenarios are
    # admitted when their natural quantized counts match, which is the
    # dominant (~50%) class of the S=2 front-end distribution.
    multigear_fields = {}
    if os.environ.get("BENCH_MULTIGEAR", "1") == "1" and source != "frontend":
        dims2 = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=2, Po=8, Ns=(8, 2))
        B2 = min(B, 512)
        fb2 = jax.tree.map(jnp.asarray,
                           _frontend_batch_cached(dims2, B2, seed=11))
        # the reverse-park class keeps the conservative solver envs: the
        # headline's vt preconditioning + floorless warm step cost it 3%
        # success (0.957 -> 0.924 measured); envs are read at trace time,
        # so scoping them here gives this class its own compiled config
        mg_env = {"DFTPAV_VT_SCALE": "1.0", "DFTPAV_ADAPTIVE_STEP_LO": "0.2"}
        saved = {k: os.environ.get(k) for k in mg_env}
        os.environ.update(mg_env)
        try:
            solve2 = solver.make_solver(
                cfg, dims2, max_iterations=max_iter,
                engine=os.environ.get("BENCH_MULTIGEAR_ENGINE", "fused"))
            res2 = solve2(fb2, w)
            _ = np.asarray(res2.cost)
            t2 = time.time()
            res2 = solve2(fb2, w)
            cost2 = np.asarray(res2.cost)
            wall2 = time.time() - t2
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        multigear_fields = {
            "multigear_solves_per_s": round(B2 / wall2, 1),
            "multigear_success_rate": round(float(np.asarray(
                res2.success.astype(jnp.int32)).mean()), 4),
            "multigear_cost_p50": round(float(np.nanmedian(cost2)), 1),
            "multigear_batch": B2,
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
        "adaptive_step": os.environ.get("DFTPAV_ADAPTIVE_STEP", "0"),
        "exec_cache": os.environ.get("DFTPAV_EXEC_CACHE", "1"),
        **frontend_fields,
        **multigear_fields,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
