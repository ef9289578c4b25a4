"""Measure the multi-phase lane-compaction ladder on the real chip.

Sweeps EngineFlags.phases configurations on the headline fixture (B=1024,
150-iteration budget, tuned stack) and prints solves/s + quality gates per
configuration. Serialized-executable cache makes re-runs cheap.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dftpav_tpu import scenarios, solver
    from dftpav_tpu.config import EngineFlags, PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config

    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    B = int(os.environ.get("SWEEP_B", "1024"))
    scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)

    tuned = EngineFlags.tuned()
    import dataclasses as dc

    configs = [
        ("single", tuned),
        ("p2", dc.replace(tuned, phases=((0.625, 78),))),
        ("p3", dc.replace(tuned, phases=((0.625, 40), (0.25, 40)))),
        ("p4", dc.replace(tuned, phases=((0.75, 30), (0.375, 30),
                                         (0.125, 30)))),
    ]
    if len(sys.argv) > 1:
        # either named configs ("p2,p4") or explicit schedules
        # ("0.75:20+0.5:20+0.25:20+0.125:40,0.625:78")
        sel = []
        for spec in sys.argv[1].split(","):
            named = [c for c in configs if c[0] == spec]
            if named:
                sel.append(named[0])
            else:
                ph = tuple((float(f), int(it)) for f, it in
                           (e.split(":") for e in spec.split("+")))
                sel.append((spec, dc.replace(tuned, phases=ph)))
        configs = sel

    for name, fl in configs:
        solve = solver.make_solver(cfg, dims, max_iterations=150,
                                   engine="fused", flags=fl)
        t0 = time.time()
        res = solve(batch, w)
        cost = np.asarray(res.cost)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t1 = time.time()
            res = solve(batch, w)
            cost = np.asarray(res.cost)
            best = min(best, time.time() - t1)
        succ = np.asarray(res.success.astype(jnp.int32))
        iters = np.asarray(res.n_iters)
        print(f"{name}: {B/best:.1f} solves/s wall={best*1e3:.1f}ms "
              f"success={succ.mean():.4f} cost_p50={np.nanmedian(cost):.1f} "
              f"iters p50/p90/p99="
              f"{int(np.percentile(iters,50))}/"
              f"{int(np.percentile(iters,90))}/"
              f"{int(np.percentile(iters,99))} "
              f"compile={compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()
