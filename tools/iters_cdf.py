"""Measure the per-lane iteration/eval distribution of the headline fused
solve on the real chip (uses the round-4 exec cache — bench envs set to the
headline configuration). Prints the n_iters CDF used to size the two-phase
lane-compaction design (VERDICT r4 task 1).
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
    B = 1024
    scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)
    solve = solver.make_solver(cfg, dims, max_iterations=150, engine="fused",
                               flags=EngineFlags.from_env(
                                   EngineFlags.tuned()))

    t0 = time.time()
    res = solve(batch, w)
    cost = np.asarray(res.cost)
    print(f"compile+first: {time.time() - t0:.1f} s", flush=True)
    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        res = solve(batch, w)
        cost = np.asarray(res.cost)
        best = min(best, time.time() - t1)
    iters = np.asarray(res.n_iters)
    succ = np.asarray(res.success.astype(jnp.int32))
    print(f"wall={best*1e3:.1f} ms  solves/s={B/best:.1f}  "
          f"success={succ.mean():.4f}  cost_p50={np.nanmedian(cost):.1f}")
    qs = [10, 25, 50, 75, 90, 95, 99, 100]
    print("iters percentiles:",
          {q: int(np.percentile(iters, q)) for q in qs})
    # fraction of lanes still unconverged past each candidate phase-1 budget
    for b in (40, 50, 60, 70, 80, 90, 100, 110, 120, 130, 140, 149):
        frac = float((iters >= b).mean())
        print(f"  frac lanes with iters >= {b}: {frac:.3f}")
    # per-tile max iters (what each 128-lane tile actually pays)
    tm = iters.reshape(-1, 128).max(axis=1)
    print("per-tile max iters:", tm.tolist())


if __name__ == "__main__":
    main()
