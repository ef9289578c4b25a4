"""Hardware smoke test for the whole-solve Pallas kernel (solve_batch_fused).

Runs on whatever backend JAX selects (the axon TPU by default). Prints
compile time, wall time, success/cost stats. Usage:

    python tools/smoke_fused.py [B] [MAX_ITER] [TB]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dftpav_tpu import scenarios
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.ops.pallas_solve import solve_batch_fused
    from dftpav_tpu.types import Dims, weights_from_config

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    tb = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)

    solve = jax.jit(lambda b: solve_batch_fused(
        b, w, dims=dims, cfg=cfg, max_iterations=max_iter, tb=tb))

    t0 = time.time()
    res = solve(batch)
    cost = np.asarray(res.cost)
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f} s", flush=True)

    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        res = solve(batch)
        cost = np.asarray(res.cost)
        best = min(best, time.time() - t1)

    succ = np.asarray(res.success.astype(jnp.int32))
    iters = np.asarray(res.n_iters)
    print(f"B={B} tb={tb} max_iter={max_iter} device={jax.devices()[0]}")
    print(f"wall={best*1e3:.1f} ms  solves/s={B/best:.1f}")
    print(f"success={succ.mean():.4f}  cost_p50={np.nanmedian(cost):.1f}  "
          f"iters_p50={int(np.median(iters))}  iters_max={int(iters.max())}")


if __name__ == "__main__":
    main()
