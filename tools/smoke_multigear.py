"""Smoke the multigear reverse-park class (per-segment (8, 2) piecing)
on the current backend.

Usage: python tools/smoke_multigear.py [engine] [B] [MI]
Uses the bench's cached front-end fixture.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dftpav_tpu import solver
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.types import Dims, Scenario, weights_from_config

    engine = sys.argv[1] if len(sys.argv) > 1 else "fused"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    mi = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    cfg = PlannerConfig()
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=2, Po=8, Ns=(8, 2))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache",
        "frontend_b512_s11_S2N8K1632O2Ns8-2.npz")
    with np.load(path) as z:
        scens = Scenario(**{k: z[k][:B] for k in z.files})
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)
    solve = solver.make_solver(cfg, dims, max_iterations=mi, engine=engine)

    t0 = time.time()
    res = solve(batch, w)
    c = np.asarray(res.cost)
    print(f"compile+first {time.time()-t0:.1f} s", flush=True)
    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        res = solve(batch, w)
        c = np.asarray(res.cost)
        best = min(best, time.time() - t1)
    su = np.asarray(res.success.astype(jnp.int32))
    print(f"{engine} S=2 Ns=(8,2) B={B} MI={mi}: wall={best*1e3:.1f}ms "
          f"solves/s={B/best:.1f}")
    print(f"success={su.mean():.4f} cost_p50={np.median(c):.1f}")


if __name__ == "__main__":
    main()
