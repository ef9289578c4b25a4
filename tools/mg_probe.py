"""Probe EngineFlags variants on the multigear (8,2) reverse-park class
(pooled front-end plans, B=256) to find the configuration that restores
success without forking bench semantics."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses as dc

    import bench
    from dftpav_tpu import solver
    from dftpav_tpu.config import EngineFlags, PlannerConfig
    from dftpav_tpu.types import weights_from_config

    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    pool, n_s2 = bench._multigear_pool_cached(800, seed=11)
    classes = [tuple(int(v) for v in c.split("-"))
               for c in (sys.argv[2].split(",") if len(sys.argv) > 2
                         else ["8-2"])]
    tuned = EngineFlags.tuned()
    variants = {
        "tuned": tuned,
        "x3only": EngineFlags(mxu="x3"),
        "x3vt": EngineFlags(mxu="x3", vt_scale="auto"),
        "lo02": dc.replace(tuned, adaptive_step_lo=0.2,
                           adaptive_step_mult=2.0),
        "novt": dc.replace(tuned, vt_scale=1.0),
    }
    names = (sys.argv[1].split(",") if len(sys.argv) > 1
             else list(variants))
    B2 = 256
    for ns in classes:
        dims2 = bench._mg_dims(ns)
        fb2 = jax.tree.map(jnp.asarray, bench._tile_to(pool[ns], B2))
        for name in names:
            fl = variants[name]
            solve2 = solver.make_solver(cfg, dims2, max_iterations=150,
                                        engine="fused", flags=fl)
            res2 = solve2(fb2, w)
            _ = np.asarray(res2.cost)
            t0 = time.time()
            res2 = solve2(fb2, w)
            cost2 = np.asarray(res2.cost)
            wall = time.time() - t0
            succ = np.asarray(res2.success.astype(jnp.int32)).mean()
            print(f"{ns} {name}: {B2/wall:.1f}/s succ={succ:.4f} "
                  f"cost_p50={np.nanmedian(cost2):.1f} "
                  f"iters_p50={int(np.median(np.asarray(res2.n_iters)))}",
                  flush=True)


if __name__ == "__main__":
    main()
