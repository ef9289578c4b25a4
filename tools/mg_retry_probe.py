"""Probe the retry ladder + bigger budgets on the hard multigear classes."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    import bench
    from dftpav_tpu import solver
    from dftpav_tpu.config import EngineFlags, PlannerConfig
    from dftpav_tpu.types import weights_from_config
    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    pool, _ = bench._multigear_pool_cached(800, seed=11)
    tuned = EngineFlags.tuned()
    B2 = 256
    for ns in ((8, 2), (2, 8)):
        dims2 = bench._mg_dims(ns)
        fb2 = jax.tree.map(jnp.asarray, bench._tile_to(pool[ns], B2))
        solve2 = solver.make_solver(cfg, dims2, max_iterations=150,
                                    engine="fused", flags=tuned)
        r = solve2(fb2, w); _ = np.asarray(r.cost)   # warm
        t0 = time.time()
        rr = solver.solve_with_retry(solve2, fb2, w,
                                     time_scales=(1.6, 0.7, 2.5),
                                     pad_to=B2)
        wall = time.time() - t0
        succ = np.asarray(rr.success).mean()
        print(f"{ns} retry150: {B2/wall:.1f}/s succ={succ:.4f} "
              f"cost_p50={np.nanmedian(np.asarray(rr.cost)):.1f}", flush=True)
    for ns in ((8, 2), (2, 8)):
        dims2 = bench._mg_dims(ns)
        fb2 = jax.tree.map(jnp.asarray, bench._tile_to(pool[ns], B2))
        solve3 = solver.make_solver(cfg, dims2, max_iterations=400,
                                    engine="fused", flags=tuned)
        r = solve3(fb2, w); _ = np.asarray(r.cost)
        t0 = time.time()
        r = solve3(fb2, w); c = np.asarray(r.cost)
        wall = time.time() - t0
        succ = np.asarray(r.success.astype(jnp.int32)).mean()
        print(f"{ns} mi400: {B2/wall:.1f}/s succ={succ:.4f} "
              f"cost_p50={np.nanmedian(c):.1f} "
              f"iters_p50={int(np.median(np.asarray(r.n_iters)))}", flush=True)
        t0 = time.time()
        rr = solver.solve_with_retry(solve3, fb2, w,
                                     time_scales=(1.6, 0.7, 2.5), pad_to=B2)
        wall = time.time() - t0
        succ = np.asarray(rr.success).mean()
        print(f"{ns} retry400: {B2/wall:.1f}/s succ={succ:.4f} "
              f"cost_p50={np.nanmedian(np.asarray(rr.cost)):.1f}", flush=True)

if __name__ == "__main__":
    main()
