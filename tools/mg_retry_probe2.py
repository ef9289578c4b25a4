import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import bench
from dftpav_tpu import solver
from dftpav_tpu.config import EngineFlags, PlannerConfig
from dftpav_tpu.types import weights_from_config
cfg = PlannerConfig(); w = weights_from_config(cfg.opt, dtype=jnp.float32)
pool, _ = bench._multigear_pool_cached(800, seed=11)
tuned = EngineFlags.tuned(); B2 = 256
ns = (8, 2)
dims2 = bench._mg_dims(ns)
fb2 = jax.tree.map(jnp.asarray, bench._tile_to(pool[ns], B2))
solve2 = solver.make_solver(cfg, dims2, max_iterations=150, engine="fused", flags=tuned)
r = solve2(fb2, w); _ = np.asarray(r.cost)
for scales in [(1.6, 0.7, 2.5, 1.25, 0.45, 3.5),
               (1.6, 0.7, 2.5, 1.25, 0.45, 3.5, 2.0, 0.55, 5.0, 1.1)]:
    t0 = time.time()
    rr = solver.solve_with_retry(solve2, fb2, w, time_scales=scales, pad_to=B2)
    wall = time.time() - t0
    print(f"{ns} rungs={len(scales)}: succ={np.asarray(rr.success).mean():.4f} "
          f"cost_p50={np.nanmedian(np.asarray(rr.cost)):.1f} wall={wall:.1f}s", flush=True)
