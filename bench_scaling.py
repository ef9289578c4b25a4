"""Scaling harness: sharded batched solves over a device mesh.

Measures weak-scaling efficiency of the scenario-data-parallel solver
(parallel.make_sharded_solver) at 1..D devices — BASELINE.json configs[5]
("measured solves/s efficiency at 1 chip, 1 host, N hosts"). On a machine
without a multi-chip slice, run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py --batch-per-device 64

Per-scenario work is chip-local; the only collective is the psum of
convergence metrics, so efficiency should be ~1.0 up to the ICI/DCN limits.
Prints one JSON line per mesh size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--max-iter", type=int, default=60)
    ap.add_argument("--mesh-sizes", type=str, default="")
    ap.add_argument("--engine", type=str, default="bminor",
                    help="per-shard solver engine (bminor/rounds/fused; "
                    "fused needs a TPU backend and batch-per-device % 128"
                    " == 0)")
    args = ap.parse_args(argv)

    from dftpav_tpu import parallel, scenarios
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config

    devs = jax.devices()
    sizes = ([int(s) for s in args.mesh_sizes.split(",") if s]
             or sorted({1, max(1, len(devs) // 2), len(devs)}))
    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)

    results = []
    for d in sizes:
        if d > len(devs):
            continue
        B = args.batch_per_device * d
        scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                          n_obstacles=2)
        batch = jax.tree.map(jnp.asarray, scens)
        mesh = parallel.make_mesh(devs[:d])
        fn = parallel.make_sharded_solver(mesh, cfg, dims,
                                          max_iterations=args.max_iter,
                                          engine=args.engine,
                                          weights=w)
        res, metrics = fn(batch, w)
        _ = float(np.asarray(metrics["n_solved"]))  # sync / compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            res, metrics = fn(batch, w)
            n_ok = float(np.asarray(metrics["n_solved"]))
            best = min(best, time.time() - t0)
        line = dict(devices=d, batch=B, wall_s=round(best, 3),
                    solves_per_s=round(B / best, 1),
                    success_rate=round(n_ok / B, 4), engine=args.engine)
        results.append(line)
        print(json.dumps(line))

    if results:
        base = results[0]["solves_per_s"] / results[0]["devices"]
        for r in results:
            r["weak_scaling_efficiency"] = round(
                (r["solves_per_s"] / r["devices"]) / base, 3)
        print(json.dumps(dict(
            metric="weak_scaling_efficiency",
            per_mesh={str(r["devices"]): r["weak_scaling_efficiency"]
                      for r in results},
            backend=jax.default_backend(),
        )))
    return results


if __name__ == "__main__":
    main()
