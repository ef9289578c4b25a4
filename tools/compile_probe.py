"""Compile-time probe: trace + lower + compile the solver engines on CPU and
report trace time, StableHLO op counts, and XLA compile wall time.

Usage: JAX_PLATFORMS=cpu PYTHONPATH= python tools/compile_probe.py [engine] [B] [MI]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dftpav_tpu import scenarios, solver
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config

    engine = sys.argv[1] if len(sys.argv) > 1 else "bminor"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)
    solve = solver.make_solver(cfg, dims, max_iterations=max_iter, jit=True,
                               engine=engine)

    t0 = time.time()
    lowered = solve.lower(batch, w)
    t_trace = time.time() - t0
    txt = lowered.as_text()
    n_lines = txt.count("\n")
    t1 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t1
    print(f"engine={engine} B={B} MI={max_iter} backend={jax.default_backend()}")
    print(f"trace+lower: {t_trace:.1f} s   stablehlo_lines={n_lines}")
    print(f"xla_compile: {t_compile:.1f} s")
    try:
        mem = compiled.memory_analysis()
        print(f"temp={mem.temp_size_in_bytes/2**30:.2f} GiB "
              f"argout={mem.output_size_in_bytes/2**30:.2f} GiB")
    except Exception:
        pass


if __name__ == "__main__":
    main()
