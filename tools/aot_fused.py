"""Locally AOT-compile the fused kernel for TPU (chipless, via the local
libtpu) to debug Mosaic lowering without the remote relay.

Usage: JAX_PLATFORMS=cpu PYTHONPATH= JAX_TRACEBACK_FILTERING=off \
           python tools/aot_fused.py [B] [MAX_ITER] [TB]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.sharding as shd
import numpy as np
from jax.experimental import topologies


def main():
    from dftpav_tpu import scenarios
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.ops.pallas_solve import solve_batch_fused
    from dftpav_tpu.types import Dims, weights_from_config

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    tb = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    N = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    mxu = sys.argv[6] if len(sys.argv) > 6 else "float32"
    ns = (tuple(int(v) for v in sys.argv[7].split(","))
          if len(sys.argv) > 7 else None)

    cfg = PlannerConfig()
    dims = Dims(S=S, N=N, K=16, Kdes=32, H=4, O=2, Po=8, Ns=ns)
    if S == 1:
        scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                          n_obstacles=2)
    else:
        scens = scenarios.stack_scenarios(
            [jax.tree.map(lambda a: np.asarray(a, np.float32)
                          if np.asarray(a).dtype == np.float64 else a,
                          scenarios.gear_scenario(dims))] * B)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2x1")
    mesh = shd.Mesh(np.array(topo.devices[:1]), ("d",))
    repl = shd.NamedSharding(mesh, shd.PartitionSpec())

    def absify(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype,
                                           sharding=repl), tree)

    from dftpav_tpu.config import EngineFlags

    base = EngineFlags(mxu={"float32": "f32", "x3": "x3",
                            "bfloat16": "bf16"}[mxu])
    flags = EngineFlags.from_env(base)   # DFTPAV_* env overrides (phases..)
    print("flags:", flags)
    fn = jax.jit(lambda b: solve_batch_fused(
        b, w, dims=dims, cfg=cfg, max_iterations=max_iter, tb=tb,
        flags=flags))
    import time
    t0 = time.time()
    lowered = fn.lower(absify(scens))
    print(f"lowered in {time.time()-t0:.1f}s", flush=True)
    t1 = time.time()
    compiled = lowered.compile()
    print(f"AOT TPU compile OK in {time.time()-t1:.1f}s")
    print(compiled.memory_analysis())


if __name__ == "__main__":
    main()
