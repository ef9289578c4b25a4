"""Worker process for tests/test_multihost.py.

Each of N processes owns 4 virtual CPU devices; together they form one
8-device global mesh spanning a (simulated) DCN boundary. The worker builds
its process-local shard of a global scenario batch, assembles global arrays
with jax.make_array_from_process_local_data, runs the sharded solver
(parallel.make_sharded_solver — jit(shard_map) over the global mesh, psum'd
metrics), and dumps the replicated metrics + its addressable results to JSON.

Usage: python _multihost_worker.py <proc_id> <n_procs> <coord_port> <out.json>
"""

import json
import os
import sys

PROC_ID = int(sys.argv[1])
N_PROCS = int(sys.argv[2])
PORT = sys.argv[3]
OUT = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                           num_processes=N_PROCS, process_id=PROC_ID)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dftpav_tpu import parallel, scenarios  # noqa: E402
from dftpav_tpu.config import PlannerConfig  # noqa: E402
from dftpav_tpu.types import Dims, weights_from_config  # noqa: E402


def main():
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * N_PROCS and n_local == 4, (n_global, n_local)

    dims = Dims(S=1, N=4, K=4, Kdes=4, H=4, O=1, Po=4)
    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, jnp.float64)
    B = 4 * n_global  # 4 scenarios per device

    # every process generates the same global batch (same seed), then keeps
    # only its contiguous slice — the data-ingest pattern of a real multi-host
    # scenario stream
    batch = scenarios.batch_scenarios(dims, B, seed=0, n_obstacles=1)
    mesh = parallel.make_mesh()  # all global devices
    lo, hi = PROC_ID * B // N_PROCS, (PROC_ID + 1) * B // N_PROCS

    def to_global(a):
        arr = np.asarray(a)
        sh = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(sh, arr[lo:hi],
                                                      arr.shape)

    gbatch = jax.tree.map(to_global, batch)
    fn = parallel.make_sharded_solver(mesh, cfg, dims, max_iterations=8)
    res, metrics = fn(gbatch, w)

    stats = {k: float(v) for k, v in metrics.items()}
    local_costs = sorted(
        float(np.asarray(s.data).ravel()[i])
        for s in res.cost.addressable_shards
        for i in range(s.data.size))
    with open(OUT, "w") as f:
        json.dump({"proc": PROC_ID, "n_global_devices": n_global,
                   "metrics": stats, "local_costs": local_costs}, f)
    print(f"worker {PROC_ID} ok: {stats}")


main()
