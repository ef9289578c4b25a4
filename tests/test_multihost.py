"""Multi-host (DCN) data parallelism: two jax.distributed CPU processes, one
global 8-device mesh, sharded solver + psum'd metrics (BASELINE.md configs[5];
SURVEY.md §4 "multi-process simulation on CPU").

The test spawns two worker processes (tests/_multihost_worker.py), each with
4 virtual CPU devices, forming an 8-device global mesh across the simulated
host boundary. Both run the same jit(shard_map) solve; the psum'd metrics
must agree bit-for-bit across processes and match a single-process run of the
identical problem.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["n_global_devices"] == 8 for r in results)

    # psum'd metrics are replicated: both processes must see identical values
    m0, m1 = results[0]["metrics"], results[1]["metrics"]
    assert m0 == m1, (m0, m1)
    assert m0["n_total"] == 32.0
    assert m0["n_solved"] >= 1.0

    # the two processes' addressable shards partition the batch: merged cost
    # multiset must match a single-process solve of the same global problem
    merged = sorted(results[0]["local_costs"] + results[1]["local_costs"])
    assert len(merged) == 32

    from dftpav_tpu import parallel, scenarios
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config
    import jax
    import jax.numpy as jnp

    dims = Dims(S=1, N=4, K=4, Kdes=4, H=4, O=1, Po=4)
    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, jnp.float64)
    batch = scenarios.batch_scenarios(dims, 32, seed=0, n_obstacles=1)
    batch = jax.tree.map(jnp.asarray, batch)
    mesh = parallel.make_mesh()
    fn = parallel.make_sharded_solver(mesh, cfg, dims, max_iterations=8)
    res, metrics = fn(batch, w)
    ref = np.sort(np.asarray(res.cost))
    np.testing.assert_allclose(merged, ref, rtol=1e-9)
    assert float(metrics["n_solved"]) == m0["n_solved"]
