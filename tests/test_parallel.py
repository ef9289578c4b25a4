"""Sharded batch solve over the virtual 8-device CPU mesh (config[5])."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from dftpav_tpu import parallel, scenarios, solver
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.types import Dims, weights_from_config

CFG = PlannerConfig()


def test_sharded_solver_matches_local():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    dims = Dims(S=1, N=6, K=8, Kdes=12, H=4, O=0, Po=8)
    B = 16
    scens = scenarios.batch_scenarios(dims, B, seed=5, dtype=np.float64)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    batch = jax.tree.map(jnp.asarray, scens)

    mesh = parallel.make_mesh(jax.devices()[:8])
    fn = parallel.make_sharded_solver(mesh, CFG, dims, max_iterations=120)
    res_sh, metrics = fn(batch, w)

    local = solver.make_solver(CFG, dims, max_iterations=120)
    res_lo = local(batch, w)

    # identical results lane-by-lane (sharding is pure data parallelism)
    np.testing.assert_allclose(np.asarray(res_sh.cost), np.asarray(res_lo.cost),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res_sh.coeffs),
                               np.asarray(res_lo.coeffs), rtol=1e-9, atol=1e-9)
    # psum'd metrics
    assert float(metrics["n_total"]) == B
    assert float(metrics["n_solved"]) == np.asarray(res_lo.success).sum()
    assert float(metrics["iters_sum"]) == np.asarray(res_lo.n_iters).sum()


def test_sharded_solver_device_placement():
    dims = Dims(S=1, N=4, K=4, Kdes=4, H=4, O=0, Po=4)
    B = 8
    scens = scenarios.batch_scenarios(dims, B, seed=1, dtype=np.float64)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    mesh = parallel.make_mesh(jax.devices()[:8])
    fn = parallel.make_sharded_solver(mesh, CFG, dims, max_iterations=10)
    res, _ = fn(jax.tree.map(jnp.asarray, scens), w)
    # result stays sharded across all 8 devices
    assert len(res.cost.sharding.device_set) == 8
