"""Hardware (non-interpret) smoke test for the whole-solve Pallas kernel.

The interpret-mode tests in test_megakernel.py validate semantics but not
Mosaic lowering, VMEM fit, or speed; this file compiles and runs the REAL
kernel. It is skipped under the CPU test environment (tests/conftest.py
re-execs the suite with JAX_PLATFORMS=cpu) and runs when invoked in the
TPU env:

    DFTPAV_HW_TESTS=1 python -m pytest tests/test_fused_hw.py -q --no-header

(plain `python -m pytest` keeps working everywhere — the skip guard keys
on the resolved backend, not the env var; the var only stops conftest's
CPU re-exec.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "none"


requires_tpu = pytest.mark.skipif(
    _backend() not in ("tpu", "axon"),
    reason="real-TPU smoke (run via DFTPAV_HW_TESTS=1 in the TPU env)")


def _bench_fixture(B):
    from dftpav_tpu import scenarios
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.types import Dims, weights_from_config

    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    return cfg, dims, jax.tree.map(jnp.asarray, scens), w


@requires_tpu
def test_fused_kernel_hardware_smoke():
    """Gates the PUBLISHED program: bench batch size (B=1024 — VMEM fit and
    tile scheduling are size-dependent) and the bench engine configuration
    (EngineFlags.tuned(), exactly what bench.py passes)."""
    from dftpav_tpu import solver
    from dftpav_tpu.config import EngineFlags

    B = 1024
    cfg, dims, batch, w = _bench_fixture(B)

    # 150-iteration budget: the engines only share a basin at convergence
    # (intermediate iterates diverge between float paths)
    fused = solver.make_solver(cfg, dims, max_iterations=150,
                               engine="fused", flags=EngineFlags.tuned())
    res = fused(batch, w)
    cost = np.asarray(res.cost)            # host readback = real sync
    succ = np.asarray(res.success.astype(jnp.int32))

    ref = solver.make_solver(cfg, dims, max_iterations=150,
                             engine="bminor")
    res_ref = ref(batch, w)
    cost_ref = np.asarray(res_ref.cost)

    assert succ.mean() >= 0.99
    # same basin as the golden-tested engine on the same fixtures
    assert abs(np.median(cost) - np.median(cost_ref)) \
        <= 0.02 * np.median(cost_ref)


@requires_tpu
def test_fused_kernel_shard_map_single_chip():
    """The flagship kernel composes with the jax.sharding mesh path: run
    solve_batch_fused under shard_map on a 1-device mesh (the scaling
    harness's exact wrapping, parallel.make_sharded_solver engine='fused')
    and require the same quality gates."""
    from dftpav_tpu import parallel, solver
    from dftpav_tpu.types import weights_from_config

    B = 256
    cfg, dims, batch, w = _bench_fixture(B)
    mesh = parallel.make_mesh(jax.devices()[:1])
    fn = parallel.make_sharded_solver(mesh, cfg, dims, max_iterations=150,
                                      engine="fused", weights=w)
    res, metrics = fn(batch)
    succ = float(np.asarray(metrics["n_solved"]))
    assert float(np.asarray(metrics["n_total"])) == B
    assert succ / B >= 0.99
