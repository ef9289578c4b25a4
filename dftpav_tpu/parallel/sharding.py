"""Scenario data-parallel solver over a jax.sharding.Mesh.

Design (SURVEY.md §2.4): per-scenario solver state stays chip-local (no model
sharding — problems are KB-sized); the batch axis is sharded over a 1-D
`data` mesh axis; the only cross-chip communication is a `psum` of
convergence/throughput statistics. Works identically on a real TPU slice and
on a virtual CPU mesh (`--xla_force_host_platform_device_count`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dftpav_tpu import solver
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.types import Dims, Scenario, SolveResult, Weights


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def _metrics_of(res: SolveResult, axis: str):
    ok = res.success.astype(jnp.float32)
    metrics = dict(
        n_solved=jnp.sum(ok),
        n_total=jnp.asarray(float(res.cost.shape[0]), jnp.float32),
        iters_sum=jnp.sum(res.n_iters.astype(jnp.float32)),
        cost_sum=jnp.sum(jnp.where(res.success, res.cost, 0.0)
                         .astype(jnp.float32)),
    )
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), metrics)


def make_sharded_solver(mesh: Mesh, cfg: PlannerConfig, dims: Dims,
                        max_iterations: int | None = None,
                        axis: str = "data", engine: str = "bminor",
                        weights: Weights | None = None, tb: int = 128,
                        flags=None):
    """Build a pjit'd solver sharding the scenario batch over `axis`.

    Returns fn(batch: Scenario[B, ...], w: Weights) -> (SolveResult[B, ...],
    metrics) where B must divide evenly by mesh.shape[axis]. The SolveResult
    stays sharded (device-resident); metrics is a small replicated dict
    reduced with psum over the mesh:
      n_success, iters_sum, evals_sum, cost_sum (over successful lanes).

    `engine` selects the per-shard solver (solver.make_solver engines).
    The "fused"/"fused-mixed" kernels bake weights at trace time, so they
    require concrete `weights=` here and the returned fn IGNORES its `w`
    argument (kept for signature compatibility); the per-device shard
    B/n_devices must divide `tb` lanes.
    """
    if engine in ("fused", "fused-mixed"):
        from dftpav_tpu.ops.pallas_solve import (solve_batch_fused,
                                                 solve_batch_fused_mixed)
        if weights is None:
            raise ValueError(
                "engine='fused' under shard_map needs concrete weights=")
        impl = (solve_batch_fused_mixed if engine == "fused-mixed"
                else solve_batch_fused)

        def step_f(batch: Scenario):
            res = impl(batch, weights, dims=dims, cfg=cfg,
                       max_iterations=max_iterations, tb=tb, flags=flags)
            return res, _metrics_of(res, axis)

        # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry
        # no varying-manual-axes annotation, which the vma checker rejects;
        # the solve is purely data-parallel (no in-solve collectives), so
        # the check adds nothing here — the bminor/rounds path keeps it on
        fused_fn = jax.jit(
            jax.shard_map(step_f, mesh=mesh, check_vma=False,
                          in_specs=(P(axis),), out_specs=(P(axis), P())))
        return lambda batch, w=None: fused_fn(batch)

    local = solver.make_solver(cfg, dims, max_iterations=max_iterations,
                               jit=False, engine=engine, flags=flags)

    def step(batch: Scenario, w: Weights):
        res: SolveResult = local(batch, w)
        return res, _metrics_of(res, axis)

    # tree-prefix specs: batch leaves sharded on `axis`, weights/metrics
    # replicated
    fn = jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=(P(axis), P()),
        ))
    return fn
