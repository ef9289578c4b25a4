"""Pallas corridor-penalty kernel: parity vs the XLA path (interpret mode)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dftpav_tpu import cost as cost_mod
from dftpav_tpu import scenarios
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.ops import bcost
from dftpav_tpu.types import Dims, weights_from_config


def _cfg(backend):
    cfg = PlannerConfig()
    return dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, corridor_backend=backend))


def _fixture(dims, B, nobs):
    scens = scenarios.batch_scenarios(dims, B, seed=3, dtype=np.float64,
                                      n_obstacles=nobs)
    batch = jax.tree.map(jnp.asarray, scens)
    w = weights_from_config(PlannerConfig().opt, dtype=jnp.float64)
    bm = bcost.to_bminor(batch)
    x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch).T
    x0 = x0 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), x0.shape,
                                       x0.dtype)
    return bm, w, x0


class TestPallasCorridorPenalty:
    def test_total_cost_and_grad_bitexact(self):
        dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
        bm, w, x0 = _fixture(dims, 8, 2)

        def total(x, cfg):
            return jnp.sum(bcost.total_cost_b(x, bm, w, dims, cfg)[0])

        f1, g1 = jax.value_and_grad(total)(x0, _cfg("xla"))
        f2, g2 = jax.value_and_grad(total)(x0, _cfg("pallas"))
        assert float(jnp.abs(f1 - f2)) == 0.0
        assert float(jnp.abs(g1 - g2).max()) == 0.0

    def test_multiseg_gear(self):
        dims = Dims(S=2, N=5, K=8, Kdes=12, H=4, O=0, Po=8)
        scen = scenarios.gear_scenario(dims)
        batch = jax.tree.map(jnp.asarray,
                             scenarios.stack_scenarios([scen] * 4))
        w = weights_from_config(PlannerConfig().opt, dtype=jnp.float64)
        bm = bcost.to_bminor(batch)
        x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch).T

        def total(x, cfg):
            return jnp.sum(bcost.total_cost_b(x, bm, w, dims, cfg)[0])

        f1, g1 = jax.value_and_grad(total)(x0, _cfg("xla"))
        f2, g2 = jax.value_and_grad(total)(x0, _cfg("pallas"))
        np.testing.assert_allclose(float(f1), float(f2), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-10)
