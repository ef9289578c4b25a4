"""Parity tests: batch-minor engine (ops.bcost / ops.blbfgs) vs the vmap path.

The batch-minor engine re-expresses identical math in a TPU-friendly layout;
these tests pin it to the readable reference implementation bit-for-bit at the
cost/gradient level and statistically at the solver level (iterate paths may
split at FP-reduction-order noise in a nonconvex landscape).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dftpav_tpu import cost as cost_mod
from dftpav_tpu import lbfgs, scenarios, solver
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.ops import bcost, blbfgs
from dftpav_tpu.types import Dims, weights_from_config

CFG = PlannerConfig()


def _batch(dims, B, nobs, seed=3):
    scens = scenarios.batch_scenarios(dims, B, seed=seed, dtype=np.float64,
                                      n_obstacles=nobs)
    return jax.tree.map(jnp.asarray, scens)


def _gear_batch(dims, B):
    scen = scenarios.gear_scenario(dims)
    return jax.tree.map(jnp.asarray, scenarios.stack_scenarios([scen] * B))


CASES = [
    (Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8), 8, 2, "straight-obs"),
    (Dims(S=1, N=8, K=16, Kdes=32, H=4, O=0, Po=8), 8, 0, "straight"),
    (Dims(S=2, N=5, K=8, Kdes=12, H=4, O=0, Po=8), 4, 0, "gear"),
]


@pytest.mark.parametrize("dims,B,nobs,kind", CASES,
                         ids=[c[3] for c in CASES])
def test_cost_and_grad_parity(dims, B, nobs, kind):
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    batch = _gear_batch(dims, B) if kind == "gear" else _batch(dims, B, nobs)
    x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch)
    x0 = x0 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), x0.shape,
                                       x0.dtype)

    f_ref = jax.vmap(
        lambda x, s: cost_mod.total_cost(x, s, w, dims, CFG)[0])(x0, batch)
    g_ref = jax.vmap(jax.grad(
        lambda x, s: cost_mod.total_cost(x, s, w, dims, CFG)[0]))(x0, batch)

    bm = bcost.to_bminor(batch)
    f_bm, _ = bcost.total_cost_b(x0.T, bm, w, dims, CFG)
    g_bm = jax.grad(
        lambda xT: jnp.sum(bcost.total_cost_b(xT, bm, w, dims, CFG)[0]))(x0.T)

    fs = np.abs(np.asarray(f_ref)).max()
    np.testing.assert_allclose(np.asarray(f_bm), np.asarray(f_ref),
                               rtol=0, atol=1e-10 * max(1.0, fs))
    gs = np.abs(np.asarray(g_ref)).max()
    np.testing.assert_allclose(np.asarray(g_bm).T, np.asarray(g_ref),
                               rtol=0, atol=1e-10 * max(1.0, gs))


def test_blbfgs_matches_lbfgs_on_quadratics():
    """On a smooth strictly-convex problem both paths must agree to FP noise."""
    D, B = 12, 9
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (B, D, D), jnp.float64)
    Q = jnp.einsum("bij,bkj->bik", A, A) + 10.0 * jnp.eye(D)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, D), jnp.float64)

    def f_one(x, Qb, cb):
        return 0.5 * x @ Qb @ x - cb @ x

    p = CFG.opt.lbfgs
    x0 = jnp.zeros((B, D), jnp.float64)

    ref = jax.vmap(lambda x, Qb, cb: lbfgs.minimize(
        jax.value_and_grad(lambda xx: f_one(xx, Qb, cb)), x, p,
        max_iterations=100))(x0, Q, c)

    def fun_b(xT):
        x = xT.T
        fs = jax.vmap(f_one)(x, Q, c)
        g = jax.vmap(jax.grad(f_one))(x, Q, c)
        return fs, g.T

    bm = blbfgs.minimize_b(fun_b, x0.T, p, max_iterations=100)
    np.testing.assert_allclose(np.asarray(bm.x).T, np.asarray(ref.x),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(bm.f), np.asarray(ref.f), atol=1e-8)
    assert np.all(np.asarray(bm.status) >= 0)
    # near the exact solution (past-delta stop at delta=1e-4 halts early)
    xstar = np.linalg.solve(np.asarray(Q), np.asarray(c)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(bm.x).T, xstar, atol=5e-3)


def test_blbfgs_lane_isolation():
    """A hard lane must not perturb an easy lane's result."""
    p = CFG.opt.lbfgs

    def f_easy(x):
        return jnp.sum((x - 1.0) ** 2)

    def f_rosen(x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    def fun_b(xT):
        x = xT.T
        fs = jnp.stack([f_easy(x[0]), f_rosen(x[1])])
        gs = jnp.stack([jax.grad(f_easy)(x[0]), jax.grad(f_rosen)(x[1])])
        return fs, gs.T

    x0 = jnp.array([[0.0, 0.0], [-1.2, 1.0]], jnp.float64).T
    res = blbfgs.minimize_b(fun_b, x0, p, max_iterations=300)
    np.testing.assert_allclose(np.asarray(res.x)[:, 0], [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x)[:, 1], [1.0, 1.0], atol=1e-5)

    # solo easy lane must land exactly where the joint run put it
    def fun_solo(xT):
        x = xT.T
        return jnp.stack([f_easy(x[0])]), jnp.stack(
            [jax.grad(f_easy)(x[0])]).T

    solo = blbfgs.minimize_b(fun_solo, x0[:, :1], p, max_iterations=300)
    np.testing.assert_allclose(np.asarray(res.x)[:, 0],
                               np.asarray(solo.x)[:, 0], atol=0)


def test_solver_bminor_end_to_end():
    """Both engines succeed on the same batch with comparable costs."""
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    B = 8
    batch = _batch(dims, B, 2, seed=7)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    r_ref = solver.make_solver(CFG, dims, max_iterations=200,
                               engine="vmap", jit=False)(batch, w)
    r_bm = solver.make_solver(CFG, dims, max_iterations=200,
                              engine="bminor", jit=False)(batch, w)
    assert np.asarray(r_bm.success).all()
    assert np.asarray(r_ref.success).all()
    a, b = np.asarray(r_ref.cost), np.asarray(r_bm.cost)
    # identical math; iterate paths may split on FP noise in a nonconvex
    # landscape -- require costs to agree within 10% per lane
    np.testing.assert_allclose(b, a, rtol=0.1)
    assert r_bm.coeffs.shape == r_ref.coeffs.shape
    assert r_bm.dT.shape == r_ref.dT.shape
