"""Batched L-BFGS: convergence on standard problems, path parity vs the
NumPy oracle of the reference solver, vmap behavior."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dftpav_tpu import lbfgs
from dftpav_tpu.config import LBFGSParams
from oracle import reference_lbfgs

P = LBFGSParams(mem_size=16, past=3, delta=1e-9, g_epsilon=1e-10,
                max_iterations=500)


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def test_rosenbrock_convergence():
    fun = jax.value_and_grad(rosenbrock)
    x0 = jnp.asarray(np.full(8, -1.2))
    res = lbfgs.minimize(fun, x0, P)
    assert lbfgs.Status.ok(res.status)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-6)


def test_nonsmooth_abs():
    """Lewis-Overton handles nonsmooth objectives (the point of the variant)."""
    fun = jax.value_and_grad(lambda x: jnp.sum(jnp.abs(x - 0.3)) + 0.5 * x @ x)
    x0 = jnp.asarray(np.linspace(-2, 2, 5))
    res = lbfgs.minimize(fun, x0, P)
    assert lbfgs.Status.ok(res.status)
    assert float(res.f) < fun(x0)[0]
    # optimum of |x-0.3| + 0.5 x^2 per-coordinate: x=0.3 clipped by subgradient
    np.testing.assert_allclose(np.asarray(res.x), 0.3, atol=1e-4)


def test_batched_vmap():
    fun = jax.value_and_grad(rosenbrock)
    B = 32
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, 6)))
    res = jax.jit(jax.vmap(lambda x: lbfgs.minimize(fun, x, P)))(x0)
    assert res.x.shape == (B, 6)
    assert np.all(np.asarray(res.status) >= 0)
    # every lane reaches a stationary point (Rosenbrock in 6D has a second
    # local minimum, so don't assert the global one)
    gnorm = np.max(np.abs(np.asarray(res.g)), axis=-1)
    assert np.all(gnorm < 1e-4), gnorm
    # lanes converge at different iteration counts
    assert len(np.unique(np.asarray(res.n_iters))) > 1


def test_path_parity_with_reference_oracle():
    """Iterate-path parity with the scalar oracle of lbfgs.hpp on a quartic
    with reference-like parameters (incl. past/delta early stopping)."""
    p = LBFGSParams(mem_size=8, past=3, delta=1e-6, g_epsilon=1e-12,
                    max_iterations=200)

    def f_np(x):
        A = np.diag(np.arange(1.0, 1.0 + x.shape[0]))
        f = 0.25 * np.sum((A @ x) ** 2) ** 1.0 + np.sum(x ** 4)
        g = 0.5 * A.T @ (A @ x) + 4.0 * x ** 3
        return f, g

    def f_jx(x):
        A = jnp.diag(jnp.arange(1.0, 1.0 + x.shape[0]))
        return 0.25 * jnp.sum((A @ x) ** 2) + jnp.sum(x ** 4)

    x0 = np.array([1.7, -0.3, 2.1, 0.9, -1.4])
    xo, fo, _go, ko, so = reference_lbfgs.minimize(f_np, x0, p)
    res = lbfgs.minimize(jax.value_and_grad(f_jx), jnp.asarray(x0), p)

    assert int(res.status) == so
    assert int(res.n_iters) == ko
    np.testing.assert_allclose(np.asarray(res.x), xo, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(res.f), fo, rtol=1e-12)


def test_stationary_start():
    fun = jax.value_and_grad(lambda x: jnp.sum(x ** 2))
    res = lbfgs.minimize(fun, jnp.zeros(4), P)
    assert int(res.status) == lbfgs.Status.CONVERGENCE
    assert int(res.n_iters) == 1
