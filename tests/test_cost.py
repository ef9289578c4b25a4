"""Objective parity vs the NumPy oracle + finite-difference gradient checks.

These reproduce, in spirit, the reference's hand-run debugGradCheck
(traj_optimizer.cpp:911-1306) as an automated suite.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dftpav_tpu import cost as cost_mod
from dftpav_tpu import scenarios
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.types import Dims, weights_from_config
from oracle.reference_cost import reference_total_cost

CFG = PlannerConfig()


def make_case(dims, tight=True, n_obstacles=0, seed=0):
    """A scenario whose initial guess ACTIVATES the penalties (tight corridor,
    short duration -> vel/acc/curvature violations) so parity tests exercise
    live branches, not zeros."""
    # corridor_half is the *grow margin* beyond the vehicle OBB; 0.05 keeps
    # the boxes tight enough that the duration-rescaled init guess violates
    scen = scenarios.straight_scenario(
        dims, length=14.0, lateral=3.0, v0=2.0, v1=1.0,
        corridor_half=0.05 if tight else 8.0, n_obstacles=n_obstacles,
        rng=np.random.default_rng(seed))
    # shrink duration to force feasibility violations
    scen = scen._replace(init_T=scen.init_T * 0.35)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    x0 = cost_mod.initial_guess(scen, w, dims)
    return scen, w, x0


@pytest.mark.parametrize("n_obstacles", [0, 2])
def test_cost_matches_oracle(n_obstacles):
    dims = Dims(S=1, N=6, K=8, Kdes=12, H=4, O=2, Po=8)
    scen, w, x0 = make_case(dims, n_obstacles=n_obstacles)
    total, aux = cost_mod.total_cost(x0, scen, w, dims, CFG)
    ref = reference_total_cost(np.asarray(x0), scen, w, dims, CFG)

    np.testing.assert_allclose(float(aux["smoo"]), ref["smoo"], rtol=1e-9)
    np.testing.assert_allclose(float(aux["time"]), ref["time"], rtol=1e-12)
    np.testing.assert_allclose(float(aux["obs"]), ref["obs"], rtol=1e-9)
    np.testing.assert_allclose(float(aux["feas"]), ref["feas"], rtol=1e-9)
    np.testing.assert_allclose(float(aux["dyn"]), ref["dyn"], rtol=1e-8)
    np.testing.assert_allclose(float(total), ref["total"], rtol=1e-9)

    # the case must actually exercise the branches
    assert ref["obs"] > 0.0
    assert ref["feas"] > 0.0
    if n_obstacles:
        assert ref["dyn"] > 0.0


def test_cost_matches_oracle_multiseg():
    dims = Dims(S=2, N=5, K=8, Kdes=12, H=4, O=0, Po=8)
    scen = scenarios.gear_scenario(dims)
    scen = scen._replace(init_T=scen.init_T * 0.4)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    x0 = cost_mod.initial_guess(scen, w, dims)
    total, aux = cost_mod.total_cost(x0, scen, w, dims, CFG)
    ref = reference_total_cost(np.asarray(x0), scen, w, dims, CFG)
    np.testing.assert_allclose(float(total), ref["total"], rtol=1e-9)
    assert ref["feas"] > 0.0


@pytest.mark.parametrize("n_obstacles,dims", [
    (0, Dims(S=1, N=6, K=8, Kdes=12, H=4, O=0, Po=8)),
    (2, Dims(S=1, N=6, K=8, Kdes=12, H=4, O=2, Po=8)),
    (0, Dims(S=2, N=5, K=8, Kdes=12, H=4, O=0, Po=8)),
])
def test_gradient_matches_finite_difference(n_obstacles, dims):
    if dims.S == 2:
        scen = scenarios.gear_scenario(dims)
        scen = scen._replace(init_T=scen.init_T * 0.5)
        w = weights_from_config(CFG.opt, dtype=jnp.float64)
        x0 = cost_mod.initial_guess(scen, w, dims)
    else:
        scen, w, x0 = make_case(dims, n_obstacles=n_obstacles)

    f = jax.jit(lambda x: cost_mod.total_cost(x, scen, w, dims, CFG)[0])
    g = jax.jit(jax.grad(lambda x: cost_mod.total_cost(x, scen, w, dims, CFG)[0]))
    g0 = np.asarray(g(x0))
    assert np.all(np.isfinite(g0))

    rng = np.random.default_rng(42)
    idxs = rng.choice(x0.shape[0], size=min(12, x0.shape[0]), replace=False)
    eps = 1e-6
    for i in idxs:
        e = np.zeros(x0.shape[0])
        e[i] = eps
        fd = (float(f(x0 + e)) - float(f(x0 - e))) / (2 * eps)
        scale = max(1.0, abs(fd), abs(g0[i]))
        assert abs(fd - g0[i]) / scale < 5e-5, (
            f"grad mismatch at {i}: analytic {g0[i]}, FD {fd}")


def test_time_warp_roundtrip():
    mini_t = 0.1
    rt = jnp.asarray(np.linspace(0.11, 20.0, 57))
    vt = cost_mod.real_to_virtual(rt, mini_t)
    rt2 = cost_mod.virtual_to_real(vt, mini_t)
    np.testing.assert_allclose(np.asarray(rt2), np.asarray(rt), rtol=1e-12)
    # image is always >= mini_t
    vts = jnp.asarray(np.linspace(-30, 30, 101))
    rts = cost_mod.virtual_to_real(vts, mini_t)
    assert float(rts.min()) >= mini_t


def test_smoothed_l1_properties():
    xs = jnp.asarray(np.linspace(-1.0, 1.0, 2001))
    f = cost_mod.smoothed_l1(xs)
    assert float(f[xs <= 0].max()) == 0.0
    big = xs[xs > 2e-4]
    np.testing.assert_allclose(np.asarray(cost_mod.smoothed_l1(big)),
                               np.asarray(big) - 0.5e-4, rtol=1e-12)
    # C1: derivative continuous through the 1e-4-wide blend region
    xf = jnp.asarray(np.linspace(-2e-4, 3e-4, 5001))  # 1e-7 spacing
    d = jax.vmap(jax.grad(cost_mod.smoothed_l1))(xf)
    assert np.all(np.isfinite(np.asarray(d)))
    dd = np.diff(np.asarray(d))
    assert np.max(np.abs(dd)) < 5e-3  # no jumps at 0 or at pe
    # slope is exactly 1 past the blend
    np.testing.assert_allclose(np.asarray(d)[np.asarray(xf) > 1.5e-4], 1.0,
                               rtol=1e-12)


def test_cost_jit_and_vmap():
    dims = Dims(S=1, N=6, K=8, Kdes=12, H=4, O=2, Po=8)
    B = 4
    scens = scenarios.stack_scenarios([
        scenarios.straight_scenario(dims, n_obstacles=1,
                                    rng=np.random.default_rng(i))
        for i in range(B)])
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    xs = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(
        jax.tree.map(jnp.asarray, scens))
    f = jax.jit(jax.vmap(
        lambda x, s: cost_mod.total_cost(x, s, w, dims, CFG)[0], in_axes=(0, 0)))
    vals = f(xs, jax.tree.map(jnp.asarray, scens))
    assert vals.shape == (B,)
    assert np.all(np.isfinite(np.asarray(vals)))
