"""MINCO core: constant-matrix solve vs. dense reference properties,
boundary/continuity conditions, jerk cost, and flatness maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dftpav_tpu import minco


def random_problem(rng, N):
    inner = rng.normal(size=(N - 1, 2))
    head = rng.normal(size=(2, 3))
    tail = rng.normal(size=(2, 3))
    dT = rng.uniform(0.3, 2.0)
    return inner, dT, head, tail


@pytest.mark.parametrize("N", [2, 3, 8, 12])
def test_generate_satisfies_constraints(N):
    rng = np.random.default_rng(N)
    inner, dT, head, tail = random_problem(rng, N)
    Ainv = minco.maps_as(N, jnp.float64)
    b = minco.generate(jnp.asarray(inner), dT, jnp.asarray(head),
                       jnp.asarray(tail), Ainv)

    # boundary PVA
    p0, v0, a0 = minco.eval_derivatives(b[0], dT, jnp.zeros(()), (0, 1, 2))
    np.testing.assert_allclose(p0, head[:, 0], atol=1e-9)
    np.testing.assert_allclose(v0, head[:, 1], atol=1e-9)
    np.testing.assert_allclose(a0, head[:, 2], atol=1e-9)
    pN, vN, aN = minco.eval_derivatives(b[N - 1], dT, jnp.ones(()), (0, 1, 2))
    np.testing.assert_allclose(pN, tail[:, 0], atol=1e-8)
    np.testing.assert_allclose(vN, tail[:, 1], atol=1e-8)
    np.testing.assert_allclose(aN, tail[:, 2], atol=1e-8)

    # inner waypoints and C^4 continuity at junctions
    for i in range(N - 1):
        endv = minco.eval_derivatives(b[i], dT, jnp.ones(()), (0, 1, 2, 3, 4))
        startv = minco.eval_derivatives(b[i + 1], dT, jnp.zeros(()),
                                        (0, 1, 2, 3, 4))
        np.testing.assert_allclose(endv[0], inner[i], atol=1e-8)
        for r in range(5):
            np.testing.assert_allclose(endv[r], startv[r], atol=1e-7,
                                       err_msg=f"junction {i} deriv {r}")


def test_generate_is_min_jerk():
    """Among interpolants of the same waypoints/boundaries, the MINCO solution
    minimizes integral of squared jerk: perturbing coefficients consistently
    (keeping constraints) must not reduce the cost. Verified via gradient of
    jerk cost wrt inner points being stationary... instead simpler: compare to
    scipy-style dense solve of the same linear system."""
    N = 6
    rng = np.random.default_rng(7)
    inner, dT, head, tail = random_problem(rng, N)
    A = minco.minco_matrix(N)
    rhs = np.zeros((6 * N, 2))
    rhs[0] = head[:, 0]
    rhs[1] = head[:, 1] * dT
    rhs[2] = head[:, 2] * dT * dT
    for i in range(N - 1):
        rhs[6 * i + 5] = inner[i]
    rhs[-3] = tail[:, 0]
    rhs[-2] = tail[:, 1] * dT
    rhs[-1] = tail[:, 2] * dT * dT
    b_dense = np.linalg.solve(A, rhs).reshape(N, 6, 2)
    Ainv = minco.maps_as(N, jnp.float64)
    b = minco.generate(jnp.asarray(inner), dT, jnp.asarray(head),
                       jnp.asarray(tail), Ainv)
    np.testing.assert_allclose(np.asarray(b), b_dense, atol=1e-9)


def test_jerk_cost_matches_quadrature():
    N = 5
    rng = np.random.default_rng(3)
    inner, dT, head, tail = random_problem(rng, N)
    Ainv = minco.maps_as(N, jnp.float64)
    b = minco.generate(jnp.asarray(inner), dT, jnp.asarray(head),
                       jnp.asarray(tail), Ainv)
    energy = float(minco.jerk_cost(b, dT))

    # dense quadrature of |sigma'''|^2
    taus = np.linspace(0, 1, 20001)
    total = 0.0
    for i in range(N):
        (j3,) = minco.eval_derivatives(b[i], dT, jnp.asarray(taus), (3,))
        total += np.trapezoid(np.sum(np.asarray(j3) ** 2, -1), taus * dT)
    np.testing.assert_allclose(energy, total, rtol=1e-6)


def test_flat_states_match_finite_difference():
    """theta/v/a/kappa from the flatness map vs numeric differentiation of the
    position curve (reference formulas: poly_traj_utils.hpp:237-300)."""
    N = 4
    rng = np.random.default_rng(11)
    inner, dT, head, tail = random_problem(rng, N)
    Ainv = minco.maps_as(N, jnp.float64)
    b = minco.generate(jnp.asarray(inner), dT, jnp.asarray(head),
                       jnp.asarray(tail), Ainv)
    for singul in (1, -1):
        ts = np.linspace(0.05, N * dT - 0.05, 23)
        st = minco.eval_segment_states(b, jnp.asarray(dT), singul, 2.85,
                                       jnp.asarray(ts))
        eps = 1e-6
        stp = minco.eval_segment_states(b, jnp.asarray(dT), singul, 2.85,
                                        jnp.asarray(ts + eps))
        stm = minco.eval_segment_states(b, jnp.asarray(dT), singul, 2.85,
                                        jnp.asarray(ts - eps))
        # v = singul*|p'|: check |dp/dt| == |vel|
        num_v = (np.asarray(stp["pos"]) - np.asarray(stm["pos"])) / (2 * eps)
        np.testing.assert_allclose(np.linalg.norm(num_v, axis=-1),
                                   np.abs(np.asarray(st["vel"])), rtol=1e-4)
        # heading: velocity direction (flipped when reversing)
        ang = np.arctan2(singul * num_v[:, 1], singul * num_v[:, 0])
        np.testing.assert_allclose(np.unwrap(ang),
                                   np.unwrap(np.asarray(st["theta"])),
                                   atol=1e-4)
        # curvature: dtheta/ds
        dtheta = (np.unwrap(np.asarray(stp["theta"]))
                  - np.unwrap(np.asarray(stm["theta"]))) / (2 * eps)
        ds = np.asarray(st["vel"])  # signed speed; kappa*v = thetadot
        np.testing.assert_allclose(dtheta, np.asarray(st["curv"]) * ds,
                                   atol=1e-3)
        # steering
        np.testing.assert_allclose(np.asarray(st["steer"]),
                                   np.arctan(2.85 * np.asarray(st["curv"])),
                                   atol=1e-12)


def test_generate_vmap_and_grad():
    """generate must be vmappable and differentiable (it replaces the
    reference's banded solve + adjoint solve, poly_traj_utils.hpp:953,1037)."""
    N = 8
    B = 16
    rng = np.random.default_rng(5)
    inner = jnp.asarray(rng.normal(size=(B, N - 1, 2)))
    head = jnp.asarray(rng.normal(size=(B, 2, 3)))
    tail = jnp.asarray(rng.normal(size=(B, 2, 3)))
    dT = jnp.asarray(rng.uniform(0.5, 1.5, size=(B,)))
    Ainv = minco.maps_as(N, jnp.float64)

    def cost(inner, dT, head, tail):
        b = minco.generate(inner, dT, head, tail, Ainv)
        return minco.jerk_cost(b, dT)

    costs = jax.vmap(cost)(inner, dT, head, tail)
    assert costs.shape == (B,)
    g = jax.grad(lambda i: jnp.sum(jax.vmap(cost)(i, dT, head, tail)))(inner)
    assert np.all(np.isfinite(np.asarray(g)))

    # FD check on one element
    e = np.zeros((B, N - 1, 2))
    e[3, 2, 1] = 1e-6
    f0 = float(jnp.sum(jax.vmap(cost)(inner - jnp.asarray(e), dT, head, tail)))
    f1 = float(jnp.sum(jax.vmap(cost)(inner + jnp.asarray(e), dT, head, tail)))
    np.testing.assert_allclose(float(g[3, 2, 1]), (f1 - f0) / 2e-6, rtol=1e-5)
