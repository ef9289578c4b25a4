"""Batched dense QP solver (OSQP-style ADMM), the OOQP-interface equivalent.

Reference: the SSC planner solves
    min 0.5 x'Qx + c'x   s.t.  Ax = b,  l <= Cx <= u
with OOQP (common/solver/ooqp_interface.cc:1-230), which iterates to a
tolerance and reports a solve status. On TPU we solve the same problem with
ADMM over the stacked constraint operator G = [A; C] (equality rows get
l = u = b), which is all batched matmuls + clips:

    x+ = solve[(Q + sigma I + rho G'G)] (sigma x - c + G'(rho z - y))
    z+ = clip(G x+ + y / rho, l, u)
    y+ = y + rho (G x+ - z+)

The (n x n) system matrix is constant across iterations, so it is factored
once per solve (batched LU via jax.scipy) and each iteration is two
triangular solves — static shapes, `vmap`/`jit` friendly. Like OOQP, the
solver iterates to tolerance: a `lax.while_loop` exits when primal/dual/
equality residuals drop below their tolerances (or at the iteration cap),
and the result carries a status code — SOLVED / MAX_ITER (residuals above
tolerance at the cap) / INFEASIBLE (constraint residual still large at the
cap, the analogue of OOQP's not-converged status used by the SSC planner to
reject the corridor, ssc_planner.cc RunQpOptimization failure path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# status codes (ooqp SUCCESSFUL_TERMINATION / MAX_ITS_EXCEEDED / INFEASIBLE)
SOLVED, MAX_ITER, INFEASIBLE = 0, 1, 2


class QPResult(NamedTuple):
    x: jnp.ndarray          # [..., n]
    primal_res: jnp.ndarray  # [...] max |Gx - z|
    dual_res: jnp.ndarray    # [...] max |rho G'(z_prev - z)|
    eq_res: jnp.ndarray      # [...] max |Ax - b| rows
    n_iters: jnp.ndarray     # [...] int32 ADMM iterations executed
    status: jnp.ndarray      # [...] int32 SOLVED / MAX_ITER / INFEASIBLE


def admm_qp(Q, c, G, l, u, n_eq: int, iters: int = 100, rho: float = 1.0,
            sigma: float = 1e-6, rho_eq_scale: float = 1e3,
            eps_primal: float = 1e-3, eps_dual: float = 1e-3,
            eps_infeasible: float = 1e-1) -> QPResult:
    """Solve min 0.5 x'Qx + c'x s.t. l <= Gx <= u (first n_eq rows equality).

    All arguments broadcast over leading batch dims: Q [..., n, n],
    c [..., n], G [..., m, n], l/u [..., m]. Equality rows use a stiffer rho
    (OSQP's rho scaling for l == u rows). Iterates until residuals fall
    below (eps_primal, eps_dual) or `iters` is reached; status is INFEASIBLE
    when the primal residual is still above eps_infeasible at exit.

    Notes: the `lax.while_loop` makes this solver NOT reverse-mode
    differentiable (while_loop has no VJP) — like the OOQP path it
    replaces, it is a forward-only solve; take gradients through a fixed
    `lax.scan` variant if that is ever needed. `n_iters` is the SHARED
    loop count at exit (the max over whatever batch is vmapped together,
    broadcast to the batch shape), not a per-problem iteration count —
    per-problem convergence is what `status` reports.
    """
    with jax.default_matmul_precision("float32"):
        # bf16 MXU truncation inside the KKT factorization/solves destroys
        # the stiff equality rows (rho_eq 1e3): eq residual 3e0 -> 1e-3
        return _admm_qp(Q, c, G, l, u, n_eq, iters, rho, sigma, rho_eq_scale,
                        eps_primal, eps_dual, eps_infeasible)


def _admm_qp(Q, c, G, l, u, n_eq, iters, rho, sigma, rho_eq_scale,
             eps_primal, eps_dual, eps_infeasible):
    n = Q.shape[-1]
    m = G.shape[-2]
    dtype = Q.dtype
    batch = jnp.broadcast_shapes(Q.shape[:-2], c.shape[:-1], G.shape[:-2],
                                 l.shape[:-1], u.shape[:-1])
    rho_vec = jnp.concatenate([
        jnp.full((n_eq,), rho * rho_eq_scale, dtype),
        jnp.full((m - n_eq,), rho, dtype)])
    GtRG = jnp.einsum("...ji,...j,...jk->...ik", G, rho_vec, G)
    K = Q + sigma * jnp.eye(n, dtype=dtype) + GtRG
    lu, piv = jax.scipy.linalg.lu_factor(K)

    x0 = jnp.zeros(batch + (n,), dtype)
    z0 = jnp.clip(jnp.zeros(batch + (m,), dtype), l, u)
    y0 = jnp.zeros_like(z0)
    big = jnp.full(batch, jnp.inf, dtype)

    def step(x, z, y):
        rhs = sigma * x - c + jnp.einsum("...ji,...j->...i", G,
                                         rho_vec * z - y)
        x = jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None])[..., 0]
        Gx = jnp.einsum("...ij,...j->...i", G, x)
        z_new = jnp.clip(Gx + y / rho_vec, l, u)
        y = y + rho_vec * (Gx - z_new)
        primal = jnp.max(jnp.abs(Gx - z_new), axis=-1)
        dual = jnp.max(jnp.abs(jnp.einsum(
            "...ji,...j->...i", G, rho_vec * (z - z_new))), axis=-1)
        return x, z_new, y, primal, dual

    def cond(carry):
        _, _, _, primal, dual, k = carry
        done = (primal < eps_primal) & (dual < eps_dual)
        return jnp.any(~done) & (k < iters)

    def body(carry):
        x, z, y, _, _, k = carry
        x, z, y, primal, dual = step(x, z, y)
        return x, z, y, primal, dual, k + 1

    x, z, y, primal, dual, k = jax.lax.while_loop(
        cond, body, (x0, z0, y0, big, big, jnp.asarray(0, jnp.int32)))

    Gx = jnp.einsum("...ij,...j->...i", G, x)
    eq_res = jnp.max(jnp.abs(Gx[..., :n_eq] - l[..., :n_eq]), axis=-1) \
        if n_eq > 0 else jnp.zeros(batch, dtype)
    converged = (primal < eps_primal) & (dual < eps_dual)
    status = jnp.where(converged, SOLVED,
                       jnp.where(primal > eps_infeasible, INFEASIBLE,
                                 MAX_ITER)).astype(jnp.int32)
    return QPResult(x=x, primal_res=primal, dual_res=dual, eq_res=eq_res,
                    n_iters=jnp.broadcast_to(k, batch), status=status)
