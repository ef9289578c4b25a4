"""Batched dense QP solver (OSQP-style ADMM), the OOQP-interface equivalent.

Reference: the SSC planner solves
    min 0.5 x'Qx + c'x   s.t.  Ax = b,  l <= Cx <= u
with OOQP (common/solver/ooqp_interface.cc:1-230). On TPU we solve the same
problem with ADMM over the stacked constraint operator G = [A; C] (equality
rows get l = u = b), which is all batched matmuls + clips:

    x+ = solve[(Q + sigma I + rho G'G)] (sigma x - c + G'(rho z - y))
    z+ = clip(G x+ + y / rho, l, u)
    y+ = y + rho (G x+ - z+)

The (n x n) system matrix is constant across iterations, so it is factored
once per solve (batched LU via jax.scipy) and each iteration is two
triangular solves — static shapes, `vmap`/`jit` friendly. Fixed iteration
count keeps the program shape static; primal/dual residuals are returned for
convergence checks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPResult(NamedTuple):
    x: jnp.ndarray          # [..., n]
    primal_res: jnp.ndarray  # [...] max |Gx - z|
    dual_res: jnp.ndarray    # [...] max |rho G'(z_prev - z)|
    eq_res: jnp.ndarray      # [...] max |Ax - b| rows


def admm_qp(Q, c, G, l, u, n_eq: int, iters: int = 100, rho: float = 1.0,
            sigma: float = 1e-6, rho_eq_scale: float = 1e3) -> QPResult:
    """Solve min 0.5 x'Qx + c'x s.t. l <= Gx <= u (first n_eq rows equality).

    All arguments broadcast over leading batch dims: Q [..., n, n],
    c [..., n], G [..., m, n], l/u [..., m]. Equality rows use a stiffer rho
    (OSQP's rho scaling for l == u rows).
    """
    with jax.default_matmul_precision("float32"):
        # bf16 MXU truncation inside the KKT factorization/solves destroys
        # the stiff equality rows (rho_eq 1e3): eq residual 3e0 -> 1e-3
        return _admm_qp(Q, c, G, l, u, n_eq, iters, rho, sigma, rho_eq_scale)


def _admm_qp(Q, c, G, l, u, n_eq, iters, rho, sigma, rho_eq_scale):
    n = Q.shape[-1]
    m = G.shape[-2]
    dtype = Q.dtype
    rho_vec = jnp.concatenate([
        jnp.full((n_eq,), rho * rho_eq_scale, dtype),
        jnp.full((m - n_eq,), rho, dtype)])
    GtRG = jnp.einsum("...ji,...j,...jk->...ik", G, rho_vec, G)
    K = Q + sigma * jnp.eye(n, dtype=dtype) + GtRG
    lu, piv = jax.scipy.linalg.lu_factor(K)

    x0 = jnp.zeros(Q.shape[:-2] + (n,), dtype)
    z0 = jnp.clip(jnp.zeros(Q.shape[:-2] + (m,), dtype), l, u)
    y0 = jnp.zeros_like(z0)

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - c + jnp.einsum("...ji,...j->...i", G,
                                         rho_vec * z - y)
        x = jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None])[..., 0]
        Gx = jnp.einsum("...ij,...j->...i", G, x)
        z_new = jnp.clip(Gx + y / rho_vec, l, u)
        y = y + rho_vec * (Gx - z_new)
        return (x, z_new, y), None

    (x, z, y), _ = jax.lax.scan(body, (x0, z0, y0), None, length=iters)
    Gx = jnp.einsum("...ij,...j->...i", G, x)
    primal = jnp.max(jnp.abs(Gx - z), axis=-1)
    eq_res = jnp.max(jnp.abs(Gx[..., :n_eq] - l[..., :n_eq]), axis=-1) \
        if n_eq > 0 else jnp.zeros(Q.shape[:-2], dtype)
    dual = jnp.max(jnp.abs(jnp.einsum("...ji,...j->...i", G,
                                      rho_vec * (jnp.clip(Gx, l, u) - z))),
                   axis=-1)
    return QPResult(x=x, primal_res=primal, dual_res=dual, eq_res=eq_res)
