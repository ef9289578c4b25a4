"""MINCO minimum-jerk trajectory core.

The reference (plan_utils::MinJerkOpt, poly_traj_utils.hpp:855-1095) solves a
6N x 6N *banded* linear system per cost evaluation with a scalar banded-LU.
Crucial observation for TPU: the system is assembled in normalized time
(poly_traj_utils.hpp:897-948 writes only constants into A; the duration enters
through scaling of the RHS rows and of the output coefficients), so A depends
only on the piece count N. We therefore precompute A^-1 once per N on the host
and `generate` collapses to a single (batched) matmul on the MXU — no
sequential solve on device at all. The adjoint solve of calGrads_PT
(poly_traj_utils.hpp:1037-1065) is likewise subsumed by `jax.grad` through the
same matmul.

Coefficient conventions:
  * "normalized" coefficients b[k] multiply tau^k with tau = t / dT in [0, 1]
    per piece; shaped [N, 6, 2].
  * "real-time" coefficients c[k] = b[k] / dT^k multiply t^k (matching the
    reference's Piece ascending-power storage after its reversal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def minco_matrix(N: int) -> np.ndarray:
    """The constant normalized-time MINCO constraint matrix A (6N x 6N).

    Rows (reference: poly_traj_utils.hpp:880-948):
      0..2        head position / scaled velocity / scaled acceleration
      6i+3..6i+8  continuity of jerk & snap, inner waypoint, continuity of
                  position/velocity/acceleration at junction i
      6N-3..6N-1  tail position / scaled velocity / scaled acceleration
    """
    A = np.zeros((6 * N, 6 * N), dtype=np.float64)
    A[0, 0] = 1.0
    A[1, 1] = 1.0
    A[2, 2] = 2.0
    for i in range(N - 1):
        r, c = 6 * i, 6 * i
        A[r + 3, c + 3] = 6.0
        A[r + 3, c + 4] = 24.0
        A[r + 3, c + 5] = 60.0
        A[r + 3, c + 9] = -6.0
        A[r + 4, c + 4] = 24.0
        A[r + 4, c + 5] = 120.0
        A[r + 4, c + 10] = -24.0
        A[r + 5, c:c + 6] = 1.0
        A[r + 6, c:c + 6] = 1.0
        A[r + 6, c + 6] = -1.0
        A[r + 7, c + 1:c + 6] = (1.0, 2.0, 3.0, 4.0, 5.0)
        A[r + 7, c + 7] = -1.0
        A[r + 8, c + 2:c + 6] = (2.0, 6.0, 12.0, 20.0)
        A[r + 8, c + 8] = -2.0
    A[6 * N - 3, 6 * N - 6:] = 1.0
    A[6 * N - 2, 6 * N - 5:] = (1.0, 2.0, 3.0, 4.0, 5.0)
    A[6 * N - 1, 6 * N - 4:] = (2.0, 6.0, 12.0, 20.0)
    return A


@functools.lru_cache(maxsize=None)
def minco_inverse(N: int) -> np.ndarray:
    """Host-precomputed A^-1 (float64). Well-conditioned for practical N."""
    return np.linalg.inv(minco_matrix(N))


@functools.lru_cache(maxsize=None)
def minco_maps(N: int):
    """Column slices of A^-1 matching the sparse RHS of the MINCO system.

    The RHS has nonzeros only at rows {0,1,2} (head PVA), {6i+5} (inner
    waypoints) and {6N-3..6N-1} (tail PVA), so the solve collapses to
    b = Mh @ head_scaled + Mi @ inner + Mt @ tail_scaled — three constant-
    matrix matmuls (MXU) with no scatter. (A strided scatter into the RHS
    trips an XLA:TPU algebraic-simplifier cycle bug on v5e; this form is both
    the workaround and the faster design.)

    Returns (Mh [6N,3], Mi [6N,N-1], Mt [6N,3]) float64.
    """
    Ainv = minco_inverse(N)
    Mh = Ainv[:, 0:3].copy()
    Mi = Ainv[:, 5:6 * (N - 1):6].copy()
    Mt = Ainv[:, 6 * N - 3:].copy()
    return Mh, Mi, Mt


def generate(inner: jnp.ndarray, dT: jnp.ndarray, head: jnp.ndarray,
             tail: jnp.ndarray, maps) -> jnp.ndarray:
    """Solve the MINCO system for one segment; returns normalized coeffs [N,6,2].

    Args:
      inner: [N-1, 2] inner waypoints.
      dT:    scalar per-piece duration.
      head, tail: [2, 3] PVA boundary states (columns p, v, a).
      maps:  (Mh, Mi, Mt) from minco_maps(N), cast to inner.dtype.

    Reference: MinJerkOpt::generate (poly_traj_utils.hpp:953-986), with the
    final tInv scaling deferred to evaluation sites.
    """
    Mh, Mi, Mt = maps
    N = Mh.shape[0] // 6
    scale = jnp.stack([jnp.ones_like(dT), dT, dT * dT])      # [3]
    b = (Mh @ (head.T * scale[:, None])
         + Mi @ inner
         + Mt @ (tail.T * scale[:, None]))
    return b.reshape(N, 6, 2)


def maps_as(N: int, dtype):
    """minco_maps(N) cast to a jnp dtype (host constants -> device operands)."""
    return tuple(jnp.asarray(m, dtype) for m in minco_maps(N))


@functools.lru_cache(maxsize=None)
def subdivision_matrix(r: int) -> np.ndarray:
    """A [r, 6, 6] with A[i] mapping a piece's normalized coeffs to the
    normalized coeffs of its i-th of r equal sub-pieces (exact: a quintic
    re-based on a sub-interval is the same quintic).

    p(tau) = sum_k b_k tau^k with tau = (i + u)/r gives sub-coeffs
    b'_m = sum_{k>=m} C(k,m) i^{k-m} r^-k b_k on local u in [0, 1]; used to
    emit per-segment piece-class solutions (Dims.Ns) on the class-uniform
    N-piece output grid."""
    from math import comb
    A = np.zeros((r, 6, 6))
    for i in range(r):
        for m in range(6):
            for k in range(m, 6):
                A[i, m, k] = comb(k, m) * float(i) ** (k - m) / float(r) ** k
    return A


def subdivide(b: jnp.ndarray, r: int) -> jnp.ndarray:
    """Re-express [n, 6, 2] normalized coeffs (piece duration dT) as
    [n*r, 6, 2] on sub-pieces of duration dT/r. Exact polynomial identity."""
    if r == 1:
        return b
    A = jnp.asarray(subdivision_matrix(r), b.dtype)
    out = jnp.einsum("imk,qkd->qimd", A, b)
    return out.reshape(b.shape[0] * r, 6, 2)


def real_coeffs(b: jnp.ndarray, dT: jnp.ndarray) -> jnp.ndarray:
    """Normalized [N,6,2] -> real-time coefficients c[k] = b[k] / dT^k."""
    k = jnp.arange(6, dtype=b.dtype)
    return b * (dT ** -k)[None, :, None]


def jerk_cost(b: jnp.ndarray, dT: jnp.ndarray) -> jnp.ndarray:
    """Integral of squared jerk over the segment.

    Closed form of MinJerkOpt::getTrajJerkCost (poly_traj_utils.hpp:998-1009)
    in terms of real coefficients c3..c5 and dT powers, vectorized over pieces.
    """
    c = real_coeffs(b, dT)
    c3, c4, c5 = c[:, 3], c[:, 4], c[:, 5]
    t1 = dT
    t2 = t1 * t1
    t3 = t2 * t1
    t4 = t2 * t2
    t5 = t4 * t1
    e = (36.0 * jnp.sum(c3 * c3, -1) * t1
         + 144.0 * jnp.sum(c4 * c3, -1) * t2
         + 192.0 * jnp.sum(c4 * c4, -1) * t3
         + 240.0 * jnp.sum(c5 * c3, -1) * t3
         + 720.0 * jnp.sum(c5 * c4, -1) * t4
         + 720.0 * jnp.sum(c5 * c5, -1) * t5)
    return jnp.sum(e)


# ---------------------------------------------------------------------------
# Trajectory evaluation (flatness maps). Reference: plan_utils::Piece
# (poly_traj_utils.hpp:77-340).
# ---------------------------------------------------------------------------

def _tau_powers(tau: jnp.ndarray, order: int) -> jnp.ndarray:
    """[..., 6] rows of d^order/dtau^order of (1, tau, ..., tau^5).

    Powers are built by iterated multiplication — `tau ** 0` lowers to
    pow(0, 0) = NaN on the TPU backend, so no `**` here.
    """
    k = np.arange(6)
    coef = np.ones(6)
    for r in range(order):
        coef = coef * (k - r)
    expo = np.maximum(k - order, 0)
    pows = [jnp.ones_like(tau)]
    for _ in range(5):
        pows.append(pows[-1] * tau)
    pows = jnp.stack(pows, axis=-1)             # [..., 6] = tau^k
    return coef * pows[..., expo] * (k >= order)


def eval_derivatives(b: jnp.ndarray, dT: jnp.ndarray, tau: jnp.ndarray,
                     orders=(0, 1, 2)) -> list[jnp.ndarray]:
    """Evaluate sigma^(r)(tau * dT) for each requested derivative order.

    b: [N,6,2] normalized coeffs; tau in [0,1] per piece, shaped [...]; the
    piece index must be selected by the caller (b already indexed) OR b is
    [6,2] for a single piece. Returns arrays [..., 2].
    """
    out = []
    for r in orders:
        basis = _tau_powers(tau, r).astype(b.dtype)
        out.append(jnp.einsum("...k,...kd->...d", basis, b) * dT ** (-r))
    return out


def flat_states(dsig: jnp.ndarray, ddsig: jnp.ndarray, singul, wheel_base,
                eps: float = 1e-6):
    """Flatness map: (sigma', sigma'') -> (theta, v, a_lon, kappa, steer).

    Reference: Piece::getAngle/getVel/getAcc/getCurv/getSteer
    (poly_traj_utils.hpp:237-300). Near-zero speed returns 0 for kappa/acc as
    the reference does.
    """
    sg = jnp.asarray(singul, dsig.dtype)
    vn = jnp.linalg.norm(dsig, axis=-1)
    theta = jnp.arctan2(sg * dsig[..., 1], sg * dsig[..., 0])
    v = sg * vn
    safe = vn >= 1e-6
    vn_s = jnp.where(safe, vn, 1.0)
    cross = dsig[..., 0] * ddsig[..., 1] - dsig[..., 1] * ddsig[..., 0]
    dot = dsig[..., 0] * ddsig[..., 0] + dsig[..., 1] * ddsig[..., 1]
    kappa = jnp.where(safe, sg * cross / vn_s**3, 0.0)
    a_lon = jnp.where(safe, sg * dot / vn_s, 0.0)
    steer = jnp.arctan(wheel_base * kappa)
    return theta, v, a_lon, kappa, steer


def eval_segment_states(b: jnp.ndarray, dT: jnp.ndarray, singul, wheel_base,
                        t: jnp.ndarray):
    """Evaluate full states of one segment trajectory at (clamped) times t.

    b: [N,6,2]; t: [...] seconds from segment start. Returns dict of arrays.
    Reference: Trajectory::GetState (poly_traj_utils.hpp:378-406).
    """
    N = b.shape[0]
    total = dT * N
    tc = jnp.clip(t, 0.0, total)
    idx = jnp.clip((tc / dT).astype(jnp.int32), 0, N - 1)
    tau = tc / dT - idx.astype(b.dtype)
    bi = b[idx]  # [..., 6, 2]
    pos, dsig, ddsig = eval_derivatives(bi, dT, tau, orders=(0, 1, 2))
    theta, v, a, kappa, steer = flat_states(dsig, ddsig, singul, wheel_base)
    return dict(pos=pos, dsigma=dsig, ddsigma=ddsig, theta=theta, vel=v,
                acc=a, curv=kappa, steer=steer)
