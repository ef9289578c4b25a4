"""Pallas TPU kernel: fused static-corridor penalty, forward + analytic VJP.

The corridor block of the objective (cost.segment_penalties's static-obstacle
term, reference addPVAGradCost2CT traj_optimizer.cpp:592-622) evaluates, for
every constraint point and every ego-hull vertex, the smoothed-L1 hinge of the
signed distance to each corridor half-plane. Under XLA this is a chain of
elementwise ops with materialized [*, E, H, B] intermediates in both passes;
this kernel fuses the whole block — and its hand-derived backward — into one
VMEM-resident pass per lane tile, with only (sig, dsig, wq, corridor) read
and (cost, gradients) written. No residual tensors ever hit HBM: the backward
recomputes the forward terms in registers.

Layout: every operand is reshaped to put the flattened constraint-point axis
(R = S*N*K1) on the sublanes and a lane tile (TB of B) on the 128 lanes; the
E (hull vertex) and H (half-plane) axes are unrolled as Python loops over
[R, TB] vector ops (E = H = 4 for the rectangle corridors the pipeline
emits). The gear sign is folded into dsig by the adapter
(R(singul * dsig) = singul * R(dsig)).

The VJP math (checked against `jax.grad` of the XLA path in
tests/test_pallas.py): with w_eh = wq * S'(viol_eh) * mask_h,
u = dx/|dsig|, v = dy/|dsig|, R = [[u, -v], [v, u]]:

  d_sig    = sum_eh w_eh * n_h
  dL/du    = dR00 + dR11,  dL/dv = dR10 - dR01
             where dR_ij = sum_eh w_eh * n_i * le_{e,j}
  d_dsig_x = (dL/du (1 - u^2) - dL/dv u v) / |dsig|
  d_dsig_y = (-dL/du u v + dL/dv (1 - v^2)) / |dsig|
  d_wq     = sum_eh S(viol_eh) * mask_h
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PE = 1.0e-4  # smoothed-L1 blend width (traj_optimizer.cpp:783-806)
_F3C = 1.0 / (_PE * _PE)
_F4C = -0.5 * _F3C / _PE


def _smoothed_l1(x):
    xc = jnp.clip(x, 0.0, _PE)
    small = (_F4C * xc + _F3C) * xc * xc * xc
    return jnp.where(x <= 0.0, 0.0, jnp.where(x < _PE, small, x - 0.5 * _PE))


def _smoothed_l1_grad(x):
    xc = jnp.clip(x, 0.0, _PE)
    small = (4.0 * _F4C * xc + 3.0 * _F3C) * xc * xc
    return jnp.where(x <= 0.0, 0.0, jnp.where(x < _PE, small, 1.0))


def _uv(dsig_ref):
    dx, dy = dsig_ref[0], dsig_ref[1]
    vn2 = dx * dx + dy * dy
    inv_vn = jax.lax.rsqrt(jnp.maximum(vn2, 1e-8))
    return dx * inv_vn, dy * inv_vn, inv_vn


def _viol(sig_x, sig_y, u, v, cn_ref, cp_ref, le, e, h):
    lex, ley = le[e]
    bx = sig_x + u * lex - v * ley
    by = sig_y + v * lex + u * ley
    nx, ny = cn_ref[h, 0], cn_ref[h, 1]
    return nx * (bx - cp_ref[h, 0]) + ny * (by - cp_ref[h, 1]), nx, ny


def _fwd_kernel(sig_ref, dsig_ref, wq_ref, cn_ref, cp_ref, cm_ref,
                out_ref, *, le):
    sig_x, sig_y = sig_ref[0], sig_ref[1]
    u, v, _ = _uv(dsig_ref)
    acc = jnp.zeros_like(sig_x)
    for e in range(len(le)):
        for h in range(len(le)):
            viol, _, _ = _viol(sig_x, sig_y, u, v, cn_ref, cp_ref, le, e, h)
            acc = acc + _smoothed_l1(viol) * cm_ref[h]
    out_ref[0] = jnp.sum(wq_ref[0] * acc, axis=0)  # [TB] row into (1, TB)


def _bwd_kernel(sig_ref, dsig_ref, wq_ref, cn_ref, cp_ref, cm_ref,
                dsig_out, ddsig_out, dwq_out, *, le):
    sig_x, sig_y = sig_ref[0], sig_ref[1]
    u, v, inv_vn = _uv(dsig_ref)
    wq = wq_ref[0]

    gx = jnp.zeros_like(sig_x)
    gy = jnp.zeros_like(sig_x)
    dR00 = jnp.zeros_like(sig_x)
    dR01 = jnp.zeros_like(sig_x)
    dR10 = jnp.zeros_like(sig_x)
    dR11 = jnp.zeros_like(sig_x)
    dwq = jnp.zeros_like(sig_x)
    for e in range(len(le)):
        lex, ley = le[e]
        for h in range(len(le)):
            viol, nx, ny = _viol(sig_x, sig_y, u, v, cn_ref, cp_ref, le, e, h)
            m = cm_ref[h]
            w = wq * _smoothed_l1_grad(viol) * m
            gx = gx + w * nx
            gy = gy + w * ny
            dR00 = dR00 + w * nx * lex
            dR01 = dR01 + w * nx * ley
            dR10 = dR10 + w * ny * lex
            dR11 = dR11 + w * ny * ley
            dwq = dwq + _smoothed_l1(viol) * m
    dLdu = dR00 + dR11
    dLdv = dR10 - dR01
    dsig_out[0] = gx
    dsig_out[1] = gy
    ddsig_out[0] = (dLdu * (1.0 - u * u) - dLdv * u * v) * inv_vn
    ddsig_out[1] = (-dLdu * u * v + dLdv * (1.0 - v * v)) * inv_vn
    dwq_out[0] = dwq


def _in_specs(R, TB, lead_shapes):
    def spec(s):
        nlead = len(s)
        return pl.BlockSpec(
            s + (R, TB),
            lambda b, nlead=nlead: (0,) * nlead + (0, b),
            memory_space=pltpu.VMEM)

    return [spec(s) for s in lead_shapes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def corridor_penalty(sig, dsig, wq, corr_n, corr_p, corr_mask, le, interpret):
    """Fused corridor penalty: [B] cost from kernel-layout inputs.

    sig/dsig [2, R, B]; wq [1, R, B] (quadrature * masks * weight folded);
    corr_n/p [H, 2, R, B]; corr_mask [H, R, B] float; le: static hull as a
    tuple of (x, y) tuples; interpret: Pallas interpreter (CPU testing).
    """
    return _run_fwd(sig, dsig, wq, corr_n, corr_p, corr_mask, le, interpret)


def _run_fwd(sig, dsig, wq, corr_n, corr_p, corr_mask, le, interpret):
    _, R, B = sig.shape
    TB = min(B, 128)
    assert B % TB == 0, (B, TB)
    EH = len(le)
    kern = functools.partial(_fwd_kernel, le=le)
    out = pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=_in_specs(R, TB, [(2,), (2,), (1,), (EH, 2), (EH, 2),
                                   (EH,)]),
        out_specs=pl.BlockSpec((1, TB), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), sig.dtype),
        interpret=interpret,
    )(sig, dsig, wq, corr_n, corr_p, corr_mask)
    return out[0]


def _fwd_rule(sig, dsig, wq, corr_n, corr_p, corr_mask, le, interpret):
    cost = _run_fwd(sig, dsig, wq, corr_n, corr_p, corr_mask, le, interpret)
    return cost, (sig, dsig, wq, corr_n, corr_p, corr_mask)


def _bwd_rule(le, interpret, res, gbar):
    sig, dsig, wq, corr_n, corr_p, corr_mask = res
    _, R, B = sig.shape
    TB = min(B, 128)
    EH = len(le)
    kern = functools.partial(_bwd_kernel, le=le)
    d_sig, d_dsig, d_wq = pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=_in_specs(R, TB, [(2,), (2,), (1,), (EH, 2), (EH, 2),
                                   (EH,)]),
        out_specs=[
            pl.BlockSpec((2, R, TB), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, R, TB), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, TB), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, R, B), sig.dtype),
            jax.ShapeDtypeStruct((2, R, B), sig.dtype),
            jax.ShapeDtypeStruct((1, R, B), sig.dtype),
        ],
        interpret=interpret,
    )(sig, dsig, wq, corr_n, corr_p, corr_mask)
    # per-lane cotangent applied outside the kernel (cheap, fuses in XLA)
    g = gbar[None, None, :]
    return d_sig * g, d_dsig * g, d_wq * g, None, None, None


corridor_penalty.defvjp(_fwd_rule, _bwd_rule)


def corridor_cost_pallas(sig, dsig, singul, wq, corr_n, corr_p, corr_mask,
                         le, wei_obs, interpret: bool = False):
    """Adapter from bcost shapes to the kernel layout; returns cost [B].

    sig/dsig [S,N,K1,2,B]; singul [S,B]; wq [S,N,K1,B] (valid+segw folded);
    corr_n/p [S,N,K1,H,2,B]; corr_mask [S,N,K1,H,B] bool; le [E,2] numpy.
    """
    S, N, K1, _, B = sig.shape
    R = S * N * K1
    sgn = singul[:, None, None, None, :]
    sig_r = jnp.moveaxis(sig.reshape(R, 2, B), 1, 0)
    dsig_r = jnp.moveaxis((dsig * sgn).reshape(R, 2, B), 1, 0)
    wq_r = (wq * wei_obs).reshape(1, R, B)
    cn = jnp.moveaxis(corr_n.reshape(R, -1, 2, B), 0, 2)
    cp = jnp.moveaxis(corr_p.reshape(R, -1, 2, B), 0, 2)
    cm = jnp.moveaxis(corr_mask.astype(sig.dtype).reshape(R, -1, B), 0, 1)
    le_t = tuple(tuple(float(x) for x in row) for row in np.asarray(le))
    return corridor_penalty(sig_r, dsig_r, wq_r, cn, cp, cm, le_t, interpret)
