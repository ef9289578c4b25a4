"""Kernel-layout objective: the full trajectory-optimization cost as a pure
function over [R, TB]-shaped values, consumed inside the whole-solve Pallas
kernel (ops/pallas_solve.py) and testable standalone against ops/bcost.

Same math as cost.total_cost / ops/bcost.total_cost_b (which carry the
reference citations to traj_optimizer.cpp); this module reshapes it for the
TPU kernel:

  * The MINCO solve and the constraint-grid basis sampling collapse into ONE
    host-precomputed matrix per derivative order: sample values are
    P_o @ rhs with P_o = Beta_o · M  [R, 13], where M = [Mh | Mi | Mt] is the
    constant normalized-time MINCO inverse (minco.minco_maps) and rhs packs
    (scaled head PVA | inner waypoints | scaled tail PVA) per dimension. The
    jerk energy becomes the quadratic form dT^-5 · rhs^T Q rhs with
    Q = M^T J M — the 6N x 6N banded system never materializes on device.
  * The flattened sample axis is COMPACTED to the rows that carry quadrature
    weight (r_rows(dims); 168 for the bench class vs the 264 padded N*K1
    grid rows — interior pieces sample K+1=17 of the K1=33 padded columns,
    so ~38% of the padded grid is dead weight the round loop used to pay
    for). Active rows sit on sublanes (multiple of 8), the lane tile TB on
    the 128 lanes; x/y components are separate [r, TB] arrays; hull-vertex
    (E=4) and half-plane (H=4) axes are unrolled Python loops, exactly the
    layout proven out by ops/pallas_penalty.py.
  * Weights are compile-time floats (StaticW): the solve kernel retraces when
    limits change, which matches how configs are deployed (one weight set per
    fleet), and removes every scalar operand from the hot loop.

Supports any S: multi-gear segments are a static Python loop over the same
[R, TB] machinery, with gear-junction boundary overrides read from the
decision vector exactly as cost.boundary_states does
(costFunctionCallback:269-282).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dftpav_tpu import minco
from dftpav_tpu.basis import sample_grid
from dftpav_tpu.config import EngineFlags, resolve_vt_scale
from dftpav_tpu.cost import hull_arrays, smoothed_l1, virtual_to_real
from dftpav_tpu.types import Dims

DP = 16  # padded decision rows for the S=1 bench class (D = 15 at N=8)

_CH_CAP = 32  # chunk-size cap (24/32 measured best on v5e — PERF.md)


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def chunk_rows(R: int) -> int:
    """Largest 8-aligned chunk size <= _CH_CAP dividing the sample axis;
    the penalty integrator scans over chunks of this many rows (see
    eval_cost)."""
    for ch in range(_CH_CAP, 7, -8):
        if R % ch == 0:
            return ch
    return R


@functools.lru_cache(maxsize=None)
def _active_idx(n_s: int, K: int, Kdes: int) -> tuple:
    """Flattened sample-row indices (within the n_s*K1 padded grid of one
    segment) that carry nonzero quadrature weight. Rows outside this set
    (padded interior columns, excluded segment endpoints) contribute
    exactly zero cost and gradient — the kernel never materializes them."""
    grid = sample_grid(n_s, K, Kdes)
    omg_eff = (grid.omg * grid.inv_k[:, None] * grid.pen_mask).reshape(-1)
    return tuple(int(i) for i in np.nonzero(omg_eff > 0)[0])


def seg_active(dims: Dims, seg: int) -> int:
    """Number of weight-carrying sample rows of segment `seg`."""
    return len(_active_idx(dims.ns_tuple[seg], dims.K, dims.Kdes))


@functools.lru_cache(maxsize=None)
def _r_rows(ns_tuple: tuple, K: int, Kdes: int) -> int:
    active = max(len(_active_idx(n, K, Kdes)) for n in ns_tuple)
    # pad so an efficient chunk size divides evenly (minimize padded work
    # plus a small per-chunk loop-overhead penalty)
    best = None
    for ch in (32, 24, 16, 8):
        r = ch * (-(-active // ch))
        score = r + 4 * (r // ch)
        if best is None or score < best[0]:
            best = (score, r)
    return best[1]


def r_rows(dims: Dims) -> int:
    """Compacted, padded sample rows per segment slot (the kernel's sample
    axis; replaces the round-3/4 padded N*K1 grid)."""
    return _r_rows(dims.ns_tuple, dims.K, dims.Kdes)


def seg_chunks(dims: Dims, seg: int) -> int:
    """Chunks needed to cover segment `seg`'s active sample rows (rows past
    its active count are zero-padding shared with longer slots)."""
    CH = chunk_rows(r_rows(dims))
    return -(-seg_active(dims, seg) // CH)


def dp_of(dims: Dims) -> int:
    """Padded decision-variable rows (sublane multiple of 8)."""
    return max(_pad8(dims.dim), 16)


def bnd_rows(dims: Dims) -> int:
    """Padded boundary-slab rows: 12 per segment (6 head + 6 tail)."""
    return _pad8(12 * dims.S)


def misc_rows(dims: Dims) -> int:
    """singul[S] | seg_mask[S] | obs_dt[O] | obs_rel_t0[O] | obs_mask[O]."""
    return _pad8(2 * dims.S + 3 * dims.O)


@dataclasses.dataclass(frozen=True)
class StaticW:
    """Compile-time scalar parameters (types.Weights flattened to floats)."""

    wei_obs: float
    wei_surround: float
    wei_feas: float
    wei_time: float
    max_forward_vel: float
    max_forward_acc: float
    max_forward_cur: float
    max_backward_vel: float
    max_backward_acc: float
    max_backward_cur: float
    surround_clearance: float
    non_sinv: float
    mini_t: float
    epis: float
    lse_alpha: float
    cost_scale: float
    veh_len: float
    le: tuple          # ((x, y) * E) hull vertices, clockwise
    e_hat: tuple       # unit edge vectors ((x, y) * E)

    @staticmethod
    def build(w, cfg, concrete: bool = True) -> "StaticW":
        """concrete=True bakes weights as Python floats (required inside the
        Pallas kernel — scalar operands are compile-time); concrete=False
        keeps them traced (fine for the plain-XLA round loop, where weights
        may be jit arguments)."""
        le_np, delta_np, veh_len = hull_arrays(cfg)
        dl = delta_np / np.linalg.norm(delta_np, axis=-1, keepdims=True)
        f = (lambda v: float(np.asarray(v))) if concrete else (lambda v: v)
        return StaticW(
            wei_obs=f(w.wei_obs), wei_surround=f(w.wei_surround),
            wei_feas=f(w.wei_feas), wei_time=f(w.wei_time),
            max_forward_vel=f(w.max_forward_vel),
            max_forward_acc=f(w.max_forward_acc),
            max_forward_cur=f(w.max_forward_cur),
            max_backward_vel=f(w.max_backward_vel),
            max_backward_acc=f(w.max_backward_acc),
            max_backward_cur=f(w.max_backward_cur),
            surround_clearance=f(w.surround_clearance),
            non_sinv=f(w.non_sinv),
            mini_t=f(w.mini_t), epis=f(w.epis), lse_alpha=f(w.lse_alpha),
            cost_scale=float(cfg.opt.cost_scale), veh_len=float(veh_len),
            le=tuple((float(a), float(b)) for a, b in le_np),
            e_hat=tuple((float(a), float(b)) for a, b in dl),
        )


class KConsts(NamedTuple):
    """Shared (lane-independent) constants, passed once per kernel program.

    Per-SEGMENT leading axis: segment s's maps are built for its own piece
    count dims.ns_tuple[s] (the reference's adaptive piecing,
    traj_manager.cpp:543), compacted to its weight-carrying sample rows and
    zero-padded to the class's uniform rows R = r_rows(dims) and rhs rows
    C = N+5 — padded sample rows carry zero quadrature weight, padded rhs
    rows multiply zero columns."""

    P: jnp.ndarray        # [S, 3, R, C] sample maps for orders 0..2
    Q: jnp.ndarray        # [S, Cq, C]   jerk quadratic form (padded rows 0)
    gridc: jnp.ndarray    # [S, 2, R, 1] rows: omg*inv_k (0 on masked), frac


class KScenario(NamedTuple):
    """Per-lane problem slabs, lane axis minor.

    Segment axes are flattened: bnd packs 12 rows per segment (6 head then
    6 tail, px py vx vy ax ay interleaved x/y); the corridor slabs carry
    S*R sample rows (segment-major)."""

    bnd: jnp.ndarray      # [bnd_rows(dims), B]
    misc: jnp.ndarray     # [misc_rows(dims), B] singul[S] | seg_mask[S] | obs*
    corr_n: jnp.ndarray   # [H, 2, S*R, B]
    corr_p: jnp.ndarray   # [H, 2, S*R, B]
    corr_m: jnp.ndarray   # [H, S*R, B] float
    obs_c: jnp.ndarray    # [O, 2, 6*Po, B] normalized coeffs, row 6*p + c


@functools.lru_cache(maxsize=None)
def _host_constants(n_s: int, N: int, K: int, Kdes: int, r_pad: int):
    """Sample maps / jerk form / quadrature rows for ONE segment with n_s
    pieces, COMPACTED to its weight-carrying sample rows (_active_idx) and
    zero-padded to the class's r_pad rows and C = N+5 rhs rows."""
    grid = sample_grid(n_s, K, Kdes)
    K1 = grid.tau.shape[1]
    R_s = n_s * K1
    idx = np.asarray(_active_idx(n_s, K, Kdes), np.int64)
    C = N + 5
    Mh, Mi, Mt = minco.minco_maps(n_s)
    M = np.concatenate([Mh, Mi, Mt], axis=1)           # [6n, n+5]
    P = np.zeros((3, r_pad, C))
    for o in range(3):
        beta = grid.beta[o]                            # [n, K1, 6]
        big = np.zeros((R_s, 6 * n_s))
        for n in range(n_s):
            big[n * K1:(n + 1) * K1, 6 * n:6 * n + 6] = beta[n]
        P[o, :idx.size, :n_s + 5] = (big @ M)[idx]
    # jerk quadratic form: E = dT^-5 * rhs^T (M^T J M) rhs per dimension
    J = np.zeros((6 * n_s, 6 * n_s))
    blk = np.array([[36.0, 72.0, 120.0],
                    [72.0, 192.0, 360.0],
                    [120.0, 360.0, 720.0]])
    for n in range(n_s):
        J[6 * n + 3:6 * n + 6, 6 * n + 3:6 * n + 6] = blk
    Q = M.T @ J @ M                                    # [n+5, n+5]
    Qp = np.zeros((max(16, _pad8(C)), C))
    Qp[:n_s + 5, :n_s + 5] = Q
    omg_eff = np.zeros((r_pad, 1))
    omg_eff[:idx.size] = (grid.omg * grid.inv_k[:, None]
                          * grid.pen_mask).reshape(R_s, 1)[idx]
    frac = np.zeros((r_pad, 1))
    frac[:idx.size] = grid.frac.reshape(R_s, 1)[idx]
    gridc = np.stack([omg_eff, frac])                  # [2, r_pad, 1]
    return P, Qp, gridc


def make_consts(dims: Dims, dtype=jnp.float32) -> KConsts:
    r_pad = r_rows(dims)
    per_seg = [_host_constants(n_s, dims.N, dims.K, dims.Kdes, r_pad)
               for n_s in dims.ns_tuple]
    return KConsts(
        P=jnp.asarray(np.stack([c[0] for c in per_seg]), dtype),
        Q=jnp.asarray(np.stack([c[1] for c in per_seg]), dtype),
        gridc=jnp.asarray(np.stack([c[2] for c in per_seg]), dtype))


def prep_scenario(batch, dims: Dims, dtype=jnp.float32) -> KScenario:
    """Batch-major Scenario (leading [B]) -> kernel slabs (lane minor).

    Corridor slabs are gathered onto the compacted sample rows (r_rows):
    segment s's first seg_active(s) rows are its weight-carrying samples in
    grid order; padded rows reuse row 0's planes but carry zero quadrature
    weight (gridc), so they never contribute."""
    B = batch.ini_state.shape[0]
    S, K1 = dims.S, dims.K1
    R = r_rows(dims)
    f = lambda a: jnp.asarray(a, dtype)

    # per-segment gather map: padded grid row index for each compacted row
    gather = np.zeros((S, R), np.int32)
    for s, n_s in enumerate(dims.ns_tuple):
        idx = np.asarray(_active_idx(n_s, dims.K, dims.Kdes), np.int32)
        gather[s, :idx.size] = idx
    gather_j = jnp.asarray(gather)

    bnd = jnp.zeros((bnd_rows(dims), B), dtype)
    for s in range(S):
        head = f(batch.ini_state[:, s])                 # [B, 2, 3]
        tail = f(batch.fin_state[:, s])
        base = 12 * s
        for c in range(3):
            bnd = bnd.at[base + 2 * c].set(head[:, 0, c])
            bnd = bnd.at[base + 2 * c + 1].set(head[:, 1, c])
            bnd = bnd.at[base + 6 + 2 * c].set(tail[:, 0, c])
            bnd = bnd.at[base + 6 + 2 * c + 1].set(tail[:, 1, c])

    O = dims.O
    misc = jnp.zeros((misc_rows(dims), B), dtype)
    for s in range(S):
        misc = misc.at[s].set(f(batch.singul[:, s]))
        misc = misc.at[S + s].set(f(batch.seg_mask[:, s]))
    ob = 2 * S
    for o in range(O):
        misc = misc.at[ob + o].set(f(batch.obs_dt[:, o]))
        misc = misc.at[ob + O + o].set(f(batch.obs_rel_t0[:, o]))
        misc = misc.at[ob + 2 * O + o].set(f(batch.obs_mask[:, o]))

    # [B, S, N, K1, ...] --gather active rows--> [B, S*R, ...]
    def compact(a):
        a = a.reshape(B, S, dims.N * K1, *a.shape[4:])
        idx = gather_j.reshape(1, S, R, *([1] * (a.ndim - 3)))
        out = jnp.take_along_axis(a, idx, axis=2)
        return out.reshape(B, S * R, *a.shape[3:])

    cn = jnp.transpose(compact(f(batch.corr_n)), (2, 3, 1, 0))  # [H,2,SR,B]
    cp = jnp.transpose(compact(f(batch.corr_p)), (2, 3, 1, 0))
    cm = jnp.transpose(compact(f(batch.corr_mask)), (2, 1, 0))  # [H,SR,B]
    if O > 0:
        obs = f(batch.obs_coef)                         # [B, O, Po, 6, 2]
        # rows 6p+c per dim: [B,O,Po,6,2] -> [O, 2, Po*6, B]
        obs_c = jnp.transpose(obs, (1, 4, 2, 3, 0)).reshape(
            O, 2, dims.Po * 6, B)
    else:
        obs_c = jnp.zeros((1, 2, dims.Po * 6, B), dtype)
    return KScenario(bnd=bnd, misc=misc, corr_n=cn, corr_p=cp, corr_m=cm,
                     obs_c=obs_c)


def _lse_max(vals):
    m = vals[0]
    for v in vals[1:]:
        m = jnp.maximum(m, v)
    return m


def _neg_lse_over(vals, alpha):
    """-logsumexp(-alpha * v_i)/alpha, stable (soft-min of the list)."""
    neg = [-alpha * v for v in vals]
    m = _lse_max(neg)
    s = 0.0
    for v in neg:
        s = s + jnp.exp(v - m)
    return -(jnp.log(s) + m) / alpha


def _pos_lse_over(vals, alpha):
    """logsumexp(alpha * v_i)/alpha (soft-max of the list)."""
    pos = [alpha * v for v in vals]
    m = _lse_max(pos)
    s = 0.0
    for v in pos:
        s = s + jnp.exp(v - m)
    return (jnp.log(s) + m) / alpha




def _ckpt(f):
    """Rematerializing wrapper: save only the inputs in the forward pass and
    recompute `f` inside the backward (jax.checkpoint semantics). Written as
    a custom_vjp because jax.checkpoint introduces a `remat2` primitive the
    Pallas TPU lowering cannot handle; custom_vjp inlines to plain ops."""

    @jax.custom_vjp
    def g(*args):
        return f(*args)

    def fwd(*args):
        return f(*args), args

    def bwd(args, ct):
        _, vjp = jax.vjp(f, *args)
        return vjp(ct)

    g.defvjp(fwd, bwd)
    return g


def _dotc(A, Bm, dtype):
    return jax.lax.dot_general(A, Bm, (((1,), (0,)), ((), ())),
                               preferred_element_type=dtype)


def _dot3(A, Bm, dtype):
    """3-pass bf16-split matmul: ~f32 product precision at half the cost of
    Mosaic's fp32 contract (which the TPU MXU implements as ~6 bf16 passes).

    Dekker-style operand split: a = a_hi + a_lo with a_hi = bf16(a) (top 8
    mantissa bits) and a_lo = bf16(a - a_hi) (next 8); the a_lo*b_lo term
    (~2^-32 relative) is dropped. Result error ~2^-17 relative — far below
    every tolerance in the solver (past-delta 1e-4, g_epsilon) — vs ~2^-8
    for a single bf16 pass, which is what broke the line search (PERF.md:
    cost p50 +32%, premature STOP). Each pass is a native-rate bf16 MXU
    matmul with f32 accumulation (explicit DEFAULT precision overrides any
    ambient float32 forcing)."""
    prec = jax.lax.Precision.DEFAULT
    dot = lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())), preferred_element_type=dtype,
        precision=prec)
    a_hi = A.astype(jnp.bfloat16)
    a_lo = (A - a_hi.astype(dtype)).astype(jnp.bfloat16)
    b_hi = Bm.astype(jnp.bfloat16)
    b_lo = (Bm - b_hi.astype(dtype)).astype(jnp.bfloat16)
    return dot(a_hi, b_hi) + (dot(a_hi, b_lo) + dot(a_lo, b_hi))


def _dotx(A, Bm, dtype, mxu: str):
    """Objective-matmul dispatch: "x3" -> 3-pass split; anything else ->
    plain dot under the ambient matmul-precision context."""
    return _dot3(A, Bm, dtype) if mxu == "x3" else _dotc(A, Bm, dtype)


def _pre(x, sc: KScenario, sw: StaticW, dims: Dims,
         vt_scale: tuple | None = None):
    """Decision vector -> per-segment solver inputs.

    Returns (rhs_x, rhs_y, dT, tt, T): tuples of S arrays ([13, TB] rhs per
    dimension with gear-junction overrides, per-piece duration, cumulative
    absolute-time offset, total segment duration). Differentiable; the
    chunked integrator's cotangents flow back through ONE jax.vjp of this.

    vt_scale: per-segment-slot virtual-time sigma (config.resolve_vt_scale)
    — the decision vector stores slot s's time coordinate as vt / sigma_s
    (pallas_solve._prep packs it that way), rebalancing the O(1) times
    against the meter-scale waypoints; this is where it multiplies back.
    """
    S, N = dims.S, dims.N
    dtype = x.dtype
    n_in = 2 * S * (N - 1)

    # Route every decision-variable read through an identity matmul: the
    # VJP of direct row slices (x[i]) accumulates the gradient through
    # pad/scatter transposes whose offset layouts Mosaic cannot ADD-reduce
    # over ("input layout must have zero offsets over dimensions being
    # reduced"); with the copy, the gradient materializes as ident^T @ cot
    # — a matmul output with a standard zero-offset layout.
    dp = x.shape[0]
    ident = (jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
             ).astype(dtype)
    x = _dotc(ident, x, dtype)

    sig = vt_scale if vt_scale is not None else (1.0,) * S
    vt = [x[n_in + s] * sig[s] for s in range(S)]        # S x [TB]
    T = [virtual_to_real(v, sw.mini_t) for v in vt]
    gp_row = lambda j, d: n_in + S + 2 * j + d
    ga = [x[n_in + S + 2 * (S - 1) + j] for j in range(S - 1)]
    jm = [sc.misc[S + s] > 0.5 for s in range(S)]        # seg_mask as bool

    ns = dims.ns_tuple
    rhs_x, rhs_y, dTs, tts = [], [], [], []
    trajtime = jnp.zeros_like(T[0])
    for seg in range(S):
        n_seg = ns[seg]
        dT = T[seg] / n_seg
        dT2 = dT * dT
        base = 12 * seg

        # rhs per dimension [13, TB]: scaled head PVA | inner | scaled tail
        # PVA, with junction overrides (pos/vel from the gear variables,
        # cost.boundary_states semantics / costFunctionCallback:269-282)
        def rhs_dim(d):
            hp, hv, ha = sc.bnd[base + d], sc.bnd[base + 2 + d], \
                sc.bnd[base + 4 + d]
            tp, tv, ta = sc.bnd[base + 6 + d], sc.bnd[base + 8 + d], \
                sc.bnd[base + 10 + d]
            if seg > 0:
                j = seg - 1
                gdir = jnp.cos(ga[j]) if d == 0 else jnp.sin(ga[j])
                hp = jnp.where(jm[seg], x[gp_row(j, d)], hp)
                hv = jnp.where(jm[seg], -sw.non_sinv * gdir, hv)
            if seg < S - 1:
                j = seg
                gdir = jnp.cos(ga[j]) if d == 0 else jnp.sin(ga[j])
                tp = jnp.where(jm[seg + 1], x[gp_row(j, d)], tp)
                tv = jnp.where(jm[seg + 1], sw.non_sinv * gdir, tv)
            # segment uses its own piece count: n_seg - 1 inner waypoints
            # from the segment's packed slots, rhs zero-padded to the
            # class-uniform C = N + 5 rows (P's padded columns are zero)
            rows = [hp, hv * dT, ha * dT2]
            rows += [x[2 * ((N - 1) * seg + jj) + d]
                     for jj in range(n_seg - 1)]
            rows += [tp, tv * dT, ta * dT2]
            rows += [jnp.zeros_like(hp)] * (N - n_seg)
            return jnp.stack(rows)

        rhs_x.append(rhs_dim(0))
        rhs_y.append(rhs_dim(1))
        dTs.append(dT)
        tts.append(trajtime)
        trajtime = trajtime + T[seg]

    return tuple(rhs_x), tuple(rhs_y), tuple(dTs), tuple(tts), tuple(T)


def _smooth_from_vals(vals, sc: KScenario, kc: KConsts, sw: StaticW,
                      dims: Dims, mxu: str = "f32"):
    """Jerk energy + time cost from _pre outputs, seg-mask weighted."""
    rhs_x, rhs_y, dTs, _tts, T = vals
    S = dims.S
    dtype = rhs_x[0].dtype
    f = 0.0
    for seg in range(S):
        Q = kc.Q[seg][:rhs_x[0].shape[0]]              # [N+5, N+5]
        invdT = 1.0 / dTs[seg]
        jerk = (jnp.sum(rhs_x[seg] * _dotx(Q, rhs_x[seg], dtype, mxu),
                        axis=0)
                + jnp.sum(rhs_y[seg] * _dotx(Q, rhs_y[seg], dtype, mxu),
                          axis=0)
                ) * invdT ** 5
        segw = sc.misc[S + seg] if S > 1 else 1.0
        f = f + segw * (jerk + sw.wei_time * T[seg])
    return f


def _make_chunk_fn(sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims,
                   seg: int, mxu: str = "f32", obs_ckpt: bool = False):
    """Penalty integrand for one CH-row chunk of one segment.

    Returns fn(c, rhs_x [13, TB], rhs_y, dT [TB], tt [TB]) -> cost [TB]
    (unweighted by seg_mask). Every per-row constant is dynamic-sliced per
    chunk so the caller can loop the chunk index with lax control flow.
    """
    S, H, O, Po = dims.S, dims.H, dims.O, dims.Po
    R = r_rows(dims)
    CH = chunk_rows(R)
    omg_eff = kc.gridc[seg, 0]                           # [R, 1]
    frac = kc.gridc[seg, 1]
    alpha = sw.lse_alpha
    d_min = sw.surround_clearance + float(np.log(8.0)) / alpha
    E = len(sw.le)
    ob = 2 * S
    segR = seg * R

    def chunk_cost(c, rhs_x, rhs_y, dTc, ttc):
        dtype = rhs_x.dtype
        row0 = c * CH
        if isinstance(c, int):
            # static chunk (Pallas kernel path: the TC lowering has no
            # dynamic_slice primitive, so the chunk loop is unrolled with
            # plain slices there)
            dsl = lambda a: a[row0:row0 + CH]
            crs = lambda a, ax: jax.lax.slice_in_dim(a, segR + row0,
                                                     segR + row0 + CH, 1, ax)
        else:
            dsl = lambda a: jax.lax.dynamic_slice_in_dim(a, row0, CH, 0)
            crs = lambda a, ax: jax.lax.dynamic_slice_in_dim(
                a, segR + row0, CH, ax)
        P0c, P1c, P2c = (dsl(kc.P[seg, 0]), dsl(kc.P[seg, 1]),
                         dsl(kc.P[seg, 2]))
        omg_c = dsl(omg_eff)                             # [CH, 1]
        frac_c = dsl(frac)

        sig_x = _dotx(P0c, rhs_x, dtype, mxu)            # [CH, TB]
        sig_y = _dotx(P0c, rhs_y, dtype, mxu)
        invdTr = (1.0 / dTc)[None]
        dsx = _dotx(P1c, rhs_x, dtype, mxu) * invdTr
        dsy = _dotx(P1c, rhs_y, dtype, mxu) * invdTr
        dd = invdTr * invdTr
        ddx = _dotx(P2c, rhs_x, dtype, mxu) * dd
        ddy = _dotx(P2c, rhs_y, dtype, mxu) * dd

        vn2 = dsx * dsx + dsy * dsy
        valid = (omg_c > 0.0) & (vn2 >= 1e-8)            # |dsig| >= 1e-4
        safe_vn2 = jnp.where(valid, vn2, 1.0)
        inv_vn = jax.lax.rsqrt(safe_vn2)
        vel2_reci = 1.0 / safe_vn2
        vel2_reci_e = 1.0 / (safe_vn2 + sw.epis)
        vel32_reci_e = vel2_reci_e * jnp.sqrt(vel2_reci_e)
        wq = jnp.where(valid, omg_c * dTc[None], 0.0)    # [CH, TB]

        sgl = sc.misc[seg][None]                         # [1, TB] ±1
        fwd = sgl > 0.0
        max_vel = jnp.where(fwd, sw.max_forward_vel, sw.max_backward_vel)
        max_acc = jnp.where(fwd, sw.max_forward_acc, sw.max_backward_acc)
        max_cur = jnp.where(fwd, sw.max_forward_cur, sw.max_backward_cur)

        # ego rotation R = sgl * [[u, -v], [v, u]], u/v = normalized dsig
        u = dsx * inv_vn * sgl
        v = dsy * inv_vn * sgl

        # --- static corridor penalty (traj_optimizer.cpp:592-622) ---
        # chunk slices are taken OUTSIDE the _ckpt functions and passed as
        # arguments: closures over the chunk-index-derived offset leak
        # tracers out of custom_vjp (UnexpectedTracerError)
        cn_c = crs(sc.corr_n, 2)
        cp_c = crs(sc.corr_p, 2)
        cm_c = crs(sc.corr_m, 1)

        @_ckpt
        def corridor_cost(sig_x, sig_y, u, v, wq, cn_c, cp_c, cm_c):
            acc_obs = 0.0
            for e in range(E):
                lex, ley = sw.le[e]
                bx = sig_x + u * lex - v * ley
                by = sig_y + v * lex + u * ley
                for h in range(H):
                    viol = cn_c[h, 0] * (bx - cp_c[h, 0]) \
                        + cn_c[h, 1] * (by - cp_c[h, 1])
                    acc_obs = acc_obs + smoothed_l1(viol) * cm_c[h]
            return jnp.sum(wq * acc_obs, axis=0)

        cost_obs = sw.wei_obs * corridor_cost(sig_x, sig_y, u, v, wq,
                                              cn_c, cp_c, cm_c)

        # --- feasibility (traj_optimizer.cpp:642-705) ---
        z_h1 = ddx * dsx + ddy * dsy
        z_h3 = ddy * dsx - ddx * dsy
        viola_vel = vn2 - max_vel * max_vel
        viola_acc = z_h1 * z_h1 * vel2_reci - max_acc * max_acc
        cur = z_h3 * vel32_reci_e
        feas = (smoothed_l1(viola_vel) + smoothed_l1(viola_acc)
                + 10.0 * (smoothed_l1(cur - max_cur)
                          + smoothed_l1(-cur - max_cur)))
        cost_feas = sw.wei_feas * jnp.sum(wq * feas, axis=0)

        # --- dynamic obstacles (traj_optimizer.cpp:1311-1684) ---
        def obstacle_cost(o, sig_x, sig_y, u, v, wq, dT, trajtime, valid,
                          frac_c):
            dtype = sig_x.dtype
            dt_o = sc.misc[ob + o][None]                 # [1, TB]
            rel_t0 = sc.misc[ob + O + o][None]
            mask_o = sc.misc[ob + 2 * O + o][None] > 0.5
            pt_time = rel_t0 + trajtime[None] + frac_c * dT[None]
            total = dt_o * Po
            inside = pt_time < total
            ft = jnp.minimum(pt_time, total) / dt_o
            idxf = jnp.clip(jnp.floor(ft), 0.0, Po - 1.0)
            tau = ft - idxf

            cx, cy = sc.obs_c[o, 0], sc.obs_c[o, 1]      # [6*Po, TB]

            # in-horizon piecewise quintic (one-hot piece select)
            def horner(tau_v, sel_fn, order):
                px = 0.0
                py = 0.0
                for pp in range(Po):
                    ss = sel_fn(pp)
                    hx = 0.0
                    hy = 0.0
                    for cdeg in range(5, order - 1, -1):
                        kf = 1.0
                        for r in range(order):
                            kf *= (cdeg - r)
                        hx = hx * tau_v + kf * cx[6 * pp + cdeg][None]
                        hy = hy * tau_v + kf * cy[6 * pp + cdeg][None]
                    px = px + ss * hx
                    py = py + ss * hy
                return px, py

            sel_in = lambda pp: (idxf == pp).astype(dtype)
            p_in_x, p_in_y = horner(tau, sel_in, 0)
            inv_dt_o = 1.0 / dt_o

            # end state (tau = 1 on the last piece), const-acc extrapolation
            pe_x = pe_y = ve_x = ve_y = ae_x = ae_y = 0.0
            for cdeg in range(6):
                pe_x = pe_x + cx[6 * (Po - 1) + cdeg][None]
                pe_y = pe_y + cy[6 * (Po - 1) + cdeg][None]
                if cdeg >= 1:
                    ve_x = ve_x + cdeg * cx[6 * (Po - 1) + cdeg][None]
                    ve_y = ve_y + cdeg * cy[6 * (Po - 1) + cdeg][None]
                if cdeg >= 2:
                    ae_x = ae_x \
                        + cdeg * (cdeg - 1) * cx[6 * (Po - 1) + cdeg][None]
                    ae_y = ae_y \
                        + cdeg * (cdeg - 1) * cy[6 * (Po - 1) + cdeg][None]
            ve_x, ve_y = ve_x * inv_dt_o, ve_y * inv_dt_o
            ae_x = ae_x * inv_dt_o * inv_dt_o
            ae_y = ae_y * inv_dt_o * inv_dt_o
            ex = jnp.maximum(pt_time - total, 0.0)
            pex_x = pe_x + ex * ve_x + 0.5 * ex * ex * ae_x
            pex_y = pe_y + ex * ve_y + 0.5 * ex * ex * ae_y

            p_u_x = jnp.where(inside, p_in_x, pex_x)
            p_u_y = jnp.where(inside, p_in_y, pex_y)

            # rotation frame: polynomial extrapolation of the last piece
            tau_r = jnp.where(inside, tau, 1.0 + ex / dt_o)

            # select on floats: a mixed bool-array/python-bool where()
            # lowers to an i8->i1 truncation Mosaic rejects
            def sel_r(pp):
                ss = (idxf == pp).astype(dtype)
                return jnp.where(inside, ss, 1.0 if pp == Po - 1 else 0.0)
            v_r_x, v_r_y = horner(tau_r, sel_r, 1)
            # rsqrt of the CLAMPED squared norm: sqrt(x) at x == 0 has an
            # infinite derivative, and a masked zero-coefficient obstacle
            # slot then NaN-poisons the whole gradient through the
            # where-select (0 * inf)
            vrn2 = v_r_x * v_r_x + v_r_y * v_r_y
            inv_vrn = jax.lax.rsqrt(jnp.maximum(vrn2, 1e-24))
            uo = v_r_x * inv_vrn
            vo = v_r_y * inv_vrn

            rel_x = p_u_x - sig_x
            rel_y = p_u_y - sig_y
            near = rel_x * rel_x + rel_y * rel_y <= (1.5 * sw.veh_len) ** 2

            # hull geometry: ego normals/vertices use (u, v), obstacle
            # (uo, vo)
            He, Ho, Rle, Rlo = [], [], [], []
            for e in range(E):
                ehx, ehy = sw.e_hat[e]
                lex, ley = sw.le[e]
                He.append((-v * ehx - u * ehy, u * ehx - v * ehy))
                Ho.append((-vo * ehx - uo * ehy, uo * ehx - vo * ehy))
                Rle.append((u * lex - v * ley, v * lex + u * ley))
                Rlo.append((uo * lex - vo * ley, vo * lex + uo * ley))

            d_all = []
            for e in range(E):
                hx, hy = He[e]
                d_tilde = hx * (rel_x - Rle[e][0]) + hy * (rel_y - Rle[e][1])
                cross = [hx * Rlo[f2][0] + hy * Rlo[f2][1]
                         for f2 in range(E)]
                d_all.append(_neg_lse_over(cross, alpha) + d_tilde)
            for f2 in range(E):
                hx, hy = Ho[f2]
                d_tilde = hx * (-rel_x - Rlo[f2][0]) \
                    + hy * (-rel_y - Rlo[f2][1])
                cross = [hx * Rle[e][0] + hy * Rle[e][1] for e in range(E)]
                d_all.append(_neg_lse_over(cross, alpha) + d_tilde)

            d_val = d_min - _pos_lse_over(d_all, alpha)
            gate = near & mask_o & valid
            pen_d = jnp.where(gate, smoothed_l1(d_val), 0.0)
            return jnp.sum(wq * pen_d, axis=0)

        cost_dyn = 0.0
        # no-remat default: the per-chunk obstacle block fits VMEM without
        # rematerialization (the 165-184 MB spills were the MONOLITHIC
        # whole-program VJP), and skipping the recompute measures +3%
        # throughput with a faster compile; EngineFlags.obs_ckpt restores it
        obs_wrap = _ckpt if obs_ckpt else (lambda f: f)
        for o in range(O):
            cost_dyn = cost_dyn + obs_wrap(
                functools.partial(obstacle_cost, o))(
                sig_x, sig_y, u, v, wq, dTc, ttc, valid, frac_c)
        cost_dyn = sw.wei_surround * cost_dyn

        return cost_obs + cost_feas + cost_dyn

    return chunk_cost


def eval_cost(x, sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims,
              flags: EngineFlags | None = None):
    """Scaled objective per lane: x [dp_of(dims), TB] -> f [TB].

    Pure jnp on values — identical trace inside the Pallas kernel and in
    plain XLA (used by tests for parity against ops/bcost). Segments are a
    static Python loop; gear-junction boundary overrides come from the
    decision vector gated on seg_mask (cost.boundary_states semantics);
    absolute time for the dynamic-obstacle penalty is the true cumulative
    sum of segment durations (the reference's trajtimes quirk is vmap-only).
    The penalty integrator runs as a counter-carry lax.scan over CH-row
    chunks (see _make_chunk_fn / eval_fg).
    """
    flags = flags or EngineFlags()
    mxu = flags.mxu
    S = dims.S
    vals = _pre(x, sc, sw, dims,
                resolve_vt_scale(flags.vt_scale, dims.ns_tuple))
    rhs_x, rhs_y, dTs, tts, _T = vals
    f = _smooth_from_vals(vals, sc, kc, sw, dims, mxu)
    for seg in range(S):
        fn = _make_chunk_fn(sc, kc, sw, dims, seg, mxu, flags.obs_ckpt)
        segw = sc.misc[S + seg] if S > 1 else 1.0

        def body(carry, _):
            acc, c = carry
            return (acc + fn(c, rhs_x[seg], rhs_y[seg], dTs[seg], tts[seg]),
                    c + 1), None

        (pen, _), _ = jax.lax.scan(
            body, (jnp.zeros_like(f), jnp.asarray(0, jnp.int32)), None,
            length=seg_chunks(dims, seg))
        f = f + segw * pen
    return sw.cost_scale * f


def eval_fg(x, sc: KScenario, kc: KConsts, sw: StaticW, dims: Dims,
            unroll_chunks: bool = False, flags: EngineFlags | None = None):
    """(f [TB], g [dp, TB]) with the gradient assembled chunk-by-chunk.

    jax.vjp(eval_cost) would stack every chunk's residuals through the scan
    (extensive outputs the Pallas lowering rejects, and 165 MB of VMEM spill
    when unrolled); instead each chunk's VJP runs INSIDE a fori_loop body,
    accumulating cotangents w.r.t. the per-segment _pre outputs, and one
    outer vjp of _pre maps those back to x. Values and gradients match
    jax.grad of eval_cost to float-rounding (asserted in
    tests/test_megakernel.py).
    """
    flags = flags or EngineFlags()
    mxu = flags.mxu
    S = dims.S
    dtype = x.dtype
    vt_scale = resolve_vt_scale(flags.vt_scale, dims.ns_tuple)

    vals, vjp_pre = jax.vjp(lambda xv: _pre(xv, sc, sw, dims, vt_scale), x)
    rhs_x, rhs_y, dTs, tts, _T = vals

    fs, vjp_s = jax.vjp(
        lambda v: _smooth_from_vals(v, sc, kc, sw, dims, mxu), vals)
    # ones_like (not jnp.ones(shape)): under shard_map with check_vma the
    # cotangent must carry the same varying-manual-axes type as the output
    ones = jnp.ones_like(fs)
    cots = vjp_s(ones)[0]
    f = fs

    crx, cry, cdt, ctt = (list(cots[0]), list(cots[1]), list(cots[2]),
                          list(cots[3]))
    for seg in range(S):
        fn = _make_chunk_fn(sc, kc, sw, dims, seg, mxu, flags.obs_ckpt)
        segw = sc.misc[S + seg] if S > 1 else ones

        def body(c, carry):
            facc, gx, gy, gd, gt = carry
            fc, vjp_c = jax.vjp(
                lambda a, b, d, t: fn(c, a, b, d, t),
                rhs_x[seg], rhs_y[seg], dTs[seg], tts[seg])
            dgx, dgy, dgd, dgt = vjp_c(segw * jnp.ones_like(fc))
            return (facc + segw * fc, gx + dgx, gy + dgy, gd + dgd,
                    gt + dgt)

        zero = (jnp.zeros_like(fs), jnp.zeros_like(rhs_x[seg]),
                jnp.zeros_like(rhs_y[seg]), jnp.zeros_like(dTs[seg]),
                jnp.zeros_like(tts[seg]))
        n_chunks = seg_chunks(dims, seg)
        if unroll_chunks:
            carry = zero
            for c in range(n_chunks):
                carry = body(c, carry)
            pen, gx, gy, gd, gt = carry
        else:
            pen, gx, gy, gd, gt = jax.lax.fori_loop(0, n_chunks, body, zero)
        f = f + pen
        crx[seg] = crx[seg] + gx
        cry[seg] = cry[seg] + gy
        cdt[seg] = cdt[seg] + gd
        ctt[seg] = ctt[seg] + gt

    (g,) = vjp_pre((tuple(crx), tuple(cry), tuple(cdt), tuple(ctt),
                    cots[4]))

    # padded decision rows carry no cost: zero their (already-zero) grads
    # defensively so L-BFGS reductions stay exact
    n_var = dims.dim
    dp = x.shape[0]
    if dp > n_var:
        row = jax.lax.broadcasted_iota(jnp.int32, (dp, 1), 0)
        g = jnp.where(row < n_var, g, 0.0)
    return sw.cost_scale * f, sw.cost_scale * g
