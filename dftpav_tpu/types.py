"""Core pytree data structures.

The reference keeps per-plan state in ragged C++ containers
(std::vector<Eigen::MatrixXd> in traj_optimizer.h:80-92, FlatTrajData /
SurroundTrajData in traj_container.hpp:18-81). For XLA we use *static* shapes:
a problem class is fixed by ``Dims`` (segment count S, pieces per segment N,
max constraint samples K+1, corridor planes H, obstacles O with Po pieces) and
ragged reality is expressed with masks. Batched problems are simply these
pytrees with a leading [B] axis (constructed via vmap/stack), so every solver
entry point is written for a single scenario and batched with `jax.vmap`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Dims:
    """Static problem dimensions (compile-time constants).

    S:   number of gear segments ("trajnum" in traj_optimizer.cpp:13)
    N:   pieces per segment (the array/packing width; every per-piece array
         is shaped for N pieces per segment)
    Ns:  optional per-SEGMENT piece counts (tuple of S ints, each <= N and
         dividing N) — the static-shape form of the reference's adaptive
         piecing (max(round(dur/1s), 2), traj_manager.cpp:543). A short
         gear segment solved on fewer pieces avoids the dT^-5 jerk blowup
         that over-piecing causes (PERF.md multi-gear diagnosis). Arrays
         keep their uniform [S, N, ...] shapes; segment s only uses its
         first Ns[s] pieces / Ns[s]-1 inner waypoints, and solution
         coefficients are exactly re-subdivided back onto N uniform pieces
         (ops/kcost + pallas_solve._finalize). None = uniform N.
    K:   interior-piece constraint resolution (traj_resolution, 16)
    Kdes: first/last-piece constraint resolution (destraj_resolution, 32)
    H:   max hyperplanes per corridor polytope (4 for rectangle corridors)
    O:   max dynamic obstacles
    Po:  pieces per dynamic-obstacle polynomial trajectory
    """

    S: int = 1
    N: int = 8
    K: int = 16
    Kdes: int = 32
    H: int = 4
    O: int = 0
    Po: int = 8
    Ns: tuple | None = None

    def __post_init__(self):
        if self.Ns is not None:
            ns = tuple(int(n) for n in self.Ns)
            assert len(ns) == self.S, (ns, self.S)
            assert all(2 <= n <= self.N and self.N % n == 0 for n in ns), \
                f"each Ns entry must be in [2, N] and divide N: {ns}"
            object.__setattr__(self, "Ns", ns)

    @property
    def ns_tuple(self) -> tuple:
        """Per-segment piece counts (uniform fallback)."""
        return self.Ns if self.Ns is not None else (self.N,) * self.S

    @property
    def K1(self) -> int:
        """Padded samples-per-piece (Kdes+1 columns; interior pieces masked)."""
        return self.Kdes + 1

    @property
    def n_inner(self) -> int:
        return self.N - 1

    @property
    def dim(self) -> int:
        """Packed decision-variable length (traj_optimizer.cpp:80-88):
        inner waypoints + per-segment virtual time + gear positions + angles."""
        return 2 * self.S * (self.N - 1) + self.S + 3 * (self.S - 1)


class Scenario(NamedTuple):
    """One planning problem instance (all arrays may carry a leading batch dim).

    States are flat-output PVA matrices shaped [2, 3] with columns
    (position, velocity, acceleration), as in the reference's iniState/finState
    (traj_optimizer.cpp:8). Inner gear-junction states are *decision variables*;
    only segment 0's head and segment S-1's tail are used from here.
    """

    ini_state: jnp.ndarray        # [S, 2, 3]
    fin_state: jnp.ndarray        # [S, 2, 3]
    init_inner: jnp.ndarray       # [S, N-1, 2]  initial inner waypoints
    init_T: jnp.ndarray           # [S]          initial total duration per segment
    singul: jnp.ndarray           # [S] int32    +1 forward / -1 reverse
    seg_mask: jnp.ndarray         # [S] bool     valid segments
    # Safe corridors per constraint point, half-plane form (outward normal n,
    # boundary point p): feasible iff n . (x - p) <= 0  (traj_manager.cpp:1440-1466).
    corr_n: jnp.ndarray           # [S, N, K1, H, 2]  unit outward normals
    corr_p: jnp.ndarray           # [S, N, K1, H, 2]  points on each plane
    corr_mask: jnp.ndarray        # [S, N, K1, H] bool
    # Dynamic obstacles: uniform-dT piecewise quintics (always forward, singul=1),
    # evaluated at absolute time with const-acc extrapolation past the end
    # (traj_optimizer.cpp:1362-1389). Coefficients are *normalized-time* rows
    # c[k] for tau^k on each piece (same convention as minco.generate output).
    obs_coef: jnp.ndarray         # [O, Po, 6, 2]
    obs_dt: jnp.ndarray           # [O]     per-piece duration
    obs_rel_t0: jnp.ndarray       # [O]     (t_now - obstacle traj start time)
    obs_mask: jnp.ndarray         # [O] bool


class Weights(NamedTuple):
    """Per-scenario dynamic cost parameters (broadcastable scalars).

    Split from OptConfig so a batch can mix limits (e.g. randomized scenarios)
    without recompilation; defaults come from OptConfig.
    """

    wei_obs: jnp.ndarray
    wei_surround: jnp.ndarray
    wei_feas: jnp.ndarray
    wei_time: jnp.ndarray
    max_forward_vel: jnp.ndarray
    max_forward_acc: jnp.ndarray
    max_forward_cur: jnp.ndarray
    max_backward_vel: jnp.ndarray
    max_backward_acc: jnp.ndarray
    max_backward_cur: jnp.ndarray
    surround_clearance: jnp.ndarray
    non_sinv: jnp.ndarray
    mini_t: jnp.ndarray
    epis: jnp.ndarray
    lse_alpha: jnp.ndarray


def weights_from_config(opt, dtype=jnp.float32) -> Weights:
    f = lambda v: jnp.asarray(v, dtype=dtype)
    return Weights(
        wei_obs=f(opt.wei_obs),
        wei_surround=f(opt.wei_surround),
        wei_feas=f(opt.wei_feas),
        wei_time=f(opt.wei_time),
        max_forward_vel=f(opt.max_forward_vel),
        max_forward_acc=f(opt.max_forward_acc),
        max_forward_cur=f(opt.max_forward_cur),
        max_backward_vel=f(opt.max_backward_vel),
        max_backward_acc=f(opt.max_backward_acc),
        max_backward_cur=f(opt.max_backward_cur),
        surround_clearance=f(opt.surround_clearance),
        non_sinv=f(opt.non_sinv),
        mini_t=f(opt.mini_t),
        epis=f(opt.epis),
        lse_alpha=f(opt.lse_alpha),
    )


class SolveResult(NamedTuple):
    """Output of the batched trajectory optimizer."""

    coeffs: jnp.ndarray       # [S, N, 6, 2] normalized-time coefficients
    dT: jnp.ndarray           # [S] optimized per-piece duration
    cost: jnp.ndarray         # [] final total cost
    n_iters: jnp.ndarray      # [] int32 L-BFGS iterations
    status: jnp.ndarray       # [] int32 (see lbfgs.Status)
    success: jnp.ndarray      # [] bool  (status ok and cost below reject threshold)


def empty_obstacles(dims: Dims, dtype=jnp.float32):
    """Zero-filled, fully-masked obstacle block for scenarios without traffic."""
    O, Po = max(dims.O, 0), dims.Po
    return dict(
        obs_coef=jnp.zeros((O, Po, 6, 2), dtype),
        obs_dt=jnp.ones((O,), dtype),
        obs_rel_t0=jnp.zeros((O,), dtype),
        obs_mask=jnp.zeros((O,), bool),
    )


def state_to_flat(pos, yaw, vel, acc, steer, wheel_base, singul, non_sig=0.2,
                  dtype=np.float64):
    """Map a bicycle state to the flat-output PVA matrix [2, 3].

    Reference: kino_astar.cpp:834-857 getFlatState — velocity along heading,
    acceleration combines longitudinal acc and centripetal tan(steer)/L * v^2.
    """
    pos = np.asarray(pos, dtype)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s], [s, c]], dtype)
    v = singul * non_sig if abs(vel) <= non_sig else singul * vel
    dp = R @ np.array([v, 0.0], dtype)
    ddp = R @ np.array([acc, np.tan(steer) / wheel_base * v * v], dtype)
    return np.stack([pos, dp, ddp], axis=1)
