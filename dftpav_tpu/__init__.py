"""dftpav_tpu — TPU-native spatial-temporal trajectory optimization for car-like robots.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ZJU-FAST-Lab/Dftpav
(differential-flatness MINCO planner, reference at /root/reference): piecewise
quintic-polynomial trajectories with analytic flatness maps to bicycle-model states,
safe-corridor / dynamic-obstacle / feasibility penalties, multi-gear (forward/reverse)
segments, and a batched L-BFGS solver — all with static shapes, `vmap` over scenarios,
and `pjit`/`shard_map` scaling over device meshes.

Key TPU-first design decisions (vs. the reference's scalar C++ loops):
  * MINCO's 6N x 6N banded system uses normalized time, so the matrix is a *constant*
    per piece-count N (reference: poly_traj_utils.hpp:880-951). We precompute its
    inverse once and `generate` becomes one batched MXU matmul.
  * Constraint-point sampling is a basis matmul with constant [N, K+1, 6] beta
    matrices (reference samples point-by-point: traj_optimizer.cpp:499-520).
  * All penalty gradients come from `jax.grad` of the scalar cost, replacing the
    hand-derived adjoint algebra of traj_optimizer.cpp:422-779 / calGrads_PT.
  * The L-BFGS loop (lbfgs.hpp:440) is re-implemented with `lax.while_loop` and
    vmapped over thousands of scenarios per chip.
"""

from dftpav_tpu import config as config
from dftpav_tpu import types as types
from dftpav_tpu import minco as minco
from dftpav_tpu import basis as basis
from dftpav_tpu import cost as cost
from dftpav_tpu import lbfgs as lbfgs
from dftpav_tpu import solver as solver
from dftpav_tpu import geo as geo

# heavier subpackages (ops, urban, ssc, sim, parallel, utils, frontend) are
# imported lazily by their users to keep bare-core import fast

__version__ = "0.2.0"
