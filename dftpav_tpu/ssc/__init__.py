"""SSC (spatio-temporal semantic corridor) planner — the benchmark back end.

Reference: src/Sim/util/ssc_planner (EPSILON's SSC planner): a Frenet-frame
(s, d, t) corridor of axis-aligned cubes around a behavioral forward
trajectory, and a piecewise quintic Bezier QP (jerk objective + proximity
term, continuity up to acceleration, control-point hull constraints inside
each cube) solved per behavior (ssc_planner.cc:253-345, QP assembly
common/spline/spline_generator.cc:357-727, OOQP back end
common/solver/ooqp_interface.cc).

TPU-native design: fixed cube count M per problem class; the QP is assembled
as dense [n, n] operators with static shapes and solved with a batched
OSQP-style ADMM (ops are batched matmuls + clips — MXU/VPU work), `vmap`-able
over scenarios and behaviors. Corridor generation is vectorized interval
arithmetic over predicted obstacle boxes instead of voxel inflation.
"""

from dftpav_tpu.ssc.bezier import BezierSpline, bezier_eval  # noqa: F401
from dftpav_tpu.ssc.corridor import Corridor, build_corridor  # noqa: F401
from dftpav_tpu.ssc.planner import ssc_plan  # noqa: F401
from dftpav_tpu.ssc.qp import admm_qp  # noqa: F401
