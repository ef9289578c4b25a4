"""Auxiliary subsystems: metrics, checkpointing, serialization, profiling.

The reference has only ad-hoc equivalents (SURVEY.md §5): common::TicToc
wall timers sprinkled through traj_manager.cpp / kino_astar.cpp, glog +
printf logging, and no checkpointing at all. For a batched engine running
100k+ scenario campaigns these become first-class: a metrics registry with
timers and throughput counters, pytree checkpoints for long runs, a compact
trajectory wire format (the PolyTraj.msg counterpart), and JAX profiler
hooks.
"""

from dftpav_tpu.utils.checkpoint import (  # noqa: F401
    load_pytree,
    save_pytree,
)
from dftpav_tpu.utils.metrics import Metrics, TicToc  # noqa: F401
from dftpav_tpu.utils.serialization import (  # noqa: F401
    load_trajectory,
    save_trajectory,
    trajectory_from_dict,
    trajectory_to_dict,
)
