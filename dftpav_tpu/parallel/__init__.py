"""Multi-chip scaling: scenario data-parallelism over a device mesh.

The reference has no distributed layer (SURVEY.md §2.4 — three ROS processes
on one host); scaling here is TPU-native by design: scenarios are
embarrassingly parallel, sharded over a 1-D `data` mesh axis riding ICI, with
psum'd convergence/throughput metrics as the only collectives.
"""

from dftpav_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    make_sharded_solver,
)
