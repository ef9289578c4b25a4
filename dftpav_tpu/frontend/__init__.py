"""Host-side front end: occupancy grid, kinodynamic A*, Reeds-Shepp,
corridor generation — native C++ (native/dftpav_native.cpp) via ctypes."""

from dftpav_tpu.frontend.native import (  # noqa: F401
    GridMap2D,
    KinoAstarPlanner,
    reeds_shepp_distance,
    reeds_shepp_sample,
)
