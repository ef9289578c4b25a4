// Headless stand-in for plan_utils/traj_visualizer.h (shadowed by include
// order). The optimizer TU only needs the geometry types this header used to
// transitively provide (vec_E / Polyhedron2D / Hyperplane2D from decomp_util)
// and DecompROS::polyhedron_array_to_ros — RViz plumbing is dropped.
#pragma once

#include <decomp_geometry/polyhedron.h>

#include "decomp_ros_utils/data_ros_utils.h"
