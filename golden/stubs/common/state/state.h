// Headless stand-in for common/state/state.h: the real header drags in
// common/basics/basics.h -> shapes.h -> OpenCV. The planner TU only reads and
// writes these State fields (poly_traj_utils.hpp:378-406), so the struct is
// replicated with plain Eigen types.
#pragma once

#include <Eigen/Dense>

namespace common {

struct State {
  double time_stamp{0.0};
  Eigen::Vector2d vec_position{Eigen::Vector2d::Zero()};
  double angle{0.0};
  double curvature{0.0};
  double velocity{0.0};
  double acceleration{0.0};
  double steer{0.0};
  EIGEN_MAKE_ALIGNED_OPERATOR_NEW
};

}  // namespace common
