// Headless stand-in for decomp_ros_utils/data_ros_utils.h: the real one
// converts decomp_util polyhedra to catkin-generated decomp_ros_msgs (which do
// not exist outside a catkin build). Only the one conversion the optimizer TU
// calls is provided, as a no-op.
#pragma once

#include <decomp_geometry/polyhedron.h>
#include <visualization_msgs/Marker.h>  // std_msgs::Header

namespace decomp_ros_msgs {
struct PolyhedronArray {
  std_msgs::Header header;
};
}  // namespace decomp_ros_msgs

namespace DecompROS {

template <class PolyContainer>
inline decomp_ros_msgs::PolyhedronArray polyhedron_array_to_ros(
    const PolyContainer &) {
  return decomp_ros_msgs::PolyhedronArray{};
}

}  // namespace DecompROS
