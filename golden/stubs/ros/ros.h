// Headless stand-in for <ros/ros.h>, just enough surface for the reference
// planner translation units (traj_optimizer.cpp and the headers it pulls in)
// to compile unmodified outside a catkin workspace. Publishers are no-ops and
// ros::Time wraps the steady clock. See golden/README.md for how include-path
// shadowing wires this in.
#pragma once

#include <chrono>
#include <cstdio>
#include <string>

#define ROS_ERROR(...)                         \
  do {                                         \
    std::fprintf(stderr, __VA_ARGS__);         \
    std::fprintf(stderr, "\n");                \
  } while (0)
#define ROS_WARN(...) ROS_ERROR(__VA_ARGS__)
#define ROS_INFO(...)                          \
  do {                                         \
  } while (0)

namespace ros {

struct Duration {
  double sec{0.0};
  double toSec() const { return sec; }
};

class Time {
 public:
  double t{0.0};
  static Time now() {
    using namespace std::chrono;
    return Time{duration<double>(steady_clock::now().time_since_epoch()).count()};
  }
  double toSec() const { return t; }
  Duration operator-(const Time &o) const { return Duration{t - o.t}; }
};

class Publisher {
 public:
  template <class T>
  void publish(const T &) const {}
};

class NodeHandle {
 public:
  NodeHandle() = default;
  explicit NodeHandle(const std::string &) {}
  template <class T>
  Publisher advertise(const std::string &, int, bool latch = false) {
    (void)latch;
    return Publisher{};
  }
};

}  // namespace ros
