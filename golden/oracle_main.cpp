// Golden-parity driver: compiles the UNMODIFIED reference optimizer
// (/root/reference/src/Plan/traj_planner/src/traj_optimizer.cpp) headlessly
// (ROS / proto / viz headers replaced by the stubs in ./stubs via include-path
// shadowing), feeds it a fixture produced by tests/test_golden_cpp.py, and
// prints the optimized trajectory so the JAX engine can be compared against
// the actual compiled C++ — not a reimplemented oracle.
//
// Fixture format (whitespace-separated tokens, all floats %.17g):
//   S
//   repeat S times:
//     singul N
//     iniState 6 floats (column-major 2x3: p v a)
//     finState 6 floats
//     inner    2*(N-1) floats (column-major: waypoint columns)
//     T        initial real total segment duration
//     ncfg     number of constraint points, = (N-2)*(K+1) + 2*(Kdes+1)
//     repeat ncfg times:
//       H
//       4*H floats column-major (each plane column: nx ny px py)
//   n_obs
//   repeat n_obs times:
//     rel_t0 Po dt
//     Po * 12 floats: reference CoefficientMat (2x6) column-major,
//       col j multiplies t^(5-j), absolute in-piece time
//   [optional] lbfgs_delta — overrides the config's past-delta stop tolerance
//   [optional] lbfgs_past  — overrides the past window (with delta=1e18 this
//                            stops both engines after exactly `past` identical
//                            iterations: fixed-iteration path parity)
//

// Output lines are prefixed GOLDEN; everything else is reference chatter.

#include <plan_manage/traj_optimizer.h>

#include <cstdio>
#include <fstream>
#include <vector>

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s fixture.txt [n_samples]\n", argv[0]);
    return 2;
  }
  std::ifstream in(argv[1]);
  if (!in) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  const int n_samples = argc > 2 ? std::atoi(argv[2]) : 200;

  int trajnum;
  in >> trajnum;
  std::vector<Eigen::MatrixXd> inis(trajnum), fins(trajnum), inners(trajnum);
  Eigen::VectorXd initTs(trajnum);
  std::vector<std::vector<Eigen::MatrixXd>> hpolys(trajnum);
  std::vector<int> singuls(trajnum);

  for (int i = 0; i < trajnum; i++) {
    int N;
    in >> singuls[i] >> N;
    inis[i].resize(2, 3);
    fins[i].resize(2, 3);
    for (int c = 0; c < 3; c++)
      for (int r = 0; r < 2; r++) in >> inis[i](r, c);
    for (int c = 0; c < 3; c++)
      for (int r = 0; r < 2; r++) in >> fins[i](r, c);
    inners[i].resize(2, N - 1);
    for (int c = 0; c < N - 1; c++)
      for (int r = 0; r < 2; r++) in >> inners[i](r, c);
    in >> initTs(i);
    int ncfg;
    in >> ncfg;
    hpolys[i].resize(ncfg);
    for (int k = 0; k < ncfg; k++) {
      int H;
      in >> H;
      hpolys[i][k].resize(4, H);
      for (int c = 0; c < H; c++)
        for (int r = 0; r < 4; r++) in >> hpolys[i][k](r, c);
    }
  }

  int n_obs;
  in >> n_obs;
  plan_utils::SurroundTrajData sur(n_obs);
  for (int o = 0; o < n_obs; o++) {
    double rel_t0, dt;
    int Po;
    in >> rel_t0 >> Po >> dt;
    std::vector<double> durs(Po, dt);
    std::vector<plan_utils::CoefficientMat> mats(Po);
    for (int p = 0; p < Po; p++)
      for (int c = 0; c < 6; c++)
        for (int r = 0; r < 2; r++) in >> mats[p](r, c);
    sur[o].drone_id = o + 1;
    sur[o].traj = plan_utils::Trajectory(durs, mats, 1);
    sur[o].duration = sur[o].traj.getTotalDuration();
    // t_now_ is passed as 0, so start_time = -rel_t0 reproduces
    // pt_time = rel_t0 + trajtime + t (traj_optimizer.cpp:1367-1370).
    sur[o].start_time = -rel_t0;
    sur[o].end_time = sur[o].start_time + sur[o].duration;
  }

  plan_manage::PolyTrajOptimizer opt;
  ros::NodeHandle nh;
  planning::minco::Config cfg;
  double delta_override;
  if (in >> delta_override) cfg.mutable_opt_cfg()->lbfgs_delta_v = delta_override;
  int past_override;
  if (in >> past_override) cfg.mutable_opt_cfg()->lbfgs_past_v = past_override;
  opt.setParam(nh, cfg);
  if (n_obs > 0) opt.setSurroundTrajs(&sur);

  // help_eps = 0.0 matches the parking pipeline (traj_manager.cpp:612).
  bool ok = opt.OptimizeTrajectory(inis, fins, inners, initTs, hpolys, singuls,
                                   /*now=*/0.0, /*help_eps=*/0.0);

  std::printf("GOLDEN ok %d\n", (int)ok);
  const std::vector<plan_utils::MinJerkOpt> *jos = opt.getMinJerkOptPtr();
  for (int i = 0; i < trajnum; i++) {
    plan_utils::Trajectory traj = (*jos)[i].getTraj(singuls[i]);
    double T = traj.getTotalDuration();
    std::printf("GOLDEN seg %d T %.17g jerk %.17g\n", i, T,
                (*jos)[i].getTrajJerkCost());
    for (int j = 0; j < n_samples; j++) {
      double t = T * j / (double)(n_samples - 1);
      Eigen::Vector2d p = traj.getPos(t);
      std::printf("GOLDEN pt %.17g %.17g %.17g\n", t, p(0), p(1));
    }
  }
  return 0;
}
