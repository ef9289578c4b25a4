// Hand-written stand-in for the protoc-generated minco_config.pb.h: plain
// structs exposing the getter surface PolyTrajOptimizer::setParam reads
// (traj_optimizer.cpp:1713-1736). Default values equal the deployed
// /root/reference/src/Plan/traj_planner/config/minco_config.pb.txt; the
// harness driver may overwrite the public fields before setParam.
#pragma once

namespace planning {
namespace minco {

struct OptCfg {
  int traj_resolution_v = 16;
  int des_traj_resolution_v = 32;
  double wei_sta_obs_v = 1000.0;
  double wei_dyn_obs_v = 5000.0;
  double wei_feas_v = 2500.0;
  double wei_sqrvar_v = 500.0;
  double wei_time_v = 500.0;
  double dyn_obs_clearance_v = 0.4;
  double half_margin_v = 0.15;
  double max_phidot_v = 10000.0;
  double max_forward_vel_v = 5.0;
  double max_backward_vel_v = 2.0;
  double max_forward_cur_v = 1.0;
  double max_backward_cur_v = 1.0;
  double max_forward_acc_v = 8.0;
  double max_backward_acc_v = 4.0;
  double max_latacc_v = 5.0;
  bool gearopt_v = true;
  int lbfgs_memsize_v = 256;
  int lbfgs_past_v = 3;
  double lbfgs_delta_v = 1.0e-4;
  double mini_t_v = 0.1;

  int traj_resolution() const { return traj_resolution_v; }
  int des_traj_resolution() const { return des_traj_resolution_v; }
  double wei_sta_obs() const { return wei_sta_obs_v; }
  double wei_dyn_obs() const { return wei_dyn_obs_v; }
  double wei_feas() const { return wei_feas_v; }
  double wei_sqrvar() const { return wei_sqrvar_v; }
  double wei_time() const { return wei_time_v; }
  double dyn_obs_clearance() const { return dyn_obs_clearance_v; }
  double half_margin() const { return half_margin_v; }
  double max_phidot() const { return max_phidot_v; }
  double max_forward_vel() const { return max_forward_vel_v; }
  double max_backward_vel() const { return max_backward_vel_v; }
  double max_forward_cur() const { return max_forward_cur_v; }
  double max_backward_cur() const { return max_backward_cur_v; }
  double max_forward_acc() const { return max_forward_acc_v; }
  double max_backward_acc() const { return max_backward_acc_v; }
  double max_latacc() const { return max_latacc_v; }
  bool gearopt() const { return gearopt_v; }
  int lbfgs_memsize() const { return lbfgs_memsize_v; }
  int lbfgs_past() const { return lbfgs_past_v; }
  double lbfgs_delta() const { return lbfgs_delta_v; }
  double mini_t() const { return mini_t_v; }
};

struct Config {
  OptCfg opt_cfg_v;
  const OptCfg &opt_cfg() const { return opt_cfg_v; }
  OptCfg *mutable_opt_cfg() { return &opt_cfg_v; }
};

}  // namespace minco
}  // namespace planning
