// dftpav_tpu native front end: occupancy grid, Reeds-Shepp curves,
// kinodynamic A* with gear handling, and corridor generation.
//
// This is the host-side sequential/branchy part of the pipeline (the batched
// trajectory optimizer runs on TPU). Independent reimplementation of the
// behavior of the reference planner's front end:
//   - grid collision semantics: semantic_map_manager.cc:639-715 (OBB perimeter
//     sampling), map_adapter.cpp:117-129 (line checks)
//   - kinodynamic A*: kino_astar.cpp:37-300 (arc primitives via exact bicycle
//     transit, g-score terms, one-shot Reeds-Shepp within 15 m)
//   - path -> flat segments: kino_astar.cpp:554-800 (gear split, two-phase
//     optimal-control time profile, 0.1 s resampling, flat boundary states)
//   - corridor: traj_manager.cpp:1213-1469 (rectangle grown from the vehicle
//     OBB side-by-side until collision, 10 m cap)
//   - Reeds-Shepp: closed-form word families from Reeds & Shepp (1990),
//     replacing the reference's OMPL dependency.
//
// Exposed through a plain C API consumed via ctypes (dftpav_tpu/frontend).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <ctime>
#include <cstdio>
#include <array>
#include <limits>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double norm_angle(double a) {
  while (a > kPi) a -= 2.0 * kPi;
  while (a < -kPi) a += 2.0 * kPi;
  return a;
}

// ---------------------------------------------------------------------------
// Occupancy grid
// ---------------------------------------------------------------------------

struct GridMap {
  int nx = 0, ny = 0;
  double ox = 0, oy = 0, res = 0.1, inv_res = 10.0;
  std::vector<uint8_t> occ;  // row-major [iy * nx + ix], 1 = occupied

  bool occupied(double x, double y) const {
    int ix = (int)std::floor((x - ox) * inv_res);
    int iy = (int)std::floor((y - oy) * inv_res);
    if (ix < 0 || iy < 0 || ix >= nx || iy >= ny) return true;  // outside=occ
    return occ[(size_t)iy * nx + ix] != 0;
  }

  // OBB perimeter-sample collision (semantic_map_manager.cc:639-662 +
  // shapes.cc GetDenseVerticesOfOrientedBoundingBox, default spacing 0.2).
  bool obb_collides(double x, double y, double yaw, double length,
                    double width, double d_cr, double spacing = 0.2) const {
    double c = std::cos(yaw), s = std::sin(yaw);
    double cx = x + d_cr * c, cy = y + d_cr * s;
    double hx = 0.5 * length, hy = 0.5 * width;
    double corner[4][2] = {
        {cx + hx * c + hy * s, cy + hx * s - hy * c},
        {cx + hx * c - hy * s, cy + hx * s + hy * c},
        {cx - hx * c - hy * s, cy - hx * s + hy * c},
        {cx - hx * c + hy * s, cy - hx * s - hy * c}};
    for (int e = 0; e < 4; ++e) {
      const double* p0 = corner[e];
      const double* p1 = corner[(e + 1) % 4];
      double dx = p1[0] - p0[0], dy = p1[1] - p0[1];
      double len = std::hypot(dx, dy);
      int n = std::max(1, (int)std::ceil(len / spacing));
      for (int i = 0; i <= n; ++i) {
        double t = (double)i / n;
        if (occupied(p0[0] + t * dx, p0[1] + t * dy)) return true;
      }
    }
    return false;
  }

  bool line_collides(double x0, double y0, double x1, double y1,
                     double spacing) const {
    double dx = x1 - x0, dy = y1 - y0;
    double len = std::hypot(dx, dy);
    int n = std::max(1, (int)std::ceil(len / spacing));
    for (int i = 0; i <= n; ++i) {
      double t = (double)i / n;
      if (occupied(x0 + t * dx, y0 + t * dy)) return true;
    }
    return false;
  }
};

// ---------------------------------------------------------------------------
// Reeds-Shepp curves (closed form, unit turning radius internally).
// Word families and transforms per Reeds & Shepp (1990); see also the public
// summaries of the 48-curve taxonomy. Segment types: L(+1), S(0), R(-1);
// segment parameter is signed arc length (angle for arcs).
// ---------------------------------------------------------------------------

struct RSPath {
  int types[5] = {9, 9, 9, 9, 9};  // indices into the word pattern; 9 = unused
  double t[5] = {0, 0, 0, 0, 0};   // signed parameters
  double total = std::numeric_limits<double>::infinity();
  int n = 0;
};

// word patterns (type per segment): 1=L, 0=S, -1=R
struct Word {
  int seg[5];
  int n;
};

inline void polar(double x, double y, double* r, double* th) {
  *r = std::hypot(x, y);
  *th = std::atan2(y, x);
}

inline double mod2pi(double a) {
  double v = std::fmod(a, 2.0 * kPi);
  if (v < -kPi) v += 2.0 * kPi;
  if (v > kPi) v -= 2.0 * kPi;
  return v;
}

inline void tauOmega(double u, double v, double xi, double eta, double phi,
                     double* tau, double* omega) {
  double delta = mod2pi(u - v), A = std::sin(u) - std::sin(delta),
         B = std::cos(u) - std::cos(delta) - 1.0;
  double t1 = std::atan2(eta * A - xi * B, xi * A + eta * B);
  double t2 = 2.0 * (std::cos(delta) - std::cos(v) - std::cos(u)) + 3.0;
  *tau = (t2 < 0) ? mod2pi(t1 + kPi) : mod2pi(t1);
  *omega = mod2pi(*tau - u + v - phi);
}

// Eight base solvers. Each returns true + (t,u,v) on success.
bool LpSpLp(double x, double y, double phi, double* t, double* u, double* v) {
  polar(x - std::sin(phi), y - 1.0 + std::cos(phi), u, t);
  if (*t >= -1e-12) {
    *v = mod2pi(phi - *t);
    if (*v >= -1e-12) return true;
  }
  return false;
}

bool LpSpRp(double x, double y, double phi, double* t, double* u, double* v) {
  double t1, u1;
  polar(x + std::sin(phi), y - 1.0 - std::cos(phi), &u1, &t1);
  u1 = u1 * u1;
  if (u1 < 4.0) return false;
  double ua = std::sqrt(u1 - 4.0);
  double theta = std::atan2(2.0, ua);
  *t = mod2pi(t1 + theta);
  *u = ua;
  *v = mod2pi(*t - phi);
  return *t >= -1e-12 && *v >= -1e-12;
}

bool LpRmL(double x, double y, double phi, double* t, double* u, double* v) {
  double xi = x - std::sin(phi), eta = y - 1.0 + std::cos(phi), u1, theta;
  polar(xi, eta, &u1, &theta);
  if (u1 > 4.0) return false;
  *u = -2.0 * std::asin(0.25 * u1);
  *t = mod2pi(theta + 0.5 * *u + kPi);
  *v = mod2pi(phi - *t + *u);
  return *t >= -1e-12 && *u <= 1e-12;
}

bool LpRupLumRm(double x, double y, double phi, double* t, double* u,
                double* v) {
  double xi = x + std::sin(phi), eta = y - 1.0 - std::cos(phi);
  double rho = 0.25 * (2.0 + std::hypot(xi, eta));
  if (rho > 1.0) return false;
  *u = std::acos(rho);
  tauOmega(*u, -*u, xi, eta, phi, t, v);
  return *t >= -1e-12 && *v <= 1e-12;
}

bool LpRumLumRp(double x, double y, double phi, double* t, double* u,
                double* v) {
  double xi = x + std::sin(phi), eta = y - 1.0 - std::cos(phi);
  double rho = (20.0 - xi * xi - eta * eta) / 16.0;
  if (rho < 0.0 || rho > 1.0) return false;
  *u = -std::acos(rho);
  if (*u < -0.5 * kPi) return false;
  tauOmega(*u, *u, xi, eta, phi, t, v);
  return *t >= -1e-12 && *v >= -1e-12;
}

bool LpRmSmLm(double x, double y, double phi, double* t, double* u,
              double* v) {
  double xi = x - std::sin(phi), eta = y - 1.0 + std::cos(phi), rho, theta;
  polar(xi, eta, &rho, &theta);
  if (rho < 2.0) return false;
  double r = std::sqrt(rho * rho - 4.0);
  *u = 2.0 - r;
  *t = mod2pi(theta + std::atan2(r, -2.0));
  *v = mod2pi(phi - 0.5 * kPi - *t);
  return *t >= -1e-12 && *u <= 1e-12 && *v <= 1e-12;
}

bool LpRmSmRm(double x, double y, double phi, double* t, double* u,
              double* v) {
  double xi = x + std::sin(phi), eta = y - 1.0 - std::cos(phi), rho, theta;
  polar(-eta, xi, &rho, &theta);
  if (rho < 2.0) return false;
  *t = theta;
  *u = 2.0 - rho;
  *v = mod2pi(*t + 0.5 * kPi - phi);
  return *t >= -1e-12 && *u <= 1e-12 && *v <= 1e-12;
}

bool LpRmSLmRp(double x, double y, double phi, double* t, double* u,
               double* v) {
  double xi = x + std::sin(phi), eta = y - 1.0 - std::cos(phi), rho, theta;
  polar(xi, eta, &rho, &theta);
  if (rho < 2.0) return false;
  *u = 4.0 - std::sqrt(rho * rho - 4.0);
  if (*u > 1e-12) return false;
  *t = mod2pi(theta + std::atan2(std::sqrt(rho * rho - 4.0), -2.0));
  *v = mod2pi(*t - phi);
  return *t >= -1e-12 && *v >= -1e-12;
}

struct Candidate {
  double seg[5];
  int types[5];  // 1=L 0=S -1=R
  int n;
};

void consider(std::vector<Candidate>& out, bool ok, double t, double u,
              double v, const int* pat, int n, bool timeflip, bool reflect) {
  if (!ok) return;
  Candidate c;
  double vals3[3] = {t, u, v};
  // 4-5 segment words pass their params explicitly via pattern length
  c.n = n;
  for (int i = 0; i < n; ++i) {
    double val = vals3[std::min(i, 2)];
    c.seg[i] = val;
  }
  (void)pat;
  (void)timeflip;
  (void)reflect;
  out.push_back(c);
}

// Evaluate all words for target (x, y, phi) and keep the shortest.
// To keep the transform bookkeeping simple each base solver is applied to the
// 4 symmetry-transformed targets; segments/types are adjusted accordingly.
struct RSSolution {
  std::vector<std::pair<int, double>> segs;  // (type, signed length)
  double total = std::numeric_limits<double>::infinity();
};

void addSolution(RSSolution* best, const int* types, const double* vals, int n,
                 bool timeflip, bool reflect) {
  double total = 0;
  for (int i = 0; i < n; ++i) total += std::fabs(vals[i]);
  if (total >= best->total - 1e-12 || total < 1e-12) return;
  RSSolution s;
  s.total = total;
  for (int i = 0; i < n; ++i) {
    int ty = types[i];
    double val = vals[i];
    if (timeflip) val = -val;
    if (reflect && ty != 0) ty = -ty;
    s.segs.push_back({ty, val});
  }
  *best = s;
}

void solveFamilies(double x, double y, double phi, bool timeflip, bool reflect,
                   RSSolution* best) {
  double t, u, v;
  // CSC
  {
    const int ty[3] = {1, 0, 1};
    if (LpSpLp(x, y, phi, &t, &u, &v)) {
      double vals[3] = {t, u, v};
      addSolution(best, ty, vals, 3, timeflip, reflect);
    }
  }
  {
    const int ty[3] = {1, 0, -1};
    if (LpSpRp(x, y, phi, &t, &u, &v)) {
      double vals[3] = {t, u, v};
      addSolution(best, ty, vals, 3, timeflip, reflect);
    }
  }
  // CCC: L+ R- L and its reversal (run backwards for LRL with v first)
  {
    const int ty[3] = {1, -1, 1};
    if (LpRmL(x, y, phi, &t, &u, &v)) {
      double vals[3] = {t, u, v};
      addSolution(best, ty, vals, 3, timeflip, reflect);
    }
    // backwards: solve for the reversed target (xb, yb) per RS paper
    double xb = x * std::cos(phi) + y * std::sin(phi);
    double yb = x * std::sin(phi) - y * std::cos(phi);
    if (LpRmL(xb, yb, phi, &t, &u, &v)) {
      double vals[3] = {v, u, t};
      addSolution(best, ty, vals, 3, timeflip, reflect);
    }
  }
  // CCCC
  {
    const int ty[4] = {1, -1, 1, -1};
    if (LpRupLumRm(x, y, phi, &t, &u, &v)) {
      double vals[4] = {t, u, -u, v};
      addSolution(best, ty, vals, 4, timeflip, reflect);
    }
    if (LpRumLumRp(x, y, phi, &t, &u, &v)) {
      double vals[4] = {t, u, u, v};
      addSolution(best, ty, vals, 4, timeflip, reflect);
    }
  }
  // CCSC
  {
    const int tyLRSL[4] = {1, -1, 0, 1};
    if (LpRmSmLm(x, y, phi, &t, &u, &v)) {
      double vals[4] = {t, -0.5 * kPi, u, v};
      addSolution(best, tyLRSL, vals, 4, timeflip, reflect);
    }
    const int tyLRSR[4] = {1, -1, 0, -1};
    if (LpRmSmRm(x, y, phi, &t, &u, &v)) {
      double vals[4] = {t, -0.5 * kPi, u, v};
      addSolution(best, tyLRSR, vals, 4, timeflip, reflect);
    }
    // backwards variants (C|CS|C read in reverse): LSR-L and RSR-L
    double xb = x * std::cos(phi) + y * std::sin(phi);
    double yb = x * std::sin(phi) - y * std::cos(phi);
    const int tyLSRL[4] = {1, 0, -1, 1};
    if (LpRmSmLm(xb, yb, phi, &t, &u, &v)) {
      double vals[4] = {v, u, -0.5 * kPi, t};
      addSolution(best, tyLSRL, vals, 4, timeflip, reflect);
    }
    const int tyRSRL[4] = {-1, 0, -1, 1};
    if (LpRmSmRm(xb, yb, phi, &t, &u, &v)) {
      double vals[4] = {v, u, -0.5 * kPi, t};
      addSolution(best, tyRSRL, vals, 4, timeflip, reflect);
    }
  }
  // CCSCC
  {
    const int ty[5] = {1, -1, 0, 1, -1};
    if (LpRmSLmRp(x, y, phi, &t, &u, &v)) {
      double vals[5] = {t, -0.5 * kPi, u, -0.5 * kPi, v};
      addSolution(best, ty, vals, 5, timeflip, reflect);
    }
  }
}

// Full Reeds-Shepp: start implicitly at origin heading 0; target (x,y,phi)
// already normalized and scaled by 1/radius.
RSSolution reedsShepp(double x, double y, double phi) {
  RSSolution best;
  solveFamilies(x, y, phi, false, false, &best);                 // identity
  solveFamilies(-x, y, -phi, true, false, &best);                // timeflip
  solveFamilies(x, -y, -phi, false, true, &best);                // reflect
  solveFamilies(-x, -y, phi, true, true, &best);                 // both
  return best;
}

// Interpolate along an RS solution (unit radius frame), returning pose at
// arc-length s in [0, total].
void rsInterpolate(const RSSolution& sol, double s, double* px, double* py,
                   double* pyaw) {
  double x = 0, y = 0, yaw = 0;
  for (const auto& seg : sol.segs) {
    double len = std::fabs(seg.second);
    double dir = seg.second >= 0 ? 1.0 : -1.0;
    double d = std::min(s, len);
    double sd = dir * d;
    if (seg.first == 0) {
      x += sd * std::cos(yaw);
      y += sd * std::sin(yaw);
    } else if (seg.first == 1) {  // left
      x += std::sin(yaw + sd) - std::sin(yaw);
      y += -std::cos(yaw + sd) + std::cos(yaw);
      yaw += sd;
    } else {  // right
      x += -std::sin(yaw - sd) + std::sin(yaw);
      y += std::cos(yaw - sd) - std::cos(yaw);
      yaw -= sd;
    }
    s -= d;
    if (s <= 1e-12) break;
  }
  *px = x;
  *py = y;
  *pyaw = yaw;
}

struct RSSpace {
  double radius;
  // distance + sampling in world frame between poses q0, q1
  RSSolution solve(const double* q0, const double* q1) const {
    double dx = q1[0] - q0[0], dy = q1[1] - q0[1];
    double c = std::cos(q0[2]), s = std::sin(q0[2]);
    double x = (c * dx + s * dy) / radius;
    double y = (-s * dx + c * dy) / radius;
    double phi = norm_angle(q1[2] - q0[2]);
    return reedsShepp(x, y, phi);
  }
  double distance(const double* q0, const double* q1) const {
    return solve(q0, q1).total * radius;
  }
  void interpolate(const double* q0, const RSSolution& sol, double world_s,
                   double* out) const {
    double x, y, yaw;
    rsInterpolate(sol, world_s / radius, &x, &y, &yaw);
    double c = std::cos(q0[2]), s = std::sin(q0[2]);
    out[0] = q0[0] + radius * (c * x - s * y);
    out[1] = q0[1] + radius * (s * x + c * y);
    out[2] = norm_angle(q0[2] + yaw);
  }
};

// ---------------------------------------------------------------------------
// Kinodynamic A*
// ---------------------------------------------------------------------------

struct KinoParams {
  double wheel_base = 2.85;
  double veh_length = 4.88;  // pre-inflated by caller
  double veh_width = 1.90;
  double d_cr = 1.015;
  double max_cur = 1.0 / 3.0;  // min turn radius 3 m unless configured
  double step_arc = 0.9;
  double grid_res = 0.3;       // expansion resolution (map_resl)
  double yaw_res = 0.3;
  double lambda_heu = 5.0;
  double max_search_time = 1.0;   // seconds
  int check_num = 5;
  int allocate_num = 100000;
  double oneshot_range = 15.0;
  double checkl = 0.2;
  double forward_penalty = 1.0;
  double back_penalty = 2.5;
  double gear_penalty = 15.0;
  double steer_penalty = 0.5;
  double steer_change_penalty = 0.0;
  double horizon = 50.0;
  double max_vel_f = 5.0, max_acc_f = 8.0;
  double max_vel_b = 2.0, max_acc_b = 4.0;
  double non_siguav = 0.2;
  double sample_time = 0.1;
  double traj_forward_vel = 5.0;  // unused placeholder
  // yaw-keyed node dedup: the reference's use3d mode (yaw-indexed node
  // table, kino_astar.cpp:71-74,191-194). The 2D key collapses states
  // reaching a cell at different headings; 3D keeps them distinct.
  bool use3d = false;
};

struct Node {
  double x, y, yaw;
  double g = 0, f = 0;
  int parent = -1;
  double steer = 0, arc = 0;  // input that produced this node
  int singul = 0;
  int heap_generation = 0;
  bool closed = false;
};

struct FlatSegment {
  int singul;
  std::vector<double> pts;     // x,y,dt triplets
  std::vector<double> thetas;
  double start_state[6];       // column-major-ish [2x3]: px,py,vx,vy,ax,ay
  double final_state[6];
  double duration = 0;
};

struct PlanResult {
  std::vector<FlatSegment> segs;
  std::vector<double> sample_traj;  // x,y,yaw triplets of the rough path
  double total_time = 0;
  int status = 0;  // 1 = ok
  int iters = 0, nodes = 0, shots = 0;
  // gear-span bookkeeping for evaluatePos (kino_astar.cpp:469-521)
  std::vector<int> span_start, span_sig;
  std::vector<double> span_len, span_time;
  double startvel = 0, endvel = 0;
  double max_vel_f = 5, max_acc_f = 8, max_vel_b = 2, max_acc_b = 4;
  double non_siguav = 0.2;
};

// exact arc transit of the bicycle model (kino_astar.cpp:21-36)
inline void stateTransit(const double* s0, double steer, double arc,
                         double wheel_base, double* s1) {
  if (std::fabs(steer) > 1e-12) {
    double k = wheel_base / std::tan(steer);
    s1[0] = s0[0] + k * (std::sin(s0[2] + arc / k) - std::sin(s0[2]));
    s1[1] = s0[1] - k * (std::cos(s0[2] + arc / k) - std::cos(s0[2]));
    s1[2] = s0[2] + arc / k;
  } else {
    s1[0] = s0[0] + arc * std::cos(s0[2]);
    s1[1] = s0[1] + arc * std::sin(s0[2]);
    s1[2] = s0[2];
  }
}

// two-phase (accelerate to vmax, cruise, decelerate) time-optimal profile
// (kino_astar.cpp:744-762)
double evaluateDuration(double length, double max_vel, double max_acc,
                        double startV, double endV) {
  double sv2 = startV * startV, ev2 = endV * endV, mv2 = max_vel * max_vel;
  double critical = (mv2 - sv2) / (2 * max_acc) + (mv2 - ev2) / (2 * max_acc);
  if (length >= critical)
    return (max_vel - startV) / max_acc + (max_vel - endV) / max_acc +
           (length - critical) / max_vel;
  double tmpv = std::sqrt(0.5 * (sv2 + ev2 + 2 * max_acc * length));
  return (tmpv - startV) / max_acc + (tmpv - endV) / max_acc;
}

// arc length traveled at time curt under the same profile
// (kino_astar.cpp:763-800)
double evaluateLength(double curt, double locallength, double localtime,
                      double max_vel, double max_acc, double startV,
                      double endV) {
  (void)localtime;
  double sv2 = startV * startV, ev2 = endV * endV, mv2 = max_vel * max_vel;
  double critical = (mv2 - sv2) / (2 * max_acc) + (mv2 - ev2) / (2 * max_acc);
  if (locallength >= critical) {
    double t1 = (max_vel - startV) / max_acc;
    double t2 = t1 + (locallength - critical) / max_vel;
    if (curt <= t1) return startV * curt + 0.5 * max_acc * curt * curt;
    if (curt <= t2)
      return startV * t1 + 0.5 * max_acc * t1 * t1 + (curt - t1) * max_vel;
    double dt = curt - t2;
    return startV * t1 + 0.5 * max_acc * t1 * t1 + (t2 - t1) * max_vel +
           max_vel * dt - 0.5 * max_acc * dt * dt;
  }
  double tmpv = std::sqrt(0.5 * (sv2 + ev2 + 2 * max_acc * locallength));
  double tmpt = (tmpv - startV) / max_acc;
  if (curt <= tmpt) return startV * curt + 0.5 * max_acc * curt * curt;
  double dt = curt - tmpt;
  return startV * tmpt + 0.5 * max_acc * tmpt * tmpt + tmpv * dt -
         0.5 * max_acc * dt * dt;
}

// flat boundary state (kino_astar.cpp:834-857)
void getFlatState(double x, double y, double yaw, double vel, double steer,
                  double acc, double wheel_base, int singul, double non_siguav,
                  double* out /*6: px,py,vx,vy,ax,ay*/) {
  double c = std::cos(yaw), s = std::sin(yaw);
  double v = (std::fabs(vel) <= non_siguav) ? singul * non_siguav
                                            : singul * vel;
  out[0] = x;
  out[1] = y;
  out[2] = c * v;
  out[3] = s * v;
  double lat = std::tan(steer) / wheel_base * v * v;
  out[4] = c * acc - s * lat;
  out[5] = s * acc + c * lat;
}

struct HashKey {
  int64_t v;
  bool operator==(const HashKey& o) const { return v == o.v; }
};
struct HashKeyHash {
  size_t operator()(const HashKey& k) const {
    return std::hash<int64_t>()(k.v);
  }
};

class KinoAstar {
 public:
  KinoAstar(const GridMap* map, const KinoParams& p) : map_(map), p_(p) {
    rs_.radius = 1.0 / p.max_cur;
  }

  // start4/end4: x, y, yaw, v (signed). start_ctrl: steer, acc.
  // Returns PlanResult with status 1 on success.
  PlanResult plan(const double* start4, const double* start_ctrl,
                  const double* end4) {
    PlanResult out;
    if (collides(start4[0], start4[1], start4[2]) ||
        collides(end4[0], end4[1], end4[2])) {
      out.status = -1;
      return out;
    }
    std::copy(start4, start4 + 4, start_);
    std::copy(end4, end4 + 4, end_);
    start_ctrl_[0] = start_ctrl[0];
    start_ctrl_[1] = start_ctrl[1];

    nodes_.clear();
    nodes_.reserve(4096);
    lookup_.clear();
    while (!open_.empty()) open_.pop();

    Node root;
    root.x = start_[0];
    root.y = start_[1];
    root.yaw = start_[2];
    root.singul = start_[3] > 1e-3 ? 1 : (start_[3] < -1e-3 ? -1 : 0);
    root.g = 0;
    root.f = p_.lambda_heu * heu(root);
    nodes_.push_back(root);
    lookup_[key(root.x, root.y, root.yaw)] = 0;
    open_.push({root.f, 0});

    bool initsearch = root.singul != 0 ? false : true;
    rs_path_found_ = false;
    int iters = 0;
    std::vector<std::pair<double, double>> inputs;

    const auto t_start = clock();
    while (!open_.empty()) {
      auto [fscore, idx] = open_.top();
      open_.pop();
      Node cur = nodes_[idx];
      if (cur.closed) continue;
      nodes_[idx].closed = true;
      ++iters;
      dbg_iters_ = iters;

      // one-shot Reeds-Shepp when near the goal
      double de = std::hypot(cur.x - end_[0], cur.y - end_[1]);
      if (de < p_.oneshot_range && initsearch) {
        ++dbg_shots_;
        if (tryShot(cur)) {
          terminal_ = idx;
          return extract(&out);
        }
      }
      double elapsed = double(clock() - t_start) / CLOCKS_PER_SEC;
      if (elapsed > p_.max_search_time) {
        if (nodes_[idx].parent >= 0) {
          terminal_ = idx;
          return extract(&out);  // partial path (REACH via budget)
        }
        out.status = -2;
        return out;
      }

      // expansions
      inputs.clear();
      double max_steer = std::atan(p_.wheel_base * p_.max_cur);
      if (!initsearch) {
        // constrained first expansion along the initial motion direction
        double lo = start_[3] > 0 ? p_.grid_res : -2 * p_.grid_res;
        double hi = start_[3] > 0 ? 2 * p_.grid_res : -p_.grid_res;
        for (double arc = lo; arc <= hi + 1e-9; arc += p_.grid_res)
          for (double st = -max_steer; st <= max_steer + 1e-9;
               st += 0.5 * max_steer)
            inputs.push_back({st, arc});
        initsearch = true;
      } else {
        for (double arc = -p_.step_arc; arc <= p_.step_arc + 1e-9;
             arc += 0.5 * p_.step_arc) {
          if (std::fabs(arc) < 1e-2) continue;
          for (double st = -max_steer; st <= max_steer + 1e-9;
               st += 0.5 * max_steer)
            inputs.push_back({st, arc});
        }
      }

      double s0[3] = {cur.x, cur.y, cur.yaw};
      for (const auto& [steer, arc] : inputs) {
        int singul = arc > 0 ? 1 : -1;
        double s1[3];
        stateTransit(s0, steer, arc, p_.wheel_base, s1);
        HashKey k = key(s1[0], s1[1], s1[2]);
        auto it = lookup_.find(k);
        if (it != lookup_.end() && nodes_[it->second].closed) { ++dbg_closed_; continue; }
        if (it != lookup_.end() && it->second == idx) { ++dbg_same_; continue; }

        // collision along the primitive
        bool occ = false;
        for (int c = 1; c <= p_.check_num; ++c) {
          double xt[3];
          stateTransit(s0, steer, arc * c / p_.check_num, p_.wheel_base, xt);
          if (collides(xt[0], xt[1], xt[2])) {
            occ = true;
            break;
          }
        }
        if (occ) { ++dbg_occ_; continue; }

        double g = cur.g +
                   std::fabs(arc) * (singul > 0 ? p_.forward_penalty
                                                : p_.back_penalty) +
                   (singul * cur.singul < 0 ? p_.gear_penalty : 0.0) +
                   p_.steer_penalty * std::fabs(steer) * std::fabs(arc) +
                   p_.steer_change_penalty * std::fabs(steer - cur.steer);
        Node nn;
        nn.x = s1[0];
        nn.y = s1[1];
        nn.yaw = norm_angle(s1[2]);
        nn.g = g;
        nn.f = g + p_.lambda_heu * heuXY(s1[0], s1[1], s1[2]);
        nn.parent = idx;
        nn.steer = steer;
        nn.arc = arc;
        nn.singul = singul;
        if (it == lookup_.end()) {
          ++dbg_create_;
          lookup_[k] = (int)nodes_.size();
          open_.push({nn.f, (int)nodes_.size()});
          nodes_.push_back(nn);
          if ((int)nodes_.size() >= p_.allocate_num) {
            out.status = -3;
            return out;
          }
        } else if (g < nodes_[it->second].g) {
          ++dbg_improve_;
          nodes_[it->second] = nn;
          open_.push({nn.f, it->second});
        } else { ++dbg_worse_; }
      }
    }
    out.status = -4;
    return out;
  }

 private:
  bool collides(double x, double y, double yaw) const {
    return map_->obb_collides(x, y, yaw, p_.veh_length, p_.veh_width, p_.d_cr);
  }
  HashKey key(double x, double y, double yaw) const {
    int ix = (int)std::llround(x / p_.grid_res);
    int iy = (int)std::llround(y / p_.grid_res);
    int64_t v = (int64_t)ix * 1000003 + iy;
    if (p_.use3d) {
      // yaw bucket (kino_astar.cpp:814: floor((yaw - origin) / yaw_res))
      int iz = (int)std::floor((norm_angle(yaw) + M_PI) / p_.yaw_res);
      v = v * 1048573 + iz;
    }
    return HashKey{v};
  }
  double heu(const Node& n) const { return heuXY(n.x, n.y, n.yaw); }
  double heuXY(double x, double y, double yaw) const {
    (void)yaw;
    return std::hypot(x - end_[0], y - end_[1]);
  }

  bool tryShot(const Node& cur) {
    double q0[3] = {cur.x, cur.y, cur.yaw};
    double q1[3] = {end_[0], end_[1], end_[2]};
    RSSolution sol = rs_.solve(q0, q1);
    if (!std::isfinite(sol.total)) return false;
    double len = sol.total * rs_.radius;
    for (double l = 0.0; l <= len; l += p_.checkl) {
      double q[3];
      rs_.interpolate(q0, sol, l, q);
      if (collides(q[0], q[1], q[2])) return false;
    }
    shot_sol_ = sol;
    shot_from_[0] = cur.x;
    shot_from_[1] = cur.y;
    shot_from_[2] = cur.yaw;
    rs_path_found_ = true;
    return true;
  }

  // Build the rough sample list, split by gear, time-profile and resample
  // (kino_astar.cpp:554-743)
  PlanResult extract(PlanResult* out) {
    std::vector<std::array<double, 3>> rough;
    // walk up the tree collecting per-primitive dense samples (in reverse)
    int idx = terminal_;
    while (nodes_[idx].parent >= 0) {
      const Node& n = nodes_[idx];
      const Node& par = nodes_[n.parent];
      double s0[3] = {par.x, par.y, par.yaw};
      for (int k = p_.check_num; k > 0; --k) {
        double st[3];
        stateTransit(s0, n.steer, n.arc * k / p_.check_num, p_.wheel_base, st);
        rough.push_back({st[0], st[1], norm_angle(st[2])});
      }
      idx = n.parent;
    }
    rough.push_back({start_[0], start_[1], norm_angle(start_[2])});
    std::reverse(rough.begin(), rough.end());

    if (rs_path_found_) {
      double len = shot_sol_.total * rs_.radius;
      for (double l = p_.checkl; l < len; l += p_.checkl) {
        double q[3];
        rs_.interpolate(shot_from_, shot_sol_, l, q);
        rough.push_back({q[0], q[1], norm_angle(q[2])});
      }
      rough.push_back({end_[0], end_[1], norm_angle(end_[2])});
    }
    if (rough.size() < 2) {
      out->status = -5;
      return *out;
    }

    for (auto& r : rough) {
      out->sample_traj.push_back(r[0]);
      out->sample_traj.push_back(r[1]);
      out->sample_traj.push_back(r[2]);
    }

    double startvel = std::fabs(start_[3]), endvel = std::fabs(end_[3]);

    // split into single-gear spans
    std::vector<int> span_start{0};
    std::vector<int> span_sig;
    std::vector<double> span_len;
    double tmpl = 0;
    auto dirOf = [&](int i) {
      double dx = rough[i + 1][0] - rough[i][0];
      double dy = rough[i + 1][1] - rough[i][1];
      return (dx * std::cos(rough[i][2]) + dy * std::sin(rough[i][2])) >= 0
                 ? 1
                 : -1;
    };
    int lastS = dirOf(0);
    for (size_t i = 0; i + 1 < rough.size(); ++i) {
      int curS = dirOf((int)i);
      double d = std::hypot(rough[i + 1][0] - rough[i][0],
                            rough[i + 1][1] - rough[i][1]);
      if (curS * lastS >= 0) {
        tmpl += d;
      } else {
        span_start.push_back((int)i);
        span_sig.push_back(lastS);
        span_len.push_back(tmpl);
        tmpl = d;
      }
      lastS = curS;
    }
    span_sig.push_back(lastS);
    span_len.push_back(tmpl);
    span_start.push_back((int)rough.size() - 1);

    int nseg = (int)span_sig.size();
    std::vector<double> span_time(nseg);
    for (int i = 0; i < nseg; ++i) {
      double iv = p_.non_siguav, fv = p_.non_siguav;
      if (i == 0) iv = startvel;
      if (i == nseg - 1) fv = endvel;
      double mv = span_sig[i] > 0 ? p_.max_vel_f : p_.max_vel_b;
      double ma = span_sig[i] > 0 ? p_.max_acc_f : p_.max_acc_b;
      span_time[i] = evaluateDuration(span_len[i], mv, ma, iv, fv);
    }

    // resample each span at sample_time
    for (int i = 0; i < nseg; ++i) {
      double iv = p_.non_siguav, fv = p_.non_siguav;
      double ictrl[2] = {0, 0}, fctrl[2] = {0, 0};
      if (i == 0) {
        iv = startvel;
        ictrl[0] = start_ctrl_[0];
        ictrl[1] = start_ctrl_[1];
      }
      if (i == nseg - 1) fv = endvel;
      double mv = span_sig[i] > 0 ? p_.max_vel_f : p_.max_vel_b;
      double ma = span_sig[i] > 0 ? p_.max_acc_f : p_.max_acc_b;

      int a = span_start[i], b = span_start[i + 1];
      FlatSegment seg;
      seg.singul = span_sig[i];
      seg.duration = span_time[i];
      double sampletime = p_.sample_time;
      if (span_time[i] <= sampletime) sampletime = span_time[i] / 2.0;

      double tmparc = 0;
      int index = a;
      double samplet;
      for (samplet = sampletime; samplet < span_time[i];
           samplet += sampletime) {
        double arc = evaluateLength(samplet, span_len[i], span_time[i], mv,
                                    ma, iv, fv);
        for (int k = index; k < b; ++k) {
          double d = std::hypot(rough[k + 1][0] - rough[k][0],
                                rough[k + 1][1] - rough[k][1]);
          tmparc += d;
          if (tmparc >= arc) {
            index = k;
            double l1 = tmparc - arc, l = d, l2 = l - l1;
            double px = (l1 * rough[k][0] + l2 * rough[k + 1][0]) / l;
            double py = (l1 * rough[k][1] + l2 * rough[k + 1][1]) / l;
            double y0 = rough[k][2], y1 = rough[k + 1][2];
            double yaw = (l1 * y0 + l2 * y1) / l;
            if (std::fabs(y1 - y0) >= kPi) {  // wrap-aware interpolation
              if (y1 <= 0)
                yaw = (l1 * y0 + l2 * (y1 + 2 * kPi)) / l;
              else if (y0 <= 0)
                yaw = (l1 * (y0 + 2 * kPi) + l2 * y1) / l;
            }
            seg.pts.push_back(px);
            seg.pts.push_back(py);
            seg.pts.push_back(sampletime);
            seg.thetas.push_back(yaw);
            tmparc -= d;
            break;
          }
        }
      }
      seg.pts.push_back(rough[b][0]);
      seg.pts.push_back(rough[b][1]);
      seg.pts.push_back(span_time[i] - (samplet - sampletime));
      seg.thetas.push_back(rough[b][2]);

      getFlatState(rough[a][0], rough[a][1], rough[a][2], iv, ictrl[0],
                   ictrl[1], p_.wheel_base, seg.singul, p_.non_siguav,
                   seg.start_state);
      getFlatState(rough[b][0], rough[b][1], rough[b][2], fv, fctrl[0],
                   fctrl[1], p_.wheel_base, seg.singul, p_.non_siguav,
                   seg.final_state);
      out->segs.push_back(std::move(seg));
      out->total_time += span_time[i];
    }
    out->span_start = span_start;
    out->span_sig = span_sig;
    out->span_len = span_len;
    out->span_time = span_time;
    out->startvel = startvel;
    out->endvel = endvel;
    out->max_vel_f = p_.max_vel_f;
    out->max_acc_f = p_.max_acc_f;
    out->max_vel_b = p_.max_vel_b;
    out->max_acc_b = p_.max_acc_b;
    out->non_siguav = p_.non_siguav;
    out->status = 1;
    return *out;
  }

  const GridMap* map_;
  KinoParams p_;
  RSSpace rs_;
  double start_[4], end_[4], start_ctrl_[2];
  std::vector<Node> nodes_;
  std::unordered_map<HashKey, int, HashKeyHash> lookup_;
  using QE = std::pair<double, int>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> open_;
  int terminal_ = -1;
 public:
  int dbg_iters_ = 0, dbg_shots_ = 0;
  int dbg_occ_ = 0, dbg_closed_ = 0, dbg_same_ = 0, dbg_create_ = 0,
      dbg_improve_ = 0, dbg_worse_ = 0;
 private:
  bool rs_path_found_ = false;
  RSSolution shot_sol_;
  double shot_from_[3];
};

// ---------------------------------------------------------------------------
// Corridor: rectangle grown from the vehicle OBB (traj_manager.cpp:1213-1469)
// ---------------------------------------------------------------------------

// Output per state: 16 doubles = 4 x (nx, ny, px, py) outward half-planes.
void growRectangles(const GridMap& map, const double* states, int n,
                    double veh_length, double veh_width, double d_cr,
                    double limit, double* out) {
  double step = map.res;
  for (int si = 0; si < n; ++si) {
    double x = states[3 * si], y = states[3 * si + 1], yaw = states[3 * si + 2];
    double c = std::cos(yaw), s = std::sin(yaw);
    // expansion per side: +w (left), +l (front), -w (right), -l (back)
    double ext[4] = {0, 0, 0, 0};
    bool active[4] = {true, true, true, true};
    auto corner = [&](double lx, double ly, double* p) {
      p[0] = x + c * lx - s * ly;
      p[1] = y + s * lx + c * ly;
    };
    while (active[0] || active[1] || active[2] || active[3]) {
      for (int i = 0; i < 4; ++i) {
        if (!active[i]) continue;
        // current rectangle extents in body frame (about rear axle + d_cr)
        double fr = d_cr + veh_length / 2.0 + ext[1];
        double bk = d_cr - veh_length / 2.0 - ext[3];
        double lf = veh_width / 2.0 + ext[0];
        double rt = -veh_width / 2.0 - ext[2];
        double p1[2], p2[2], q1[2], q2[2];
        switch (i) {
          case 0:  // grow left (+y)
            corner(fr, lf, p1);
            corner(bk, lf, p2);
            corner(fr, lf + step, q1);
            corner(bk, lf + step, q2);
            break;
          case 1:  // grow front (+x)
            corner(fr, lf, p1);
            corner(fr, rt, p2);
            corner(fr + step, lf, q1);
            corner(fr + step, rt, q2);
            break;
          case 2:  // grow right (-y)
            corner(fr, rt, p1);
            corner(bk, rt, p2);
            corner(fr, rt - step, q1);
            corner(bk, rt - step, q2);
            break;
          default:  // grow back (-x)
            corner(bk, lf, p1);
            corner(bk, rt, p2);
            corner(bk - step, lf, q1);
            corner(bk - step, rt, q2);
            break;
        }
        bool occ = map.line_collides(p1[0], p1[1], q1[0], q1[1], map.res / 2) ||
                   map.line_collides(q1[0], q1[1], q2[0], q2[1], map.res / 2) ||
                   map.line_collides(q2[0], q2[1], p2[0], p2[1], map.res / 2);
        if (occ) {
          active[i] = false;
          continue;
        }
        ext[i] += step;
        if (ext[i] >= limit) active[i] = false;
      }
    }
    // emit half-planes: outward normals (left, front, right, back)
    double fr = d_cr + veh_length / 2.0 + ext[1];
    double bk = d_cr - veh_length / 2.0 - ext[3];
    double lf = veh_width / 2.0 + ext[0];
    double rt = -veh_width / 2.0 - ext[2];
    double* o = out + 16 * si;
    // left: normal (-s, c), point at (d_cr, lf)
    o[0] = -s;
    o[1] = c;
    o[2] = x + c * d_cr - s * lf;
    o[3] = y + s * d_cr + c * lf;
    // front: normal (c, s), point (fr, 0)
    o[4] = c;
    o[5] = s;
    o[6] = x + c * fr;
    o[7] = y + s * fr;
    // right: normal (s, -c), point (d_cr, rt)
    o[8] = s;
    o[9] = -c;
    o[10] = x + c * d_cr - s * rt;
    o[11] = y + s * d_cr + c * rt;
    // back: normal (-c, -s), point (bk, 0)
    o[12] = -c;
    o[13] = -s;
    o[14] = x + c * bk;
    o[15] = y + s * bk;
  }
}

// Position/yaw on the rough path at absolute plan time t
// (KinoAstar::evaluatePos, kino_astar.cpp:469-521).
void planEvaluatePos(const PlanResult& r, double t, double* out3) {
  double total = 0;
  for (double dt : r.span_time) total += dt;
  t = std::min(std::max(t, 0.0), total);
  int index = -1;
  double tmpT = 0, cut = 0;
  for (size_t i = 0; i < r.span_time.size(); ++i) {
    tmpT += r.span_time[i];
    if (tmpT >= t) {
      index = (int)i;
      cut = t - tmpT + r.span_time[i];
      break;
    }
  }
  if (index < 0) index = (int)r.span_time.size() - 1;
  double iv = r.non_siguav, fv = r.non_siguav;
  if (index == 0) iv = r.startvel;
  if (index == (int)r.span_time.size() - 1) fv = r.endvel;
  double mv = r.span_sig[index] > 0 ? r.max_vel_f : r.max_vel_b;
  double ma = r.span_sig[index] > 0 ? r.max_acc_f : r.max_acc_b;
  double arc = evaluateLength(cut, r.span_len[index], r.span_time[index], mv,
                              ma, iv, fv);
  int a = r.span_start[index], b = r.span_start[index + 1];
  const double* S = r.sample_traj.data();
  double tmparc = 0;
  for (int k = a; k < b; ++k) {
    double dx = S[3 * (k + 1)] - S[3 * k], dy = S[3 * (k + 1) + 1] - S[3 * k + 1];
    double d = std::hypot(dx, dy);
    tmparc += d;
    if (tmparc >= arc) {
      double l1 = tmparc - arc, l = std::max(d, 1e-12), l2 = l - l1;
      out3[0] = (l1 * S[3 * k] + l2 * S[3 * (k + 1)]) / l;
      out3[1] = (l1 * S[3 * k + 1] + l2 * S[3 * (k + 1) + 1]) / l;
      double y0 = S[3 * k + 2], y1 = S[3 * (k + 1) + 2];
      double yaw = (l1 * y0 + l2 * y1) / l;
      if (std::fabs(y1 - y0) >= kPi) {
        if (y1 <= 0) yaw = (l1 * y0 + l2 * (y1 + 2 * kPi)) / l;
        else if (y0 <= 0) yaw = (l1 * (y0 + 2 * kPi) + l2 * y1) / l;
      }
      out3[2] = yaw;
      return;
    }
  }
  out3[0] = S[3 * b];
  out3[1] = S[3 * b + 1];
  out3[2] = S[3 * b + 2];
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

void* df_map_create(int nx, int ny, double ox, double oy, double res,
                    const uint8_t* occ) {
  auto* m = new GridMap;
  m->nx = nx;
  m->ny = ny;
  m->ox = ox;
  m->oy = oy;
  m->res = res;
  m->inv_res = 1.0 / res;
  m->occ.assign(occ, occ + (size_t)nx * ny);
  return m;
}

void df_map_destroy(void* m) { delete (GridMap*)m; }

int df_map_occupied(void* m, double x, double y) {
  return ((GridMap*)m)->occupied(x, y) ? 1 : 0;
}

int df_map_obb_collides(void* m, double x, double y, double yaw,
                        double length, double width, double d_cr) {
  return ((GridMap*)m)->obb_collides(x, y, yaw, length, width, d_cr) ? 1 : 0;
}

int df_map_line_collides(void* m, double x0, double y0, double x1, double y1,
                         double spacing) {
  return ((GridMap*)m)->line_collides(x0, y0, x1, y1, spacing) ? 1 : 0;
}

// Reeds-Shepp standalone: distance + n interpolated poses.
double df_rs_distance(double radius, const double* q0, const double* q1) {
  RSSpace sp{radius};
  return sp.distance(q0, q1);
}

void df_rs_sample(double radius, const double* q0, const double* q1, int n,
                  double* out /*3n*/) {
  RSSpace sp{radius};
  RSSolution sol = sp.solve(q0, q1);
  double len = sol.total * radius;
  for (int i = 0; i < n; ++i) {
    double l = len * i / std::max(1, n - 1);
    sp.interpolate(q0, sol, l, out + 3 * i);
  }
}

void* df_plan(void* map, const double* params /*see order below*/,
              const double* start4, const double* start_ctrl2,
              const double* end4) {
  KinoParams p;
  int i = 0;
  p.wheel_base = params[i++];
  p.veh_length = params[i++];
  p.veh_width = params[i++];
  p.d_cr = params[i++];
  p.max_cur = params[i++];
  p.step_arc = params[i++];
  p.grid_res = params[i++];
  p.yaw_res = params[i++];
  p.lambda_heu = params[i++];
  p.max_search_time = params[i++];
  p.check_num = (int)params[i++];
  p.allocate_num = (int)params[i++];
  p.oneshot_range = params[i++];
  p.checkl = params[i++];
  p.forward_penalty = params[i++];
  p.back_penalty = params[i++];
  p.gear_penalty = params[i++];
  p.steer_penalty = params[i++];
  p.steer_change_penalty = params[i++];
  p.horizon = params[i++];
  p.max_vel_f = params[i++];
  p.max_acc_f = params[i++];
  p.max_vel_b = params[i++];
  p.max_acc_b = params[i++];
  p.non_siguav = params[i++];
  p.sample_time = params[i++];
  p.use3d = params[i++] > 0.5;
  KinoAstar astar((GridMap*)map, p);
  auto* r = new PlanResult(astar.plan(start4, start_ctrl2, end4));
  r->iters = astar.dbg_iters_;
  r->shots = astar.dbg_shots_;
  if (p.use3d && r->status != 1) {
    // the reference's retry: 3D (yaw-keyed) search first, fall back to the
    // 2D key on failure (traj_manager.cpp:85-93)
    KinoParams p2 = p;
    p2.use3d = false;
    KinoAstar astar2((GridMap*)map, p2);
    PlanResult r2 = astar2.plan(start4, start_ctrl2, end4);
    if (r2.status == 1) {
      *r = r2;
      r->iters = astar2.dbg_iters_;
      r->shots = astar2.dbg_shots_;
    }
  }
  return r;
}

int df_plan_status(void* r) { return ((PlanResult*)r)->status; }
int df_plan_iters(void* r) { return ((PlanResult*)r)->iters; }
int df_plan_shots(void* r) { return ((PlanResult*)r)->shots; }
double df_plan_total_time(void* r) { return ((PlanResult*)r)->total_time; }
int df_plan_nsegs(void* r) { return (int)((PlanResult*)r)->segs.size(); }
int df_plan_seg_npts(void* r, int i) {
  return (int)((PlanResult*)r)->segs[i].thetas.size();
}
int df_plan_seg_singul(void* r, int i) {
  return ((PlanResult*)r)->segs[i].singul;
}
double df_plan_seg_duration(void* r, int i) {
  return ((PlanResult*)r)->segs[i].duration;
}
void df_plan_seg_data(void* r, int i, double* pts, double* thetas,
                      double* startS, double* endS) {
  const FlatSegment& s = ((PlanResult*)r)->segs[i];
  std::memcpy(pts, s.pts.data(), s.pts.size() * sizeof(double));
  std::memcpy(thetas, s.thetas.data(), s.thetas.size() * sizeof(double));
  std::memcpy(startS, s.start_state, 6 * sizeof(double));
  std::memcpy(endS, s.final_state, 6 * sizeof(double));
}
int df_plan_nsamples(void* r) {
  return (int)((PlanResult*)r)->sample_traj.size() / 3;
}
void df_plan_samples(void* r, double* out) {
  const auto& s = ((PlanResult*)r)->sample_traj;
  std::memcpy(out, s.data(), s.size() * sizeof(double));
}
void df_plan_destroy(void* r) { delete (PlanResult*)r; }

void df_corridors(void* map, const double* states, int n, double veh_length,
                  double veh_width, double d_cr, double limit, double* out) {
  growRectangles(*(GridMap*)map, states, n, veh_length, veh_width, d_cr,
                 limit, out);
}

void df_plan_evaluate_pos(void* r, double t, double* out3) {
  planEvaluatePos(*(PlanResult*)r, t, out3);
}

// Per-segment scenario extraction (TrajPlanner::RunMINCOParking re-piecing,
// traj_manager.cpp:531-594): choose piece count for segment i from its
// duration, sample the kino path at the constraint grid (Kdes samples on
// first/last piece, K on interior), emit inner waypoints and grown-rectangle
// corridors per constraint point.
// Outputs (caller-allocated, np = piece count, K1 = Kdes + 1):
//   dT[1], inner[(np-1)*2], states[np*K1*3], corr[np*K1*16]
// Invalid sample slots (k > K on interior pieces) repeat the last valid
// sample so downstream masks can ignore them.
int df_plan_segment_pieces(void* rp, int i, double piece_dur) {
  PlanResult* r = (PlanResult*)rp;
  double dur = r->span_time[i];
  int np = (int)(dur / piece_dur + 0.5);
  return np < 2 ? 2 : np;
}

void df_plan_segment_scenario(void* rp, void* map, int i, int K, int Kdes,
                              double piece_dur, double veh_length,
                              double veh_width, double d_cr, double limit,
                              double* dT, double* inner, double* states,
                              double* corr) {
  PlanResult* r = (PlanResult*)rp;
  int np = df_plan_segment_pieces(rp, i, piece_dur);
  double dur = r->span_time[i];
  double tpp = dur / np;
  *dT = tpp;
  double base = 0;
  for (int s = 0; s < i; ++s) base += r->span_time[s];
  int K1 = Kdes + 1;
  double res_time = 0;
  for (int p = 0; p < np; ++p) {
    int resol = (p == 0 || p == np - 1) ? Kdes : K;
    double last[3] = {0, 0, 0};
    for (int k = 0; k <= Kdes; ++k) {
      double* out = states + 3 * (p * K1 + k);
      if (k <= resol) {
        double t = base + res_time + tpp * k / resol;
        planEvaluatePos(*r, t, out);
        std::copy(out, out + 3, last);
        if (k == resol && p != np - 1) {
          inner[2 * p] = out[0];
          inner[2 * p + 1] = out[1];
        }
      } else {
        std::copy(last, last + 3, out);
      }
    }
    res_time += tpp;
  }
  growRectangles(*(GridMap*)map, states, np * K1, veh_length, veh_width,
                 d_cr, limit, corr);
}

}  // extern "C" 
