"""Configuration for the planner, optimizer and solver.

Mirrors the semantics of the reference's protobuf config
(/root/reference/src/Plan/traj_planner/proto/minco_config.proto and the deployed
values in config/minco_config.pb.txt) as plain frozen dataclasses, loadable from
JSON. Field defaults equal the reference's deployed values.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class VehicleParam:
    """Car-like vehicle geometry.

    Defaults follow common::VehicleParam
    (reference: src/Sim/core/common/inc/common/basics/semantics.h:66-76).
    ``d_cr`` is the distance from the rear axle (the flat-output point) to the
    geometric center of the body rectangle.
    """

    width: float = 1.90
    length: float = 4.88
    wheel_base: float = 2.85
    d_cr: float = 1.015
    max_steering_angle: float = 0.7  # rad

    def inflate(self, margin: float) -> "VehicleParam":
        """Grow width/length by 2*margin (reference: traj_optimizer.cpp:1747-1748)."""
        return dataclasses.replace(
            self, width=self.width + 2.0 * margin, length=self.length + 2.0 * margin
        )


@dataclasses.dataclass(frozen=True)
class LBFGSParams:
    """L-BFGS solver parameters (reference: lbfgs.hpp:15-128 defaults,
    overridden per traj_optimizer.cpp:127-134 + minco_config.pb.txt:96-99).

    mem_size deviates from the reference's 256: the two-loop recursion is
    2*m *sequential* tiny ops per iteration — pure latency on TPU (~30 ms/iter
    at m=256) — and with ~15-50 decision variables any m >= dim is already
    exact BFGS. m=16 keeps the quality and cuts iteration latency ~16x.
    """

    mem_size: int = 16
    past: int = 3
    delta: float = 1.0e-4
    g_epsilon: float = 1.0e-16
    max_iterations: int = 12000
    # 64 in the reference (lbfgs.hpp); 24 measured quality-identical on the
    # bench fixtures (B=1024: success 1.0 and cost_p50 unchanged) while the
    # batched line search pays the MAX trial count across lanes per iteration
    max_linesearch: int = 24
    min_step: float = 1.0e-32
    max_step: float = 1.0e20
    f_dec_coeff: float = 1.0e-4
    s_curv_coeff: float = 0.9
    cautious_factor: float = 1.0e-6
    machine_prec: float = 1.0e-16


@dataclasses.dataclass(frozen=True)
class OptConfig:
    """Back-end optimizer configuration (reference opt_cfg block,
    minco_config.pb.txt:65-100, consumed in traj_optimizer.cpp:1711-1735)."""

    traj_resolution: int = 16       # constraint samples per interior piece
    destraj_resolution: int = 32    # constraint samples per first/last piece
    wei_obs: float = 1000.0         # static-obstacle (corridor) weight
    wei_surround: float = 5000.0    # dynamic-obstacle weight
    wei_feas: float = 2500.0        # feasibility weight
    wei_sqrvar: float = 500.0       # (unused by the parking path, kept for parity)
    wei_time: float = 500.0         # time-regularization weight
    surround_clearance: float = 0.4
    half_margin: float = 0.15       # hull inflation for the optimizer
    traj_piece_duration: float = 1.0

    max_forward_vel: float = 5.0
    max_forward_acc: float = 8.0
    max_forward_cur: float = 1.0
    max_backward_vel: float = 2.0
    max_backward_acc: float = 4.0
    max_backward_cur: float = 1.0
    max_latacc: float = 5.0
    max_phidot: float = 10000.0

    # Gear-junction speed magnitude (reference: traj_optimizer.h:68 `non_sinv`).
    non_sinv: float = 0.24
    gear_opt: bool = True
    mini_t: float = 0.1             # minimum real duration per piece-average
    # epsilon regularizer for 1/(|v|^2+eps); the parking pipeline passes 0.0
    # (reference: traj_manager.cpp:612 `OptimizeTrajectory(..., 0.0)`).
    epis: float = 0.0
    # LSE sharpness for the polytope-vs-polytope signed distance
    # (reference: traj_optimizer.cpp:1336 `alpha = 100.0`).
    lse_alpha: float = 100.0

    lbfgs: LBFGSParams = dataclasses.field(default_factory=LBFGSParams)

    # Optimization rejected if final cost >= this (reference: traj_optimizer.cpp:197).
    reject_cost: float = 50000.0

    # Global objective scaling. L-BFGS is scale-invariant in exact arithmetic
    # (the first trial step is 1/|d| and later directions are ys/yy-scaled),
    # so this is a no-op in f64 — but in the f32 fast path the raw cost sits at
    # ~1e3-1e4 where float32 resolution (~1e0) swamps the past-delta stopping
    # test (delta=1e-4 relative). Scaling to O(1) restores meaningful
    # convergence checks. Reported costs are unscaled.
    cost_scale: float = 1.0e-3

    # Reproduce the reference's segment-time-offset quirk: costFunctionCallback
    # builds trajtimes = [0, T0, T1, ...] (traj_optimizer.cpp:230-234), i.e.
    # segment i >= 2 is offset by T_{i-1} alone instead of sum(T[:i]). Our
    # default uses the true cumulative sum (correct absolute time for the
    # dynamic-obstacle penalty); enable this only for golden parity runs
    # against the compiled C++ at S >= 3.
    ref_trajtime_compat: bool = False

    # Additionally reproduce the reference's cross-segment time-GRADIENT
    # misattribution (traj_optimizer.cpp:1674-1676 adds earlier-segment
    # duration sensitivity to the current segment's gdT). With this on, the
    # engine matches the compiled C++ iterate path bit-exactly for S >= 2
    # with obstacles; see cost.ref_compat_value_and_grad. Golden-parity use
    # only — the default gradient is the true gradient of the objective.
    ref_gradient_compat: bool = False

    # Corridor-penalty backend in the batch-minor engine: "xla" (fused
    # elementwise chains), "pallas" (the fused forward+VJP kernel in
    # ops/pallas_penalty.py), or "auto" (pallas on TPU, xla elsewhere).
    # Measured on v5e at B=1024: pallas is 8% faster per cost+grad eval
    # (3.63 vs 3.97 ms) but 8% slower end-to-end inside the L-BFGS while
    # loop (custom-call boundaries block XLA's cross-eval scheduling), so
    # the default stays "xla"; see PERF.md.
    corridor_backend: str = "xla"


@dataclasses.dataclass(frozen=True)
class EngineFlags:
    """Solver-engine tuning knobs (trace-time constants).

    Grown from the round-3/4 DFTPAV_* environment variables into the config
    system (they used to be read at trace time inside ops/ — exec-cache
    soundness then required scraping os.environ). Every knob is a
    compile-time constant: changing one recompiles the solver class.
    The defaults are the PARITY semantics — exact lbfgs.hpp trial-sequence
    behavior, fp32-contract matmuls — which the golden C++ parity tests
    assert explicitly. Benchmarks opt into the tuned stack via
    `EngineFlags.tuned()`.

    Env overrides: `EngineFlags.from_env(base)` applies any set DFTPAV_*
    variables over `base` — parsed HERE and nowhere else; library code never
    reads os.environ.
    """

    # Line-search warm start: next search starts from the lane's previous
    # ACCEPTED step x mult (clipped to [lo, 1]) instead of the constant 1.0
    # (lbfgs.hpp:276 behavior). Same stationary points, different trial
    # sequence — off by default for exact lbfgs.hpp path parity.
    adaptive_step: bool = False
    adaptive_step_lo: float = 0.5
    adaptive_step_mult: float = 2.0
    # Diagonal preconditioning of the virtual-time rows: segment s is solved
    # in vt' = vt / sigma_s, rebalancing the O(1) time coordinates against
    # the meter-scale waypoints. A float applies one sigma to every segment;
    # a tuple gives each segment SLOT its own sigma; "auto" derives sigma_s
    # from the slot's piece count (long slots get strong preconditioning,
    # short reversal slots keep sigma 1 — the round-4 global sigma=0.25
    # cost the (8,2) reverse-park class 3% success). See resolve_vt_scale.
    vt_scale: float | tuple | str = 1.0
    # Objective sample-map matmul mode: "f32" exact fp32 contracts (~6 bf16
    # MXU passes), "x3" 3-pass bf16 Dekker splits (~2^-17 relative, the
    # headline's mixed precision), "bf16" single-pass (line-search-degrading;
    # exploration only).
    mxu: str = "f32"
    # Solver-frame matmul mode for the round loop's layout-forced matmuls
    # ("f32" exact contracts — measured fastest on v5e; "fast"/"bf16" kept
    # for hardware where the trade flips — PERF.md).
    frame: str = "f32"
    # Canonicalize the L-BFGS history slots each round (Mosaic layout
    # hygiene; ~2% cost, known-good default).
    clean_hist: bool = True
    # Rematerialize the dynamic-obstacle block in the chunked VJP (saves
    # VMEM at ~3% throughput; only needed if a future class spills).
    obs_ckpt: bool = False
    # Initial time-scaling line search (3 extra objective evals probing
    # total-duration multiples before round 0). Experiment knob.
    t_prescale: bool = False
    # Multi-phase lane compaction for the fused kernel: every 128-lane tile
    # runs rounds until its SLOWEST lane finishes, and the iteration tail
    # is fat (p50 72, p95 ~150 — ~half of all rounds serve <15% of lanes).
    # Each (frac, iters) entry appends a phase that gathers the
    # still-running lanes (device-side top-k, zero host round-trips) into
    # ceil(frac*B) dense lanes and continues them for `iters` more
    # iterations (L-BFGS restarts from the carried iterate); the initial
    # phase gets max_iterations - sum(iters). () = single-phase (exact
    # round-4 semantics).
    phases: tuple = ()

    @staticmethod
    def tuned() -> "EngineFlags":
        """The benchmark stack (PERF.md round-4/5): in-round mixed-precision
        matmuls + floorless x1.2 adaptive warm step + auto per-slot
        virtual-time preconditioning."""
        return EngineFlags(adaptive_step=True, adaptive_step_lo=1e-3,
                           adaptive_step_mult=1.2, vt_scale="auto",
                           mxu="x3")

    @staticmethod
    def from_env(base: "EngineFlags | None" = None) -> "EngineFlags":
        """`base` (default EngineFlags()) with any set DFTPAV_* env knobs
        applied — the ONE place environment variables are parsed."""
        import os

        f = base or EngineFlags()
        env = os.environ
        kw = {}
        if "DFTPAV_ADAPTIVE_STEP" in env:
            kw["adaptive_step"] = env["DFTPAV_ADAPTIVE_STEP"] == "1"
        if "DFTPAV_ADAPTIVE_STEP_LO" in env:
            kw["adaptive_step_lo"] = float(env["DFTPAV_ADAPTIVE_STEP_LO"])
        if "DFTPAV_ADAPTIVE_STEP_MULT" in env:
            kw["adaptive_step_mult"] = float(env["DFTPAV_ADAPTIVE_STEP_MULT"])
        if "DFTPAV_VT_SCALE" in env:
            v = env["DFTPAV_VT_SCALE"]
            kw["vt_scale"] = v if v == "auto" else float(v)
        if "DFTPAV_MXU" in env:
            kw["mxu"] = env["DFTPAV_MXU"]
        if "DFTPAV_FRAME" in env:
            kw["frame"] = env["DFTPAV_FRAME"]
        if "DFTPAV_CLEAN_HIST" in env:
            kw["clean_hist"] = env["DFTPAV_CLEAN_HIST"] != "0"
        if "DFTPAV_OBS_CKPT" in env:
            kw["obs_ckpt"] = env["DFTPAV_OBS_CKPT"] == "1"
        if "DFTPAV_T_PRESCALE" in env:
            kw["t_prescale"] = env["DFTPAV_T_PRESCALE"] == "1"
        if "DFTPAV_PHASES" in env:
            # "0.625:40,0.25:40" -> ((0.625, 40), (0.25, 40)); "" -> ()
            v = env["DFTPAV_PHASES"]
            kw["phases"] = tuple(
                (float(p.split(":")[0]), int(p.split(":")[1]))
                for p in v.split(",") if p)
        return dataclasses.replace(f, **kw) if kw else f


def resolve_vt_scale(vt_scale, ns_tuple) -> tuple:
    """Per-segment-slot virtual-time sigma as a tuple of floats.

    "auto" scales each slot by its piece count relative to the 8-piece
    headline class where sigma=0.25 was tuned (PERF.md): sigma_s =
    min(1, 2 / Ns[s]) — an 8-piece approach slot gets 0.25, a 2-piece
    reversal slot keeps 1.0 (its duration is already O(1), and the global
    0.25 measurably hurt it)."""
    if vt_scale == "auto":
        return tuple(min(1.0, 2.0 / n) for n in ns_tuple)
    if isinstance(vt_scale, (int, float)):
        return (float(vt_scale),) * len(ns_tuple)
    assert len(vt_scale) == len(ns_tuple), (vt_scale, ns_tuple)
    return tuple(float(v) for v in vt_scale)


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Kinodynamic A* front-end configuration (reference map_cfg block,
    minco_config.pb.txt:13-63, consumed in kino_astar.cpp:372-442)."""

    map_size_x: float = 1000.0
    map_size_y: float = 1000.0
    horizon: float = 50.0
    yaw_resolution: float = 0.3
    lambda_heu: float = 5.0
    allocate_num: int = 100000
    check_num: int = 5
    max_search_time: float = 1.0
    traj_forward_penalty: float = 1.0
    traj_back_penalty: float = 2.5
    traj_gear_switch_penalty: float = 15.0
    traj_steer_penalty: float = 0.5
    traj_steer_change_penalty: float = 0.0
    map_resolution: float = 0.3
    step_arc: float = 0.9
    checkl: float = 0.2
    oneshot_range: float = 15.0     # RS one-shot attempted within this distance
    # front-end kinematic limits (minco_config.pb.txt:77-81)
    max_frontend_forward_vel: float = 5.0
    max_frontend_forward_acc: float = 8.0
    max_frontend_backward_vel: float = 2.0
    max_frontend_backward_acc: float = 4.0
    max_frontend_cur: float = 1.0
    # near-zero speed placeholder (reference: kino_astar.h:207 `non_siguav`)
    non_siguav: float = 0.2
    collision_margin: float = 0.2   # vehicle inflation for A* checks (kino_astar.cpp:426)
    sample_time: float = 0.1        # resample period for flat traj (kino_astar.cpp:683)
    # yaw-keyed node dedup (the reference's use3d first attempt,
    # traj_manager.cpp:85-93; yaw-indexed node table kino_astar.cpp:71-74,
    # 191-194): states reaching a cell at different headings stay distinct,
    # which keeps the heading-multiplicity maneuvers tight parking needs.
    # The native planner falls back to the 2D key when the 3D search fails,
    # exactly like the reference's retry.
    use3d: bool = True


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    vehicle: VehicleParam = dataclasses.field(default_factory=VehicleParam)
    opt: OptConfig = dataclasses.field(default_factory=OptConfig)
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)

    # runtime (reference: traj_server_ros.cpp:38,107 + traj_server_ros.h:58)
    replan_rate_hz: float = 20.0
    control_rate_hz: float = 100.0
    plan_budget_s: float = 0.5

    def ego_hull(self):
        """Clockwise body-frame hull vertices of the (optimizer-inflated) vehicle,
        about the rear-axle flat output (reference: traj_optimizer.cpp:1760-1770).

        Returns a (4, 2) list: [le_1, le_2, le_3, le_4]; consumers append le_1 to
        close the polygon.
        """
        vp = self.vehicle.inflate(self.opt.half_margin)
        hl, hw, dcr = vp.length / 2.0, vp.width / 2.0, vp.d_cr
        return [
            (dcr + hl, hw),
            (dcr + hl, -hw),
            (dcr - hl, -hw),
            (dcr - hl, hw),
        ]


def _from_dict(cls, d: dict[str, Any]):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or f.name in (
            "vehicle", "opt", "frontend", "lbfgs",
        ):
            sub = {"vehicle": VehicleParam, "opt": OptConfig,
                   "frontend": FrontendConfig, "lbfgs": LBFGSParams}[f.name]
            v = _from_dict(sub, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str) -> PlannerConfig:
    """Load a PlannerConfig from a JSON file; missing fields keep defaults."""
    with open(path) as f:
        return _from_dict(PlannerConfig, json.load(f))


def save_config(cfg: PlannerConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
