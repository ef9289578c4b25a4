"""Golden parity against the ACTUAL compiled C++ reference optimizer.

golden/oracle_main.cpp compiles /root/reference's PolyTrajOptimizer unmodified
(headless stubs replace ROS/proto/viz headers); these tests feed identical
fixtures to the compiled reference and to the JAX engine and assert the
optimized trajectories agree to < 1e-3 (the BASELINE.md parity bar). This
closes the round-1 gap where parity was only checked against a hand-written
NumPy oracle.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from golden import fixture as gf  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dftpav_tpu import scenarios  # noqa: E402
from dftpav_tpu.config import LBFGSParams, PlannerConfig  # noqa: E402
from dftpav_tpu.solver import make_solver  # noqa: E402
from dftpav_tpu.types import Dims, state_to_flat, weights_from_config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not gf.ensure_oracle_built(),
    reason="golden oracle unavailable (no g++ or /root/reference)")

# Match the reference's L-BFGS envelope (traj_optimizer.cpp:127-134). mem_size
# stays at our 16 (>= problem dim for N=8 single-gear, so the search direction
# is full-memory BFGS either way); stopping criteria are identical. The
# past-delta tolerance is tightened IDENTICALLY on both sides: at the deployed
# delta=1e-4 each optimizer legitimately stops anywhere in a ~1e-3-wide basin
# around the optimum (measured 2.4e-3 apart; still PASSING the 1e-3 bar at
# delta=1e-7 with 9e-4), so trajectory parity is asserted at delta=1e-11 where
# the shared stationary point is resolved (measured 3e-5).
_DELTA = 1.0e-11
_LBFGS = LBFGSParams(max_linesearch=64, delta=_DELTA)


def _config(**opt_overrides) -> PlannerConfig:
    cfg = PlannerConfig()
    return dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, lbfgs=_LBFGS, **opt_overrides))


def _solve_mine(scen, dims, cfg):
    solve = make_solver(cfg, dims, engine="vmap")
    batched = type(scen)(*(jnp.asarray(leaf)[None] for leaf in scen))
    w = weights_from_config(cfg.opt, jnp.float64)
    res = solve(batched, w)
    return (np.asarray(res.coeffs[0], np.float64),
            np.asarray(res.dT[0], np.float64),
            bool(res.success[0]))


def _compare(scen, dims, cfg, tmp_path, n_samples=200, tol=1e-3,
             lbfgs_past=None, require_ok=True):
    fx = tmp_path / "fixture.txt"
    delta = cfg.opt.lbfgs.delta
    gf.scenario_to_fixture(
        type(scen)(*(np.asarray(leaf, np.float64) for leaf in scen)),
        dims, fx, lbfgs_delta=delta, lbfgs_past=lbfgs_past)
    ok_cpp, segs = gf.run_oracle(fx, n_samples=n_samples)

    coeffs, dT, ok_mine = _solve_mine(scen, dims, cfg)
    if require_ok:
        assert ok_cpp, "compiled reference failed to optimize the fixture"
        assert ok_mine

    max_dev, max_dT = 0.0, 0.0
    S = int(np.sum(scen.seg_mask))
    for s in range(S):
        _, mine = gf.sample_segment_positions(coeffs[s], dT[s], n_samples)
        cpp = np.array([(x, y) for (_, x, y) in segs[s]["pts"]])
        dev = float(np.max(np.linalg.norm(mine - cpp, axis=-1)))
        ddT = abs(float(dims.N * dT[s]) - segs[s]["T"])
        max_dev, max_dT = max(max_dev, dev), max(max_dT, ddT)
    assert max_dev < tol, f"trajectory deviation {max_dev:.3e} >= {tol}"
    return max_dev, max_dT


def _path_parity_config(past: int) -> PlannerConfig:
    """Fixed-iteration path parity: delta=1e18 stops BOTH engines after
    exactly `past` iterations. With past <= mem_size the L-BFGS history
    windows are identical, so every iterate (directions, Lewis-Overton trial
    sequences, accepted steps) must agree to machine precision if and only if
    cost AND gradient match the compiled C++ along the whole path — a far
    sharper check than comparing flat-valley limit points. cost_scale=1 so
    the raw objective value matches too."""
    cfg = PlannerConfig()
    lb = LBFGSParams(max_linesearch=64, delta=1e18, past=past)
    return dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, lbfgs=lb, cost_scale=1.0))


def test_golden_single_segment(tmp_path):
    """S=1, no obstacles (reference: traj_optimizer.cpp:7-202 end to end)."""
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    scen = scenarios.straight_scenario(dims, length=14.0, lateral=2.5,
                                       corridor_half=6.0)
    dev, ddt = _compare(scen, dims, _config(), tmp_path)
    print(f"golden S=1 O=0: max dev {dev:.3e} m, dT dev {ddt:.3e} s")


def test_golden_dynamic_obstacles(tmp_path):
    """S=1 with two moving obstacles: exercises the dual-LSE SDF penalty
    (traj_optimizer.cpp:1311-1684) against the compiled original."""
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    scen = scenarios.straight_scenario(dims, length=14.0, lateral=1.0,
                                       corridor_half=6.0, n_obstacles=2,
                                       rng=np.random.default_rng(7))
    dev, ddt = _compare(scen, dims, _config(), tmp_path)
    print(f"golden S=1 O=2: max dev {dev:.3e} m, dT dev {ddt:.3e} s")


def test_golden_gear_two_segments(tmp_path):
    """S=2 forward/reverse: gear position/angle variables + junction coupling
    (costFunctionCallback:269-319). Fixed-iteration path parity (k=12): with
    free gear junctions in wide corridors the limit point sits in a flat
    valley where each engine's L-BFGS legitimately settles elsewhere, so
    parity is asserted on 12 exact shared iterations instead (machine-level
    agreement requires cost+grad to match along the whole path)."""
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    scen = scenarios.gear_scenario(dims)
    dev, ddt = _compare(scen, dims, _path_parity_config(past=12), tmp_path,
                        tol=1e-9, lbfgs_past=12, require_ok=False)
    print(f"golden S=2 O=0 path-parity k=12: max dev {dev:.3e} m")


def _three_segment_scenario(dims: Dims, n_obstacles=0):
    """Forward / reverse / forward S-maneuver with box corridors."""
    wheel_base = 2.85
    dtype = np.float64
    N = dims.N
    p0, p1, p2, p3 = (np.array([0.0, 0.0]), np.array([7.0, 1.0]),
                      np.array([4.0, -2.0]), np.array([10.0, -3.0]))
    yaws = (0.0, 0.4, 0.2, 0.0)
    sings = (1, -1, 1)
    ini, fin, inner, corr = [], [], [], []
    pts = (p0, p1, p2, p3)
    grid_frac = None
    from dftpav_tpu.basis import sample_grid
    grid = sample_grid(dims.N, dims.K, dims.Kdes)
    s_frac = (grid.frac / N).astype(dtype)
    for s in range(3):
        a, b2 = pts[s], pts[s + 1]
        ini.append(state_to_flat(a, yaws[s], 0.3, 0.0, 0.0, wheel_base,
                                 sings[s], dtype=dtype))
        fin.append(state_to_flat(b2, yaws[s + 1], 0.3, 0.0, 0.0, wheel_base,
                                 sings[s], dtype=dtype))
        frac = np.linspace(0.0, 1.0, N + 1)[1:-1, None]
        inner.append((a + (b2 - a) * frac).astype(dtype))
        centers = a + (b2 - a) * s_frac[..., None]
        corr.append(scenarios._corridor_from_boxes(centers, 10.0, 10.0, dims,
                                                   dtype))
    O, Po = dims.O, dims.Po
    obs_coef = np.zeros((O, Po, 6, 2), dtype)
    obs_dt = np.ones((O,), dtype)
    obs_rel_t0 = np.zeros((O,), dtype)
    obs_mask = np.zeros((O,), bool)
    for o in range(min(n_obstacles, O)):
        dt = 30.0 / Po
        vel = np.array([0.8, 0.4])
        start = np.array([6.0, -4.0])
        for pp in range(Po):
            obs_coef[o, pp, 0] = start + vel * (pp * dt)
            obs_coef[o, pp, 1] = vel * dt
        obs_dt[o] = dt
        obs_mask[o] = True
    from dftpav_tpu.types import Scenario
    return Scenario(
        ini_state=np.stack(ini), fin_state=np.stack(fin),
        init_inner=np.stack(inner),
        init_T=np.array([4.0, 4.0, 4.0], dtype),
        singul=np.array(sings, np.int32),
        seg_mask=np.array([True] * 3),
        corr_n=np.stack([c[0] for c in corr]),
        corr_p=np.stack([c[1] for c in corr]),
        corr_mask=np.stack([c[2] for c in corr]),
        obs_coef=obs_coef, obs_dt=obs_dt, obs_rel_t0=obs_rel_t0,
        obs_mask=obs_mask)


def test_golden_three_segments(tmp_path):
    """S=3, no obstacles: fixed-iteration path parity (see S=2 test)."""
    dims = Dims(S=3, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    scen = _three_segment_scenario(dims)
    dev, ddt = _compare(scen, dims, _path_parity_config(past=12), tmp_path,
                        tol=1e-9, lbfgs_past=12, require_ok=False)
    print(f"golden S=3 O=0 path-parity k=12: max dev {dev:.3e} m")


def test_golden_three_segments_trajtime_quirk(tmp_path):
    """S=3 WITH an obstacle: documents BOTH reference quirks —
    (a) trajtimes = [0, T0, T1] offsets segment 2 by T1 instead of T0+T1
        (traj_optimizer.cpp:230-234), and
    (b) the cross-segment time GRADIENT is misattributed to the current
        segment's gdT (traj_optimizer.cpp:1674-1676), so the reference's
        gradient is not the gradient of its own forward cost.
    With ref_gradient_compat the engine reproduces the compiled C++ iterate
    path to machine precision; with the default (correct) math it must NOT —
    proving the quirks exist and that our compat switch captures them. See
    cost.ref_compat_value_and_grad."""
    dims = Dims(S=3, N=8, K=16, Kdes=32, H=4, O=1, Po=8)
    scen = _three_segment_scenario(dims, n_obstacles=1)
    base = _path_parity_config(past=12)
    cfg = dataclasses.replace(
        base, opt=dataclasses.replace(base.opt, ref_gradient_compat=True))
    dev, ddt = _compare(scen, dims, cfg, tmp_path, tol=1e-9, lbfgs_past=12,
                        require_ok=False)
    print(f"golden S=3 O=1 grad-compat path-parity k=12: max dev {dev:.3e} m")

    # same fixture, correct engine: the paths must diverge
    with pytest.raises(AssertionError):
        _compare(scen, dims, base, tmp_path, tol=1e-9, lbfgs_past=12,
                 require_ok=False)


def test_golden_gear_with_obstacle_grad_compat(tmp_path):
    """S=2 + obstacle: quirk (b) alone (trajtimes is harmless at S=2 since
    [0, T0] equals the cumsum). The gradient-compat engine must match the
    compiled C++ path exactly; the correct engine diverges from the first
    iteration (measured 9e-3 after one step)."""
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=1, Po=8)
    scen = scenarios.gear_scenario(dims)
    obs_coef = np.zeros((1, 8, 6, 2))
    dt = 30.0 / 8
    vel = np.array([0.6, 0.3])
    start = np.array([6.0, 0.0])
    for pp in range(8):
        obs_coef[0, pp, 0] = start + vel * (pp * dt)
        obs_coef[0, pp, 1] = vel * dt
    scen = scen._replace(obs_coef=obs_coef, obs_dt=np.array([dt]),
                         obs_mask=np.array([True]))
    base = _path_parity_config(past=12)
    cfg = dataclasses.replace(
        base, opt=dataclasses.replace(base.opt, ref_gradient_compat=True))
    dev, ddt = _compare(scen, dims, cfg, tmp_path, tol=1e-9, lbfgs_past=12,
                        require_ok=False)
    print(f"golden S=2 O=1 grad-compat path-parity k=12: max dev {dev:.3e} m")


def test_golden_deployed_budget_multigear(tmp_path):
    """Long-budget parity lane: BOTH sides run the reference's DEPLOYED
    L-BFGS envelope (delta=1e-4, past=3, max_iterations=12000 —
    traj_optimizer.cpp:127-134 + minco_config.pb.txt:96-99) on identical
    S=2 gear inputs. At this delta the gear-junction flat valley is METERS
    wide (measured 3.6 m between the two legitimate stops), so the
    equal-budget bar is OUTCOME comparability: both sides succeed and
    reach the same objective level (jerk + time cost, the free-corridor
    objective), anchoring the multi-gear failure-rate comparisons
    (PERF.md) on equal budgets rather than sampled anecdotes."""
    from dftpav_tpu import minco

    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    scen = scenarios.gear_scenario(dims)
    # the FULL deployed envelope including mem_size=256: at the shared
    # relative-improvement threshold the descent RATE decides where the
    # stop fires, and m=256's near-Newton directions keep the improvement
    # above delta much deeper into the valley (measured on this fixture:
    # m=16 stops at objective 3434, m=256 at 1620 vs the C++'s 1807 —
    # identical thresholds, different descent speeds). The shipped m=16
    # default trades this tail descent for 16x iteration latency
    # (LBFGSParams docstring); this lane pins the equal-envelope outcome.
    cfg = dataclasses.replace(
        PlannerConfig(),
        opt=dataclasses.replace(
            PlannerConfig().opt,
            lbfgs=LBFGSParams(mem_size=256, max_linesearch=64)))

    fx = tmp_path / "fixture.txt"
    gf.scenario_to_fixture(
        type(scen)(*(np.asarray(leaf, np.float64) for leaf in scen)),
        dims, fx, lbfgs_delta=cfg.opt.lbfgs.delta)
    ok_cpp, segs = gf.run_oracle(fx)
    assert ok_cpp, "compiled reference failed at its own deployed budget"

    coeffs, dT, ok_mine = _solve_mine(scen, dims, cfg)
    assert ok_mine

    wt = float(cfg.opt.wei_time)
    obj_cpp = sum(s["jerk"] + wt * s["T"] for s in segs)
    obj_mine = sum(
        float(np.sum(np.asarray(minco.jerk_cost(
            jnp.asarray(coeffs[s]), jnp.asarray(dT[s])))))
        + wt * float(dims.N * dT[s])
        for s in range(int(np.sum(scen.seg_mask))))
    rel = (obj_mine - obj_cpp) / max(abs(obj_cpp), 1e-9)
    print(f"golden S=2 deployed-budget objective: cpp {obj_cpp:.4f} "
          f"mine {obj_mine:.4f} rel {rel:+.2e}")
    # comparability bar is one-sided: at the identical envelope our stop
    # must not land at a WORSE objective than the reference's (landing
    # deeper is fine — measured -10%)
    assert rel < 0.05


def test_golden_adaptive_piecing_multigear(tmp_path):
    """Multi-gear failure-rate anchor vs the C++ WITH ITS OWN ADAPTIVE
    PIECING: real front-end reverse-park scenarios of the (8, 2) class are
    fed to the compiled reference with per-segment piece counts exactly as
    traj_manager.cpp:543 would choose them (the fixture writer emits each
    segment at its own N), and to our per-segment engine. The reference
    runs its FULL deployed budget (12000 iterations); ours runs the bench
    budget (150) — a comparison conservative in our disfavor. Bar: we
    succeed on at least as many scenarios (minus 1 sample slack)."""
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8, Ns=(8, 2))
    B = 6
    batch = scenarios.frontend_batch(dims, B, seed=11, dtype=np.float64,
                                     max_search_time=0.2)

    # ours: per-segment rounds engine at the bench budget
    from dftpav_tpu.ops.pallas_solve import solve_batch_rounds
    import jax

    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, jnp.float64)
    res = solve_batch_rounds(jax.tree.map(jnp.asarray, batch), w, dims, cfg,
                             max_iterations=150)
    ours_ok = np.asarray(res.success)

    cpp_ok = []
    for b in range(B):
        scen = type(batch)(*(np.asarray(leaf, np.float64)[b]
                             for leaf in batch))
        fx = tmp_path / f"fx_{b}.txt"
        gf.scenario_to_fixture(scen, dims, fx,
                               lbfgs_delta=cfg.opt.lbfgs.delta)
        ok, _segs = gf.run_oracle(fx, n_samples=8)
        cpp_ok.append(bool(ok))
    cpp_ok = np.asarray(cpp_ok)

    print(f"adaptive-piecing golden: ours {ours_ok.sum()}/{B} "
          f"cpp {cpp_ok.sum()}/{B} (cpp at 12000 iters, ours at 150)")
    assert ours_ok.sum() >= cpp_ok.sum() - 1
