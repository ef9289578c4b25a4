"""Native front-end tests: Reeds-Shepp properties, grid collision semantics,
kino A* reachability, corridor containment, full-pipeline solve."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dftpav_tpu.config import FrontendConfig, PlannerConfig
from dftpav_tpu.frontend import (GridMap2D, KinoAstarPlanner,
                                 reeds_shepp_distance, reeds_shepp_sample)


def make_parking_grid(res=0.1):
    occ = np.zeros((400, 600), np.uint8)
    occ[:3, :] = 1
    occ[-3:, :] = 1
    occ[:, :3] = 1
    occ[:, -3:] = 1
    occ[int(14 / res):int(16.5 / res), int(20 / res):int(25 / res)] = 1
    occ[int(20 / res):int(22.5 / res), int(20 / res):int(25 / res)] = 1
    return GridMap2D(occ, origin=(0.0, 0.0), resolution=res)


# ---------------------------------------------------------------------------
# Reeds-Shepp
# ---------------------------------------------------------------------------

def test_rs_known_values():
    z = np.zeros(3)
    assert reeds_shepp_distance(1.0, z, [5.0, 0, 0]) == pytest.approx(5.0)
    assert reeds_shepp_distance(1.0, z, [-5.0, 0, 0]) == pytest.approx(5.0)
    assert reeds_shepp_distance(1.0, z, [1.0, 1.0, np.pi / 2]) == \
        pytest.approx(np.pi / 2)
    assert reeds_shepp_distance(1.0, z, [0.0, 0.0, np.pi]) == \
        pytest.approx(np.pi, abs=1e-9)


def test_rs_endpoints_and_bounds():
    rng = np.random.default_rng(0)
    for _ in range(300):
        q0 = rng.uniform([-5, -5, -np.pi], [5, 5, np.pi])
        q1 = rng.uniform([-5, -5, -np.pi], [5, 5, np.pi])
        r = rng.uniform(1.0, 5.0)
        d = reeds_shepp_distance(r, q0, q1)
        assert np.isfinite(d)
        assert d >= np.hypot(*(q1[:2] - q0[:2])) - 1e-9
        end = reeds_shepp_sample(r, q0, q1, 16)[-1]
        assert np.hypot(end[0] - q1[0], end[1] - q1[1]) < 1e-9
        dyaw = np.arctan2(np.sin(end[2] - q1[2]), np.cos(end[2] - q1[2]))
        assert abs(dyaw) < 1e-9


def test_rs_symmetry():
    rng = np.random.default_rng(1)
    for _ in range(200):
        q0 = rng.uniform(-5, 5, 3)
        q1 = rng.uniform(-5, 5, 3)
        a = reeds_shepp_distance(2.0, q0, q1)
        b = reeds_shepp_distance(2.0, q1, q0)
        assert a == pytest.approx(b, abs=1e-9)


# ---------------------------------------------------------------------------
# Grid map
# ---------------------------------------------------------------------------

def test_grid_semantics():
    grid = make_parking_grid()
    assert grid.occupied(-1.0, 5.0)          # outside = occupied
    assert grid.occupied(22.0, 15.0)          # inside parked car
    assert not grid.occupied(10.0, 30.0)
    assert grid.obb_collides(22.0, 17.5, 0.5, 4.88, 1.9, 1.015)
    assert not grid.obb_collides(10.0, 30.0, 0.0, 4.88, 1.9, 1.015)
    assert grid.line_collides((18, 15), (27, 15), 0.05)
    assert not grid.line_collides((5, 30), (15, 30), 0.05)


def test_corridor_contains_vehicle_and_is_free():
    grid = make_parking_grid()
    states = np.array([[10.0, 30.0, 0.3], [15.0, 25.0, -0.5]])
    L, W, dcr = 4.88, 1.9, 1.015
    corr = grid.corridors(states, L, W, dcr)  # [n, 4, (nx,ny,px,py)]
    for si, (x, y, yaw) in enumerate(states):
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s], [s, c]])
        center = np.array([x, y]) + dcr * R[:, 0]
        hull = center[None] + (R @ np.array(
            [[L / 2, W / 2], [L / 2, -W / 2],
             [-L / 2, -W / 2], [-L / 2, W / 2]]).T).T
        for n_, p_ in zip(corr[si, :, :2], corr[si, :, 2:]):
            # vehicle hull strictly inside each half-plane
            assert np.max(hull @ n_ - p_ @ n_) <= 1e-9


# ---------------------------------------------------------------------------
# Kino A* + pipeline
# ---------------------------------------------------------------------------

def test_astar_reaches_goal():
    grid = make_parking_grid()
    pl = KinoAstarPlanner(grid, FrontendConfig(max_search_time=2.0))
    segs, samples = pl.plan((8.0, 30.0, 0.0, 0.0), (23.0, 18.2, 0.0, 0.0))
    assert segs is not None
    np.testing.assert_allclose(samples[-1], [23.0, 18.2, 0.0], atol=1e-6)
    # every rough sample collision-free (A*'s own guarantee, checked ex post)
    vp = pl.vehicle
    for x, y, yaw in samples[::5]:
        assert not grid.obb_collides(x, y, yaw, vp.length, vp.width, vp.d_cr)


def test_astar_reverse_goal_has_gear_switch():
    grid = make_parking_grid()
    pl = KinoAstarPlanner(grid, FrontendConfig(max_search_time=2.0))
    # goal facing the wrong way forces at least one reversal
    segs, _ = pl.plan((8.0, 30.0, 0.0, 0.0), (10.0, 28.0, np.pi, 0.0))
    assert segs is not None
    assert any(s.singul < 0 for s in segs) or len(segs) >= 1


def test_full_pipeline_solve():
    import jax
    import jax.numpy as jnp

    from dftpav_tpu import minco, solver
    from dftpav_tpu.pipeline import ParkingPlanner
    from dftpav_tpu.types import Dims, weights_from_config

    grid = make_parking_grid()
    cfg = PlannerConfig()
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    pp = ParkingPlanner(grid, cfg, dims, dtype=np.float64)
    scen, meta = pp.plan_scenario((8.0, 30.0, 0.0, 0.0),
                                  (23.0, 18.2, 0.0, 0.0))
    assert scen is not None
    w = weights_from_config(cfg.opt, dtype=jnp.float64)
    res = solver.solve_one(jax.tree.map(jnp.asarray, scen), w, dims, cfg,
                           max_iterations=300)
    assert bool(res.success), (int(res.status), float(res.cost))
    # optimized trajectory is collision-free on the real map
    vp = cfg.vehicle
    for i in range(meta.n_segments):
        T = float(res.dT[i]) * dims.N
        st = minco.eval_segment_states(
            res.coeffs[i], res.dT[i], int(scen.singul[i]), vp.wheel_base,
            jnp.linspace(0.0, T, 40))
        pos = np.asarray(st["pos"])
        theta = np.asarray(st["theta"])
        for (x, y), th in zip(pos, theta):
            assert not grid.obb_collides(x, y, float(th), vp.length,
                                         vp.width, vp.d_cr)
    # endpoint parity with the requested goal
    pe = np.asarray(minco.eval_derivatives(
        res.coeffs[meta.n_segments - 1][-1], res.dT[meta.n_segments - 1],
        jnp.ones(()), (0,))[0])
    np.testing.assert_allclose(pe, [23.0, 18.2], atol=1e-6)


def test_frontend_batch_distribution():
    """Batched scenarios drawn from the real front end (randomized lots,
    native A* + corridors, movers): static shapes, valid corridor geometry,
    and the batched solver succeeds on the distribution."""
    import jax
    import jax.numpy as jnp

    from dftpav_tpu import scenarios, solver
    from dftpav_tpu.types import Dims, weights_from_config

    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    cfg = PlannerConfig()
    b = scenarios.frontend_batch(dims, 8, seed=5, n_obstacles=2,
                                 dtype=np.float64)
    assert b.ini_state.shape == (8, 1, 2, 3)
    assert b.corr_mask.all() and b.obs_mask.all() and b.seg_mask.all()
    # corridor half-planes contain their own seed states: normals are unit
    nn = np.linalg.norm(b.corr_n, axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-6)

    w = weights_from_config(cfg.opt, dtype=jnp.float64)
    solve = solver.make_solver(cfg, dims, max_iterations=150)
    res = solve(jax.tree.map(jnp.asarray, b), w)
    succ = np.asarray(res.success.astype(jnp.int32))
    assert succ.sum() >= 7, np.asarray(res.cost)


def test_use3d_yaw_key_beats_2d_in_tight_slot():
    """Yaw-keyed node dedup (the reference's use3d first attempt,
    traj_manager.cpp:85-93; yaw-indexed table kino_astar.cpp:71-74): in a
    tight dead-end parking slot, 2D (x, y) hashing collapses states that
    reach a cell at different headings and prunes the direct back-in
    maneuver — it still reaches the goal (via the RS one-shot) but needs
    more gear segments and a longer plan. The 3D key keeps the heading
    multiplicity and finds the short single-reversal plan."""
    res = 0.1
    gap = 2.8
    occ = np.zeros((300, 300), np.uint8)
    occ[:3, :] = 1
    occ[-3:, :] = 1
    occ[:, :3] = 1
    occ[:, -3:] = 1
    x0, x1 = int(14 / res), int((14 + gap) / res)
    occ[int(6 / res):int(11 / res), int(4 / res):x0] = 1
    occ[int(6 / res):int(11 / res), x1:int(26 / res)] = 1
    grid = GridMap2D(occ, origin=(0.0, 0.0), resolution=res)

    start = (6.0, 16.0, 0.0, 0.0)
    goal = (14 + gap / 2, 8.5, -np.pi / 2, 0.0)

    def run(use3d):
        pl = KinoAstarPlanner(grid, FrontendConfig(max_search_time=2.0,
                                                   use3d=use3d))
        segs, samples = pl.plan(start, goal)
        assert segs is not None
        np.testing.assert_allclose(samples[-1][:2], goal[:2], atol=1e-6)
        return len(segs), sum(s.duration for s in segs)

    n2, t2 = run(False)
    n3, t3 = run(True)
    assert n3 < n2
    assert t3 < t2 - 0.5
