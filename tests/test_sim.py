"""Simulation stack tests: plant integration accuracy, obstacle fitting,
trajectory container, closed-loop parking."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.sim.obstacles import CircularMover, fit_surround_traj
from dftpav_tpu.sim.vehicle import BicycleModel
from dftpav_tpu.types import Dims


def test_bicycle_rk4_matches_circle():
    """Constant steer + constant speed must trace the analytic circle."""
    m = BicycleModel(wheel_base=2.85)
    steer = 0.3
    v = 2.0
    R = 2.85 / np.tan(steer)
    s = jnp.asarray([0.0, 0.0, 0.0, steer, v])
    u = jnp.asarray([0.0, 0.0])
    dt = 0.01
    T = 3.0
    for _ in range(int(T / dt)):
        s = m.step(s, u, dt)
    th = v * T / R
    exp = np.array([R * np.sin(th), R * (1 - np.cos(th)), th, steer, v])
    np.testing.assert_allclose(np.asarray(s), exp, atol=1e-6)


def test_bicycle_steer_clamp():
    m = BicycleModel(max_steer=0.7)
    s = jnp.asarray([0.0, 0.0, 0.0, 0.69, 1.0])
    u = jnp.asarray([100.0, 0.0])  # steer-rate clamped to max_steer_rate
    s = m.step(s, u, 0.1)
    assert float(s[3]) <= 0.7 + 1e-9


def test_surround_fit_accuracy():
    """MINCO fit of a circular mover stays close to the true circle inside
    the horizon."""
    mv = CircularMover(center=(0.0, 0.0), radius=12.0, speed=4.5)
    pred = mv.predict(t0=3.0, horizon=8.0, dt=1.0)
    coef, dt, t0 = fit_surround_traj(pred, n_pieces=8)
    assert t0 == 3.0
    for t in np.linspace(0.0, 8.0, 33):
        idx = min(int(t / dt), 7)
        tau = t / dt - idx
        pos = (coef[idx] * (tau ** np.arange(6))[:, None]).sum(0)
        true = mv.state(3.0 + t)[:2]
        assert np.hypot(*(pos - true)) < 0.15, (t, pos, true)


def test_container_world_time():
    from dftpav_tpu.container import TrajContainer

    c = TrajContainer()
    # straight-line constant-velocity coefficients: p(tau) = (tau*dT*v, 0)
    N, dT, v = 4, 0.5, 2.0
    coeffs = np.zeros((N, 6, 2))
    for i in range(N):
        coeffs[i, 0, 0] = i * dT * v
        coeffs[i, 1, 0] = v * dT
    c.add(coeffs, dT, 1, start_time=10.0)
    st = c.state(11.0, wheel_base=2.85)
    np.testing.assert_allclose(st["pos"], [2.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(st["vel"], 2.0, atol=1e-9)
    assert c.locate(9.0) is c.segments[0]
    assert c.locate(99.0) is c.segments[0]


def test_closed_loop_parking():
    """Config[4] smoke: receding-horizon replanning drives the plant into the
    slot."""
    from dftpav_tpu.frontend import GridMap2D
    from dftpav_tpu.pipeline import ParkingPlanner
    from dftpav_tpu.sim import PlannerServer, SimLoop

    res = 0.1
    occ = np.zeros((400, 600), np.uint8)
    occ[:3, :] = 1
    occ[-3:, :] = 1
    occ[:, :3] = 1
    occ[:, -3:] = 1
    occ[int(14 / res):int(16.5 / res), int(20 / res):int(25 / res)] = 1
    occ[int(20 / res):int(22.5 / res), int(20 / res):int(25 / res)] = 1
    grid = GridMap2D(occ, origin=(0.0, 0.0), resolution=res)
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    small = Dims(S=2, N=2, K=16, Kdes=32, H=4, O=0, Po=8)
    pp = ParkingPlanner(grid, PlannerConfig(), dims, dtype=np.float32,
                        small_dims=small)
    srv = PlannerServer(pp, goal=(23.0, 18.2, 0.0, 0.0), budget=0.5)
    loop = SimLoop(srv, ego0=[8.0, 30.0, 0.0, 0.0, 0.0])
    log = loop.run(duration=35.0)
    ego = np.array(log.ego)
    err = np.hypot(ego[-1, 0] - 23.0, ego[-1, 1] - 18.2)
    assert err < 0.2, (ego[-1], srv.n_replans, srv.n_failures)
    assert srv.n_failures <= srv.n_replans // 2
