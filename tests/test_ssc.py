"""SSC planner tests: ADMM QP, corridor interval inflation, Bezier QP e2e."""

import numpy as np
import jax.numpy as jnp
import pytest

from dftpav_tpu import ssc
from dftpav_tpu.ssc import bezier_eval
from dftpav_tpu.ssc.corridor import CorridorConfig, build_corridor
from dftpav_tpu.ssc.qp import admm_qp
from dftpav_tpu.urban import lane as lane_mod


def straight_lane():
    wps = np.stack([np.linspace(0, 300, 21), np.zeros(21)], 1)
    return lane_mod.build_lane(wps, ds=1.0, P=512)


class TestADMMQP:
    def test_equality_constrained_quadratic(self):
        # min 0.5 |x|^2 s.t. x0 + x1 = 2 -> x = (1, 1)
        Q = jnp.eye(2)
        c = jnp.zeros(2)
        G = jnp.array([[1.0, 1.0]])
        b = jnp.array([2.0])
        res = admm_qp(Q, c, G, b, b, n_eq=1, iters=200)
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    def test_box_active(self):
        # min 0.5 (x-3)^2 s.t. x <= 1 -> x = 1
        Q = jnp.eye(1)
        c = jnp.array([-3.0])
        G = jnp.eye(1)
        res = admm_qp(Q, c, G, jnp.array([-10.0]), jnp.array([1.0]),
                      n_eq=0, iters=200)
        assert float(res.x[0]) == pytest.approx(1.0, abs=1e-3)

    def test_batched(self):
        Q = jnp.broadcast_to(jnp.eye(2), (3, 2, 2))
        c = jnp.zeros((3, 2))
        G = jnp.broadcast_to(jnp.array([[1.0, 1.0]]), (3, 1, 2))
        b = jnp.array([[2.0], [4.0], [-2.0]])
        res = admm_qp(Q, c, G, b, b, n_eq=1, iters=200)
        np.testing.assert_allclose(np.asarray(res.x),
                                   [[1, 1], [2, 2], [-1, -1]], atol=1e-3)

    def test_solves_to_tolerance_with_status(self):
        """OOQP-parity semantics: residual-driven exit + SOLVED status
        (common/solver/ooqp_interface.cc solve-to-status)."""
        from dftpav_tpu.ssc.qp import SOLVED
        Q = jnp.eye(2)
        c = jnp.zeros(2)
        G = jnp.array([[1.0, 1.0]])
        b = jnp.array([2.0])
        res = admm_qp(Q, c, G, b, b, n_eq=1, iters=500)
        assert int(res.status) == SOLVED
        assert float(res.primal_res) < 1e-3
        assert float(res.dual_res) < 1e-3
        # exits well before the cap on this trivial problem
        assert int(res.n_iters) < 500

    def test_infeasible_reported(self):
        """Contradictory constraints: x <= -1 and x >= 1 -> INFEASIBLE."""
        from dftpav_tpu.ssc.qp import INFEASIBLE
        Q = jnp.eye(1)
        c = jnp.zeros(1)
        G = jnp.array([[1.0], [1.0]])
        lo = jnp.array([-10.0, 1.0])
        hi = jnp.array([-1.0, 10.0])
        res = admm_qp(Q, c, G, lo, hi, n_eq=0, iters=300)
        assert int(res.status) == INFEASIBLE
        assert float(res.primal_res) > 1e-1


class TestCorridor:
    def _build(self, obs_s0, obs_d0, obs_v=0.0):
        T = 20
        times = jnp.linspace(0.0, 4.0, T + 1)
        seed_s = 8.0 * times
        seed_d = jnp.zeros(T + 1)
        obs_s = obs_s0 + obs_v * times[None]
        obs_d = obs_d0 * jnp.ones((1, T + 1))
        return build_corridor(times, seed_s, seed_d, obs_s, obs_d,
                              jnp.array([2.44]), jnp.array([0.95]),
                              jnp.array([True]), M=5)

    def test_obstacle_ahead_clips_s(self):
        corr = self._build(jnp.array([[50.0]]), 0.0)
        # obstacle rear bumper - margin = 50 - 2.44 - 2.5 = 45.06
        assert float(corr.s_ub.max()) <= 45.1

    def test_obstacle_beside_clips_d(self):
        corr = self._build(jnp.array([[15.0]]), 3.5)
        # obstacle near edge - margin = 3.5 - 0.95 - 1.1 = 1.45
        assert float(corr.d_ub[0]) <= 1.5
        assert float(corr.d_lb[0]) <= -5.0  # free on the right

    def test_no_obstacle_full_width(self):
        T = 20
        times = jnp.linspace(0.0, 4.0, T + 1)
        corr = build_corridor(times, 8.0 * times, jnp.zeros(T + 1),
                              jnp.zeros((1, T + 1)), jnp.zeros((1, T + 1)),
                              jnp.array([2.44]), jnp.array([0.95]),
                              jnp.array([False]), M=5)
        cfg = CorridorConfig()
        assert float(corr.d_ub[0]) == pytest.approx(cfg.d_half_width, abs=0.1)
        assert float(corr.s_ub[-1]) == pytest.approx(
            32.0 + cfg.s_forward, abs=0.2)


class TestVoxelCorridor:
    """ssc/voxel.py vs the interval fast path: the voxel grid reproduces
    ssc_map.cc's cube inflation and handles layouts interval left/right
    classification cannot express."""

    def _layout(self, obs_s0, obs_d0, half_l, half_w):
        T, M = 20, 5
        times = jnp.linspace(0.0, 4.0, T + 1)
        seed_s = 8.0 * times
        seed_d = jnp.zeros(T + 1)
        A = len(obs_s0)
        obs_s = jnp.asarray(obs_s0)[:, None] * jnp.ones((A, T + 1))
        obs_d = jnp.asarray(obs_d0)[:, None] * jnp.ones((A, T + 1))
        args = (times, seed_s, seed_d, obs_s, obs_d, jnp.asarray(half_l),
                jnp.asarray(half_w), jnp.ones(A, bool))
        from dftpav_tpu.ssc.voxel import build_corridor_voxel
        ci = build_corridor(*args, M=5)
        cv = build_corridor_voxel(*args, M=5)
        return ci, cv

    @staticmethod
    def _cube_hits_box(c, m, s_lo, s_hi, d_lo, d_hi):
        return (float(c.s_ub[m]) > s_lo and float(c.s_lb[m]) < s_hi
                and float(c.d_ub[m]) > d_lo and float(c.d_lb[m]) < d_hi)

    def test_free_road_inflates_wide(self):
        from dftpav_tpu.ssc.voxel import build_corridor_voxel, VoxelConfig
        T = 20
        times = jnp.linspace(0.0, 4.0, T + 1)
        corr = build_corridor_voxel(times, 8.0 * times, jnp.zeros(T + 1),
                                    jnp.zeros((1, T + 1)) + 500.0,
                                    jnp.zeros((1, T + 1)),
                                    jnp.array([2.44]), jnp.array([0.95]),
                                    jnp.array([False]), M=5)
        cfg = VoxelConfig()
        assert bool(corr.seed_free)
        # no obstacle: every cube reaches the grid edges
        assert float(corr.d_ub.min()) > 5.0
        assert float(corr.d_lb.max()) < -5.0

    def test_corner_obstacle_interval_collides_voxel_excludes(self):
        """A diagonally-offset obstacle overlapping the seed's s-range but
        only brushing it laterally: interval classification (fully left /
        fully right, ssc/corridor.py:90-93) cannot clip it and emits a
        colliding cube; the voxel grid blocks the inflation exactly."""
        ci, cv = self._layout([12.0], [1.5], [2.0], [1.0])
        # raw obstacle box: s [10, 14], d [0.5, 2.5]
        assert self._cube_hits_box(ci, 1, 10.0, 14.0, 0.5, 2.5)
        assert not self._cube_hits_box(cv, 1, 10.0, 14.0, 0.5, 2.5)

    def test_narrow_slot_interval_infeasible_voxel_passes(self):
        """Two flanking obstacles leave a drivable slot (raw edges at
        d = +-1.0): the interval method's fixed margins classify the seed
        region occupied and reject the corridor, while the voxel grid's
        exact footprint dilation threads the slot."""
        ci, cv = self._layout([12.0, 12.0], [2.9, -2.9], [4.0, 4.0],
                              [1.9, 1.9])
        assert not bool(ci.seed_free)      # interval: rejected
        assert bool(cv.seed_free)          # voxel: drivable
        # the voxel slot stays inside the obstacles' raw edges and is open
        assert 0.1 < float(cv.d_ub[1]) <= 1.0 + 1e-6
        assert -1.0 - 1e-6 <= float(cv.d_lb[1]) < -0.1

    def test_footprint_dilation_is_asymmetric(self):
        """InflateObstacleGrid (ssc_map.cc:347-375) spreads occupied cells
        over s in [-s_n, +s_p): the ego (rear-axle referenced) reaches
        len/2 + d_cr AHEAD of its s, so the corridor must stop that far
        short of an obstacle ahead, and only len/2 - d_cr clear of one
        behind. Catches a swapped front/back dilation (symmetric layouts
        cannot)."""
        from dftpav_tpu.ssc.voxel import build_corridor_voxel
        T, M = 20, 5
        times = jnp.linspace(0.0, 4.0, T + 1)
        seed_s, seed_d = 8.0 * times, jnp.zeros(T + 1)
        # full-width walls: one ahead (raw s [18, 22]), one behind (raw
        # s [-6, -4]); ego defaults len=4.88, d_cr=1.015 ->
        # front extent s_n = 3.455, rear extent s_p = 1.425
        obs_s = jnp.array([20.0, -5.0])[:, None] * jnp.ones((2, T + 1))
        obs_d = jnp.zeros((2, T + 1))
        corr = build_corridor_voxel(
            times, seed_s, seed_d, obs_s, obs_d,
            jnp.array([2.0, 1.0]), jnp.array([50.0, 50.0]),
            jnp.ones(2, bool), M=M)
        # (later seed chunks pierce the wall ahead, so global seed_free is
        # False — cube 0's inflation is what this test pins down)
        # cube 0 (seed s [0, 6.4]) grows forward to 18 - 3.455 = 14.545
        # (a swapped dilation would reach 18 - 1.425 = 16.575)
        assert 14.0 <= float(corr.s_ub[0]) <= 14.8
        # and backward to -4 + 1.425 = -2.575 (swapped: -0.545)
        assert -2.9 <= float(corr.s_lb[0]) <= -2.3

    def test_planner_voxel_backend(self):
        """ssc_plan runs end-to-end with corridor_backend='voxel'."""
        import jax
        from dftpav_tpu.ssc.planner import SSCConfig, ssc_plan
        lane = straight_lane()
        T = 20
        times = np.linspace(0.0, 4.0, T + 1)
        ego = jnp.array([0.0, 0.0, 0.0, 8.0, 0.0, 0.0])
        fwd = jnp.stack([8.0 * jnp.asarray(times), jnp.zeros(T + 1),
                         jnp.zeros(T + 1), 8.0 * jnp.ones(T + 1),
                         jnp.zeros(T + 1), jnp.zeros(T + 1)], axis=1)
        obs = jnp.zeros((1, T + 1, 6)).at[:, :, 0].set(500.0)
        cfg = SSCConfig(corridor_backend="voxel")
        res = jax.jit(lambda e, f, o: ssc_plan(
            lane, e, f, times, o, jnp.array([False]), jnp.array([2.44]),
            jnp.array([0.95]), cfg))(ego, fwd, obs)
        assert bool(res.feasible)
        # spline tracks the seed closely on a free road
        s_mid = float(res.spline.ctrl[0, 2].mean())
        assert abs(s_mid - 20.0) < 4.0


class TestSSCPlan:
    def _plan(self, obs, mask):
        lane = straight_lane()
        T = 20
        times = np.linspace(0, 4.0, T + 1)
        ego = jnp.array([0.0, 0.0, 0.0, 8.0, 0.0, 0.0])
        ft = jnp.stack([jnp.array([8.0 * t, 0.0, 0.0, 8.0, 0.0, 0.0])
                        for t in times])
        return ssc.ssc_plan(lane, ego, ft, times, obs, mask,
                            jnp.array([2.44] * obs.shape[0]),
                            jnp.array([0.95] * obs.shape[0])), times

    def test_free_road_tracks_reference(self):
        T = 20
        times = np.linspace(0, 4.0, T + 1)
        obs = jnp.zeros((1, T + 1, 6))
        res, _ = self._plan(obs, jnp.array([False]))
        assert bool(res.feasible)
        pos, vel, _ = bezier_eval(res.spline, jnp.asarray(times))
        np.testing.assert_allclose(np.asarray(pos[:, 0]), 8.0 * times,
                                   atol=0.6)
        assert float(vel[0, 0]) == pytest.approx(8.0, abs=0.05)
        assert abs(float(pos[0, 0])) < 0.05

    def test_colliding_seed_marks_infeasible(self):
        # the forward trajectory drives straight through a parked car ->
        # corridor invalid, as the reference's voxel inflation reports
        T = 20
        times = np.linspace(0, 4.0, T + 1)
        obs = jnp.stack([jnp.stack([jnp.array(
            [25.0, 0.0, 0.0, 0.0, 0.0, 0.0]) for _ in times])])
        res, _ = self._plan(obs, jnp.array([True]))
        assert not bool(res.feasible)

    def test_braking_seed_stays_behind_obstacle(self):
        # a realistic (IDM-braking) seed that stops short of a parked car:
        # the corridor clips s at the obstacle's rear bumper minus margins
        T = 20
        times = np.linspace(0, 4.0, T + 1)
        lane = straight_lane()
        ego = jnp.array([0.0, 0.0, 0.0, 6.0, 0.0, 0.0])
        # decelerating seed: stops at s = 12 by t ~ 4
        s_seed = 12.0 * (1.0 - np.exp(-times / 1.5))
        v_seed = 8.0 * np.exp(-times / 1.5)
        ft = jnp.stack([jnp.array([s, 0.0, 0.0, v, 0.0, 0.0])
                        for s, v in zip(s_seed, v_seed)])
        obs = jnp.stack([jnp.stack([jnp.array(
            [25.0, 0.0, 0.0, 0.0, 0.0, 0.0]) for _ in times])])
        res = ssc.ssc_plan(lane, ego, ft, times, obs, jnp.array([True]),
                           jnp.array([2.44]), jnp.array([0.95]))
        assert bool(res.feasible)
        pos, _, _ = bezier_eval(res.spline, jnp.asarray(times))
        # rear bumper - margins: 25 - 2.44 - 2.5 = 20.06
        assert float(pos[:, 0].max()) <= 20.3
        assert float(res.qp.eq_res.max()) < 5e-3

    def test_spline_continuity(self):
        T = 20
        times = np.linspace(0, 4.0, T + 1)
        obs = jnp.zeros((1, T + 1, 6))
        res, _ = self._plan(obs, jnp.array([False]))
        # evaluate just before/after each cube junction
        tj = np.asarray(res.corridor.t_ub)[:-1]
        pa, va, _ = bezier_eval(res.spline, jnp.asarray(tj - 1e-4))
        pb, vb, _ = bezier_eval(res.spline, jnp.asarray(tj + 1e-4))
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-2)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=5e-2)
