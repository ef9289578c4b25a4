"""Urban stack tests: lanes/Frenet, IDM family, steer plant, forward sim, MPDM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import geometry, idm, lane as lane_mod, mpdm, steer


def straight_lane(y=0.0, length=200.0, ds=1.0, P=256):
    wps = np.stack([np.linspace(0, length, 21), y * np.ones(21)], 1)
    return lane_mod.build_lane(wps, ds=ds, P=P)


def two_lane_set():
    l0 = straight_lane(0.0)
    l1 = straight_lane(3.5)
    return lane_mod.build_lane_set([l0, l1], left_ids=[1, -1],
                                   right_ids=[-1, 0])


def default_geom(A):
    ones = jnp.ones(A)
    return fsim.AgentGeom(length=4.88 * ones, width=1.9 * ones,
                          d_cr=1.015 * ones, wheel_base=2.85 * ones)


# ---------------------------------------------------------------------------
# lanes / Frenet
# ---------------------------------------------------------------------------

class TestLane:
    def test_frenet_roundtrip_straight(self):
        lane = straight_lane()
        s, d = lane_mod.frenet_of_point(lane, jnp.array([10.0, 2.0]))
        assert float(s) == pytest.approx(10.0, abs=1e-3)
        assert float(d) == pytest.approx(2.0, abs=1e-3)
        pos, heading = lane_mod.state_of_frenet(lane, s, d)
        np.testing.assert_allclose(np.asarray(pos), [10.0, 2.0], atol=1e-3)
        assert float(heading) == pytest.approx(0.0, abs=1e-6)

    def test_arc_lane_curvature(self):
        R = 30.0
        t = np.linspace(0, np.pi / 2, 40)
        wps = np.stack([R * np.sin(t), R * (1 - np.cos(t))], 1)
        lane = lane_mod.build_lane(wps, ds=0.5, P=256)
        _, _, kappa = lane_mod.lane_point(lane, jnp.asarray(15.0))
        assert float(kappa) == pytest.approx(1.0 / R, rel=0.1)
        # arc length of the projection of a point at angle 0.5 rad
        p = jnp.array([R * np.sin(0.5), R * (1 - np.cos(0.5))])
        s, d = lane_mod.frenet_of_point(lane, p)
        assert float(s) == pytest.approx(R * 0.5, abs=0.1)
        assert float(d) == pytest.approx(0.0, abs=0.05)

    def test_frenet_state_velocity_split(self):
        lane = straight_lane()
        fs = lane_mod.frenet_of_state(
            lane, jnp.array([5.0, 0.5]), jnp.asarray(np.pi / 6),
            jnp.asarray(2.0))
        assert float(fs.s_dot) == pytest.approx(2.0 * np.cos(np.pi / 6), abs=1e-4)
        assert float(fs.d_prime) == pytest.approx(np.tan(np.pi / 6), abs=1e-4)


# ---------------------------------------------------------------------------
# IDM family (golden values from the reference formulas,
# intelligent_driver_model.cc:5-93)
# ---------------------------------------------------------------------------

class TestIDM:
    def p(self, v0=5.0):
        return idm.IDMParam(desired_velocity=v0)

    def test_idm_free_flow_at_v0_is_zero(self):
        a = idm.idm_acc(self.p(), 0.0, 5.0, 1e9, 5.0)
        assert float(a) == pytest.approx(0.0, abs=1e-6)

    def test_idm_matches_closed_form(self):
        p = self.p()
        s, v, sf, vf = 0.0, 3.0, 30.0, 2.0
        s_star = 2.0 + max(0.0, v * 1.0 + v * (v - vf)
                           / (2 * np.sqrt(2.0 * 3.0)))
        s_alpha = sf - s - 5.0
        want = 2.0 * (1 - (v / 5.0) ** 4 - (s_star / s_alpha) ** 2)
        got = float(idm.idm_acc(p, s, v, sf, vf))
        assert got == pytest.approx(want, rel=1e-6)

    def test_iidm_clamped(self):
        p = self.p()
        a = idm.iidm_acc(p, 0.0, 4.0, 5.5, 0.0)  # nearly touching leader
        assert float(a) == pytest.approx(-5.0, abs=1e-6)  # hard braking clamp
        a2 = idm.iidm_acc(p, 0.0, 0.0, 1e9, 0.0)
        assert float(a2) == pytest.approx(2.0, rel=1e-6)  # full free acc

    def test_acc_blends_toward_iidm_when_safe(self):
        p = self.p()
        a_acc = idm.acc_acc(p, 0.0, 3.0, 1e6, 3.0)
        a_iidm = idm.iidm_acc(p, 0.0, 3.0, 1e6, 3.0)
        assert float(a_acc) == pytest.approx(float(a_iidm), abs=1e-5)

    def test_idm_velocity_decelerates_behind_slow_leader(self):
        p = self.p()
        v1 = idm.idm_velocity(p, 0.0, 12.0, 4.0, 1.0, 0.4)
        assert 0.0 <= float(v1) < 4.0

    def test_idm_velocity_accelerates_free_road(self):
        p = self.p()
        v1 = idm.idm_velocity(p, 0.0, 1e6, 2.0, 2.0, 0.4)
        assert float(v1) > 2.0

    def test_ctx_idm_tracks_target(self):
        p = self.p()
        # target 10 m ahead moving at 4: accelerate (clipped at +1 m/s^2)
        v1 = idm.ctx_idm_velocity(p, 0.0, 2.0, 1e6, 0.0, 10.0, 4.0, 0.4)
        assert float(v1) == pytest.approx(2.4, abs=0.05)


# ---------------------------------------------------------------------------
# steer plant
# ---------------------------------------------------------------------------

class TestSteerPlant:
    def test_straight_constant_velocity(self):
        s0 = jnp.array([0.0, 0.0, 0.0, 3.0, 0.0, 0.0])
        s1 = steer.ideal_steer_step(s0, 0.0, 3.0, 2.85, steer.SteerLimits(),
                                    0.4)
        np.testing.assert_allclose(np.asarray(s1)[:4], [1.2, 0, 0, 3.0],
                                   atol=1e-5)

    def test_lon_jerk_and_acc_limits(self):
        lim = steer.SteerLimits()
        s0 = jnp.array([0.0, 0.0, 0.0, 3.0, 0.0, 0.0])
        s1 = steer.ideal_steer_step(s0, 0.0, 100.0, 2.85, lim, 0.4)
        # jerk limit 5 -> acc after dt <= 0 + 5*0.4 = 2.0 (also the acc cap)
        assert float(s1[steer.V]) <= 3.0 + 2.0 * 0.4 + 1e-5

    def test_steer_rate_limit(self):
        lim = steer.SteerLimits()
        s0 = jnp.array([0.0, 0.0, 0.0, 3.0, 0.0, 0.0])
        s1 = steer.ideal_steer_step(s0, 0.6, 3.0, 2.85, lim, 0.4)
        assert abs(float(s1[steer.ST])) <= float(lim.max_steer_rate) * 0.4 + 1e-5

    def test_velocity_never_negative(self):
        s0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
        s1 = steer.ideal_steer_step(s0, 0.0, 0.0, 2.85, steer.SteerLimits(),
                                    0.4)
        assert float(s1[steer.V]) >= 0.0


# ---------------------------------------------------------------------------
# OBB geometry
# ---------------------------------------------------------------------------

class TestOBB:
    def test_overlap_and_separation(self):
        va = geometry.obb_vertices(jnp.asarray(0.0), jnp.asarray(0.0),
                                   jnp.asarray(0.0), 4.88, 1.9, 1.015)
        vb = geometry.obb_vertices(jnp.asarray(3.0), jnp.asarray(0.0),
                                   jnp.asarray(0.0), 4.88, 1.9, 1.015)
        vc = geometry.obb_vertices(jnp.asarray(10.0), jnp.asarray(0.0),
                                   jnp.asarray(0.0), 4.88, 1.9, 1.015)
        assert bool(geometry.obb_overlap(va, vb))
        assert not bool(geometry.obb_overlap(va, vc))

    def test_rotated_narrow_miss(self):
        va = geometry.obb_vertices(jnp.asarray(0.0), jnp.asarray(0.0),
                                   jnp.asarray(0.0), 4.0, 2.0, 0.0)
        vb = geometry.obb_vertices(jnp.asarray(0.0), jnp.asarray(2.9),
                                   jnp.asarray(np.pi / 2), 4.0, 2.0, 0.0)
        # vertical car at y=2.9: half-length 2.0 + half-width 1.0 = 3.0 > 2.9
        assert bool(geometry.obb_overlap(va, vb))
        vb2 = geometry.obb_vertices(jnp.asarray(0.0), jnp.asarray(3.1),
                                    jnp.asarray(np.pi / 2), 4.0, 2.0, 0.0)
        assert not bool(geometry.obb_overlap(va, vb2))


# ---------------------------------------------------------------------------
# forward simulation
# ---------------------------------------------------------------------------

class TestForwardSim:
    def test_follower_never_hits_leader(self):
        lane = straight_lane()
        lanes = jax.tree.map(lambda f: jnp.stack([f, f]), lane)
        states = jnp.array([[0.0, 0.0, 0.0, 8.0, 0.0, 0.0],
                            [20.0, 0.0, 0.0, 0.5, 0.0, 0.0]])
        geom_ = default_geom(2)
        traj = fsim.rollout(lanes, states, geom_, jnp.array([8.0, 0.5]),
                            fsim.SimParam(), 0.4, 25)
        gaps = traj[:, 1, 0] - traj[:, 0, 0]
        assert float(gaps.min()) > 4.0  # bumper-to-bumper stays positive

    def test_converges_to_lane_center(self):
        lane = straight_lane()
        lanes = jax.tree.map(lambda f: f[None], lane)
        states = jnp.array([[0.0, 1.5, 0.3, 5.0, 0.0, 0.0]])
        traj = fsim.rollout(lanes, states, default_geom(1), jnp.array([5.0]),
                            fsim.SimParam(), 0.4, 40)
        assert abs(float(traj[-1, 0, 1])) < 0.3

    def test_free_agent_reaches_desired_velocity(self):
        lane = straight_lane(length=400.0)
        lanes = jax.tree.map(lambda f: f[None], lane)
        states = jnp.array([[0.0, 0.0, 0.0, 2.0, 0.0, 0.0]])
        traj = fsim.rollout(lanes, states, default_geom(1), jnp.array([6.0]),
                            fsim.SimParam(), 0.4, 50)
        assert float(traj[-1, 0, fsim.V]) == pytest.approx(6.0, abs=0.2)


# ---------------------------------------------------------------------------
# MPDM
# ---------------------------------------------------------------------------

class TestMPDM:
    def setup_method(self, _):
        self.ls = two_lane_set()
        self.geom = default_geom(2)
        self.lane_ids = jnp.array([0, 0], dtype=jnp.int32)
        self.p = fsim.SimParam()
        self.cfg = mpdm.MPDMConfig(desired_velocity=8.0)

    def test_changes_lane_past_slow_leader(self):
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [25.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        res = mpdm.mpdm_plan(self.ls, states, self.lane_ids, self.geom, 0,
                             self.p, self.cfg)
        assert int(res.behavior) == mpdm.LCL
        assert bool(res.valid[mpdm.LCL])
        assert not bool(res.valid[mpdm.LCR])  # no right neighbor lane

    def test_keeps_lane_on_free_road(self):
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [150.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        res = mpdm.mpdm_plan(self.ls, states, self.lane_ids, self.geom, 0,
                             self.p, self.cfg)
        assert int(res.behavior) == mpdm.LK

    def test_desired_vel_clamped_to_gap(self):
        states = jnp.array([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0],
                            [150.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        res = mpdm.mpdm_plan(self.ls, states, self.lane_ids, self.geom, 0,
                             self.p, self.cfg)
        assert float(res.desired_vel) <= 1.0 + self.cfg.max_vel_cmd_gap + 1e-5

    def test_jit_and_batchable(self):
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [25.0, 0.0, 0.0, 1.0, 0.0, 0.0]])

        fn = jax.jit(lambda st: mpdm.mpdm_plan(
            self.ls, st, self.lane_ids, self.geom, 0, self.p, self.cfg))
        res = fn(states)
        batch = jax.vmap(lambda st: mpdm.mpdm_plan(
            self.ls, st, self.lane_ids, self.geom, 0, self.p,
            self.cfg).behavior)(jnp.stack([states, states]))
        assert batch.shape == (2,)
        assert int(batch[0]) == int(res.behavior)


# ---------------------------------------------------------------------------
# EUDM (DCP-tree)
# ---------------------------------------------------------------------------

class TestEUDM:
    def test_dcp_tree_leaf_count_and_structure(self):
        from dftpav_tpu.urban import eudm
        script = eudm.dcp_action_script(5)
        assert script.shape == (3 * (2 * 4 + 1), 5, 2)
        # each leaf has at most one lateral switch point
        lat = script[:, :, 1]
        switches = (lat[:, 1:] != lat[:, :-1]).sum(axis=1)
        assert switches.max() <= 1

    def test_changes_lane_past_slow_leader(self):
        from dftpav_tpu.urban import eudm
        ls = two_lane_set()
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [25.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        res = eudm.eudm_plan(ls, states, jnp.array([0, 0], jnp.int32),
                             default_geom(2), 0, fsim.SimParam(),
                             eudm.EUDMConfig(desired_velocity=8.0))
        assert int(res.behavior) == 1  # LCL
        assert bool(res.valid[int(res.best_policy)])

    def test_keeps_lane_free_road(self):
        from dftpav_tpu.urban import eudm
        ls = two_lane_set()
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [180.0, 0.0, 0.0, 5.0, 0.0, 0.0]])
        res = eudm.eudm_plan(ls, states, jnp.array([0, 0], jnp.int32),
                             default_geom(2), 0, fsim.SimParam(),
                             eudm.EUDMConfig(desired_velocity=8.0))
        assert int(res.behavior) == 0


# ---------------------------------------------------------------------------
# EUDM typed-RSS safety ladder + CFB belief branching
# ---------------------------------------------------------------------------

class TestTypedRSS:
    """rss_check_typed vs the reference RssCheck semantics
    (rss_checker.cc:291-394)."""

    GEOM = (4.88, 1.9, 1.015)

    def test_tailgate_is_too_fast(self):
        from dftpav_tpu.urban import rss
        safe, typ, lo, up = rss.rss_check_typed(
            0., 0., 10., 0., 12., 0., 1., 0., *self.GEOM, *self.GEOM)
        assert not bool(safe)
        assert int(typ) == rss.TOO_FAST
        assert float(up) < 10.0  # ego exceeds the legal upper bound

    def test_fast_rear_car_makes_slow_ego_too_slow(self):
        from dftpav_tpu.urban import rss
        safe, typ, lo, up = rss.rss_check_typed(
            0., 0., 2., 0., -8., 0., 12., 0., *self.GEOM, *self.GEOM)
        assert not bool(safe)
        assert int(typ) == rss.TOO_SLOW
        assert float(lo) > 2.0  # ego is below the legal lower bound

    def test_lateral_clearance_is_legal(self):
        from dftpav_tpu.urban import rss
        safe, typ, lo, up = rss.rss_check_typed(
            0., 0., 10., 0., 12., 5.5, 1., 0., *self.GEOM, *self.GEOM)
        assert bool(safe)
        assert int(typ) == rss.LEGAL
        assert float(lo) == 0.0 and float(up) == 0.0

    def test_reverse_ego_is_legal(self):
        from dftpav_tpu.urban import rss
        safe, typ, _, _ = rss.rss_check_typed(
            0., 0., -1., 0., 6., 0., 1., 0., *self.GEOM, *self.GEOM)
        assert bool(safe) and int(typ) == rss.LEGAL

    def test_bumper_overlap_front_is_too_fast(self):
        from dftpav_tpu.urban import rss
        safe, typ, lo, up = rss.rss_check_typed(
            0., 0., 1., 0., 4.0, 0., 1., 0., *self.GEOM, *self.GEOM)
        assert not bool(safe)
        assert int(typ) == rss.TOO_FAST
        assert float(lo) == 0.0 and float(up) == 0.0

    def test_ladder_cost_monotone_in_overspeed(self):
        """eudm_planner.cc:1012-1018: TooFast cost grows exponentially with
        the overshoot above rss_vel_up."""
        from dftpav_tpu.urban import eudm
        cfg = eudm.EUDMConfig()
        c = lambda v, up: (cfg.rss_over_speed_linear_coeff * v
                           * 10.0 ** (cfg.rss_over_speed_power_coeff
                                      * abs(v - up)))
        assert c(12.0, 7.0) > c(10.0, 7.0) > c(8.0, 7.0) > 0.0


class TestEUDMSafetyLadder:
    def _near_miss(self):
        """Ego fast behind a slow leader, 18 m gap, same lane: overtaking
        policies pass RSS-close; the ladder must price them."""
        ls = two_lane_set()
        states = jnp.array([[0.0, 0.0, 0.0, 8.0, 0.0, 0.0],
                            [18.0, 0.0, 0.0, 2.0, 0.0, 0.0]])
        return ls, states, jnp.array([0, 0], jnp.int32), default_geom(2)

    def test_ladder_prices_risky_policies_and_reorders(self):
        from dftpav_tpu.urban import eudm
        ls, states, ids, geom_ = self._near_miss()
        cfg_on = eudm.EUDMConfig(desired_velocity=8.0)
        cfg_off = cfg_on._replace(rss_cost_enable=False)
        r_on = eudm.eudm_plan(ls, states, ids, geom_, 0, fsim.SimParam(),
                              cfg_on)
        r_off = eudm.eudm_plan(ls, states, ids, geom_, 0, fsim.SimParam(),
                               cfg_off)
        s_on = np.asarray(r_on.scores)
        s_off = np.asarray(r_off.scores)
        fin = np.isfinite(s_on) & np.isfinite(s_off)
        # ladder only adds cost, and strictly prices some near-miss policy
        assert (s_on[fin] >= s_off[fin] - 1e-5).all()
        assert (s_on[fin] > s_off[fin] + 1.0).any()
        assert bool(np.asarray(r_on.risky).any())
        # pricing the close-pass flips the decision vs the ladder-free run
        assert int(r_on.best_policy) != int(r_off.best_policy)

    def test_free_road_has_zero_ladder_cost(self):
        from dftpav_tpu.urban import eudm
        ls = two_lane_set()
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [180.0, 0.0, 0.0, 5.0, 0.0, 0.0]])
        ids = jnp.array([0, 0], jnp.int32)
        cfg = eudm.EUDMConfig(desired_velocity=8.0)
        r_on = eudm.eudm_plan(ls, states, ids, default_geom(2), 0,
                              fsim.SimParam(), cfg)
        r_off = eudm.eudm_plan(ls, states, ids, default_geom(2), 0,
                               fsim.SimParam(),
                               cfg._replace(rss_cost_enable=False))
        np.testing.assert_allclose(np.asarray(r_on.scores),
                                   np.asarray(r_off.scores), rtol=1e-6)


class TestEUDMCFB:
    def test_belief_combo_table(self):
        from dftpav_tpu.urban import eudm
        probs = np.array([[1.0, 0.0, 0.0], [0.3, 0.0, 0.7]])
        combos, p = eudm.cfb_belief_combos(probs, (1,))
        assert combos.shape == (3, 1)
        np.testing.assert_allclose(p, [0.3, 0.0, 0.7])
        combos2, p2 = eudm.cfb_belief_combos(probs, (0, 1))
        assert combos2.shape == (9, 2)
        assert p2.sum() == pytest.approx(1.0)

    def test_cut_in_belief_flips_decision(self):
        """The CFB done-criterion: an uncertain neighbor believed to cut in
        changes the chosen behavior vs observed-only prediction."""
        from dftpav_tpu.urban import eudm
        ls = two_lane_set()
        # ego lane 0 at speed, free ahead; slow car on lane 1, 14 m ahead,
        # believed 70% to merge right into ego's lane
        states = jnp.array([[0.0, 0.0, 0.0, 8.0, 0.0, 0.0],
                            [14.0, 3.5, 0.0, 2.0, 0.0, 0.0]])
        ids = jnp.array([0, 1], jnp.int32)
        geom_ = default_geom(2)
        cfg = eudm.EUDMConfig(desired_velocity=8.0)
        obs = eudm.eudm_plan(ls, states, ids, geom_, 0, fsim.SimParam(), cfg)
        probs = np.array([[1.0, 0.0, 0.0], [0.3, 0.0, 0.7]])
        cfb = eudm.eudm_plan_cfb(ls, states, ids, geom_, 0, fsim.SimParam(),
                                 cfg, probs, (1,))
        po, pc = int(obs.best_policy), int(cfb.best_policy)
        assert po != pc
        # the observed-only winner (maintain, lane-keep) is invalid under
        # the focused cut-in belief
        assert not bool(np.asarray(cfb.valid)[po])
        assert not np.isfinite(float(np.asarray(cfb.scores)[po]))
        # the CFB winner decelerates and/or vacates the lane
        sc = np.asarray(obs.action_script)
        assert (sc[pc][:, 0] == eudm.DECEL).any() or (sc[pc][:, 1] != 0).any()

    def test_certain_belief_matches_observed(self):
        """A one-hot lane-keep belief must reproduce eudm_plan exactly."""
        from dftpav_tpu.urban import eudm
        ls = two_lane_set()
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [25.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        ids = jnp.array([0, 0], jnp.int32)
        geom_ = default_geom(2)
        cfg = eudm.EUDMConfig(desired_velocity=8.0)
        obs = eudm.eudm_plan(ls, states, ids, geom_, 0, fsim.SimParam(), cfg)
        probs = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        cfb = eudm.eudm_plan_cfb(ls, states, ids, geom_, 0, fsim.SimParam(),
                                 cfg, probs, (1,))
        assert int(cfb.best_policy) == int(obs.best_policy)
        so, sc = np.asarray(obs.scores), np.asarray(cfb.scores)
        fin = np.isfinite(so)
        np.testing.assert_allclose(sc[fin], so[fin], rtol=1e-5)


# ---------------------------------------------------------------------------
# RSS + MOBIL
# ---------------------------------------------------------------------------

class TestRSS:
    def test_far_ahead_is_safe(self):
        from dftpav_tpu.urban import rss
        assert bool(rss.rss_safe(0., 0., 8., 0., 80., 0., 8., 0.))

    def test_tailgating_fast_is_unsafe(self):
        from dftpav_tpu.urban import rss
        assert not bool(rss.rss_safe(0., 0., 10., 0., 4., 0., 0., 0.))

    def test_lateral_separation_is_safe(self):
        from dftpav_tpu.urban import rss
        assert bool(rss.rss_safe(0., 0., 10., 0., 4., 5., 0., 0.))

    def test_safe_lon_distance_grows_with_speed(self):
        from dftpav_tpu.urban import rss
        d1 = float(rss.safe_longitudinal_distance(5.0, 5.0, True))
        d2 = float(rss.safe_longitudinal_distance(10.0, 5.0, True))
        assert d2 > d1 >= 0.0

    def test_batched(self):
        from dftpav_tpu.urban import rss
        ego_v = jnp.array([10.0, 10.0])
        other_s = jnp.array([4.0, 80.0])
        out = rss.rss_safe(jnp.zeros(2), jnp.zeros(2), ego_v, jnp.zeros(2),
                           other_s, jnp.zeros(2), jnp.zeros(2), jnp.zeros(2))
        assert out.tolist() == [False, True]


class TestMOBIL:
    def setup_method(self, _):
        from dftpav_tpu.urban import mobil
        self.mobil = mobil
        self.ls = two_lane_set()
        self.geom = default_geom(3)
        self.lane_ids = jnp.array([0, 0, 1], jnp.int32)

    def test_stuck_agent_prefers_left_change(self):
        states = jnp.array([[0.0, 0.0, 0.0, 6.0, 0.0, 0.0],
                            [12.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                            [150.0, 3.5, 0.0, 5.0, 0.0, 0.0]])
        res = self.mobil.mobil_predict(self.ls, states, self.lane_ids,
                                       self.geom, 0)
        assert float(res.gain_left) > 1.0
        assert float(res.prob[1]) > float(res.prob[0])  # LCL beats LK
        assert float(res.prob[2]) == 0.0  # no right lane

    def test_probabilities_sum_to_one(self):
        states = jnp.array([[0.0, 0.0, 0.0, 6.0, 0.0, 0.0],
                            [30.0, 0.0, 0.0, 4.0, 0.0, 0.0],
                            [150.0, 3.5, 0.0, 5.0, 0.0, 0.0]])
        probs = self.mobil.predict_all(self.ls, states, self.lane_ids,
                                       self.geom)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-6)

    def test_stopped_agent_keeps_lane(self):
        states = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                            [30.0, 0.0, 0.0, 4.0, 0.0, 0.0],
                            [150.0, 3.5, 0.0, 5.0, 0.0, 0.0]])
        res = self.mobil.mobil_predict(self.ls, states, self.lane_ids,
                                       self.geom, 0)
        np.testing.assert_allclose(np.asarray(res.prob), [1.0, 0.0, 0.0])

    def test_unsafe_target_lane_blocks_change(self):
        # a car right beside ego on the left lane: LCL must be unsafe
        states = jnp.array([[0.0, 0.0, 0.0, 6.0, 0.0, 0.0],
                            [12.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                            [1.0, 3.5, 0.0, 6.0, 0.0, 0.0]])
        res = self.mobil.mobil_predict(self.ls, states, self.lane_ids,
                                       self.geom, 0)
        assert not bool(res.lcl_safe)
        np.testing.assert_allclose(np.asarray(res.prob), [1.0, 0.0, 0.0])


# ---------------------------------------------------------------------------
# BehaviorServer
# ---------------------------------------------------------------------------

class TestBehaviorServer:
    def scene(self):
        ls = two_lane_set()
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [25.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        return ls, states, default_geom(2)

    def test_mpdm_tick_changes_lane(self):
        from dftpav_tpu.urban.behavior_server import BehaviorServer
        ls, states, geom = self.scene()
        srv = BehaviorServer(ls, geom, ego_idx=0, planner="mpdm",
                             cfg=mpdm.MPDMConfig(desired_velocity=8.0))
        dec = srv.tick(states)
        assert dec.behavior == mpdm.LCL
        assert dec.ref_lane_id == 1
        assert dec.valid

    def test_level_gate_forces_lane_keep(self):
        from dftpav_tpu.urban.behavior_server import BehaviorServer
        ls, states, geom = self.scene()
        srv = BehaviorServer(ls, geom, ego_idx=0, autonomous_level=2)
        dec = srv.tick(states)
        assert dec.behavior == mpdm.LK

    def test_hmi_lock_overrides_when_valid(self):
        from dftpav_tpu.urban.behavior_server import BehaviorServer
        ls, states, geom = self.scene()
        srv = BehaviorServer(ls, geom, ego_idx=0,
                             cfg=mpdm.MPDMConfig(desired_velocity=8.0))
        srv.lock_to_hmi(mpdm.LK)
        dec = srv.tick(states)
        assert dec.behavior == mpdm.LK
        srv.lock_to_hmi(mpdm.LCR)  # invalid (no right lane) -> planner wins
        dec = srv.tick(states)
        assert dec.behavior == mpdm.LCL

    def test_eudm_tick(self):
        from dftpav_tpu.urban import eudm
        from dftpav_tpu.urban.behavior_server import BehaviorServer
        ls, states, geom = self.scene()
        srv = BehaviorServer(ls, geom, ego_idx=0, planner="eudm",
                             cfg=eudm.EUDMConfig(desired_velocity=8.0))
        dec = srv.tick(states)
        assert dec.behavior == mpdm.LCL
        assert dec.valid


class TestEudmManager:
    """EudmManager context threading (eudm_manager.cc:41-93, 881-905):
    the committed action of tick N — located by elapsed wall time in the
    winning action sequence — roots tick N+1's DCP tree; a completed lane
    change (ego reached the target lane) collapses the root back to LK."""

    def _server(self):
        from dftpav_tpu.urban import eudm
        from dftpav_tpu.urban.behavior_server import BehaviorServer
        ls = two_lane_set()
        return BehaviorServer(ls, default_geom(2), 0, planner="eudm",
                              cfg=eudm.EUDMConfig(desired_velocity=8.0))

    SLOW_LEADER = [[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                   [25.0, 0.0, 0.0, 1.0, 0.0, 0.0]]

    def test_committed_change_roots_next_tree(self):
        srv = self._server()
        states = jnp.array(self.SLOW_LEADER)
        d0 = srv.tick(states, stamp=0.0)
        assert d0.ongoing_lat == mpdm.LK
        assert d0.behavior == mpdm.LCL                  # commits LCL
        seq0 = np.asarray(srv._snapshot.action_seq)
        assert (seq0[:, 1] == mpdm.LCL).any()

        # later, mid-change (ego between lanes), leader still slow: the
        # ongoing action indexed by elapsed time is LCL and the next tree
        # must branch FROM LCL, not restart at LK
        states1 = jnp.array([[6.0, 1.4, 0.25, 5.0, 0.0, 0.0],
                             [26.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        h_first = int(np.argmax(seq0[:, 1] == mpdm.LCL))
        stamp1 = (h_first + 0.3) * srv.cfg.layer_time
        d1 = srv.tick(states1, stamp=stamp1)
        assert d1.ongoing_lat == mpdm.LCL
        assert int(srv._snapshot.action_seq[0, 1]) == mpdm.LCL

        # a context-free server on the same states roots at LK instead —
        # the carried commitment changes the tree (and the decision root)
        fresh = self._server()
        fresh.tick(states1, stamp=stamp1)
        assert int(fresh._snapshot.action_seq[0, 1]) == mpdm.LK

    def test_completed_change_collapses_root(self):
        srv = self._server()
        d0 = srv.tick(jnp.array(self.SLOW_LEADER), stamp=0.0)
        assert d0.behavior == mpdm.LCL
        assert srv._snapshot.lc_lat == mpdm.LCL
        # ego arrived on the target (left) lane: the lc context completes
        # and the next tree roots at LK again (eudm_manager.cc:93-96)
        states2 = jnp.array([[10.0, 3.5, 0.0, 6.0, 0.0, 0.0],
                             [27.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
        d2 = srv.tick(states2, stamp=1.3)
        assert d2.ongoing_lat == mpdm.LK
        assert srv._snapshot.lc_lat != mpdm.LCL or \
            int(srv._snapshot.action_seq[0, 1]) == mpdm.LK


class TestRingLane:
    def test_closed_lane_wraps_at_seam(self):
        """Ring lanes (closed courses like the reference's ring_exp_v1.0)
        wrap arc-length queries: a lookahead past the seam lands at the
        lap start instead of freezing on the last sample."""
        th = np.linspace(0.0, 2 * np.pi, 64)
        wp = np.stack([20.0 * np.cos(th), 20.0 * np.sin(th)], axis=1)
        ring = lane_mod.build_lane(wp, ds=0.5, P=512, closed=True)
        assert bool(ring.closed)
        L = float(ring.length)
        p_wrap, t_wrap, _ = lane_mod.lane_point(ring, jnp.asarray(L + 3.0))
        p_ref, t_ref, _ = lane_mod.lane_point(ring, jnp.asarray(3.0))
        np.testing.assert_allclose(np.asarray(p_wrap), np.asarray(p_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_wrap), np.asarray(t_ref),
                                   atol=1e-5)
        # an OPEN lane with the same geometry still clamps
        open_lane = lane_mod.build_lane(wp[:48], ds=0.5, P=512)
        assert not bool(open_lane.closed)
        Lo = float(open_lane.length)
        p_end, _, _ = lane_mod.lane_point(open_lane, jnp.asarray(Lo + 3.0))
        p_last, _, _ = lane_mod.lane_point(open_lane, jnp.asarray(Lo))
        np.testing.assert_allclose(np.asarray(p_end), np.asarray(p_last),
                                   atol=1e-6)

    def test_pure_pursuit_crosses_seam(self):
        """Closed-loop: an agent tracking a ring lane keeps converging to
        the centerline across the seam (no end-of-lane lookahead freeze)."""
        th = np.linspace(0.0, 2 * np.pi, 64)
        wp = np.stack([30.0 * np.cos(th), 30.0 * np.sin(th)], axis=1)
        ring = lane_mod.build_lane(wp, ds=0.5, P=512, closed=True)
        lanes = jax.tree.map(lambda f: f[None], ring)
        # start just BEFORE the seam (s ~ length - 5), on-lane heading
        L = float(ring.length)
        pos, heading = lane_mod.state_of_frenet(ring, jnp.asarray(L - 5.0),
                                                jnp.asarray(0.0))
        states = jnp.concatenate([pos, jnp.asarray([float(heading), 6.0,
                                                    0.0, 0.0])])[None]
        traj = fsim.rollout(lanes, states, default_geom(1),
                            jnp.array([6.0]), fsim.SimParam(), 0.2, 60)
        # 12 s at ~6 m/s crosses the seam; lateral deviation stays small
        radii = np.linalg.norm(np.asarray(traj[:, 0, 0:2]), axis=-1)
        assert np.abs(radii - 30.0).max() < 0.6
        # and the vehicle actually passed the seam (angle wrapped)
        ang = np.unwrap(np.arctan2(np.asarray(traj[:, 0, 1]),
                                   np.asarray(traj[:, 0, 0])))
        assert ang[-1] - ang[0] > 5.2 / 30.0 * 60 * 0.2 * 0.5
