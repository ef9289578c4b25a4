"""Tests: route planner, semantic map, multi-vehicle arena, urban demo loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from dftpav_tpu.sim import arena
from dftpav_tpu.urban import forward_sim as fsim
from dftpav_tpu.urban import lane as lane_mod
from dftpav_tpu.urban import semantic_map
from dftpav_tpu.urban.route import LaneGraph, RoutePlanner


def lane_at(y, length=200.0):
    wps = np.stack([np.linspace(0, length, 21), y * np.ones(21)], 1)
    return lane_mod.build_lane(wps, ds=1.0, P=256)


def default_geom(A):
    ones = jnp.ones(A)
    return fsim.AgentGeom(length=4.88 * ones, width=1.9 * ones,
                          d_cr=1.015 * ones, wheel_base=2.85 * ones)


class TestRoutePlanner:
    def graph(self):
        # 0 -> 1 -> 2 -> 0 ring plus branch 1 -> 3
        return LaneGraph(successors=[[1], [2, 3], [0], []],
                         lengths=[50.0, 50.0, 50.0, 80.0])

    def test_assigned_target_bfs(self):
        rp = RoutePlanner(self.graph())
        path = rp.run_once(0, 0.0, target_lane=3)
        assert path == [0, 1, 3]

    def test_random_expansion_reaches_length(self):
        rp = RoutePlanner(self.graph(), max_length=120.0, seed=1)
        path = rp.run_once(0, 0.0)
        assert path[0] == 0
        assert sum(rp.graph.lengths[i] for i in path) >= 100.0

    def test_progress_drops_passed_lanes(self):
        rp = RoutePlanner(self.graph())
        rp.run_once(0, 0.0, target_lane=3)
        path = rp.run_once(1, 10.0, target_lane=3)
        assert path == [1, 3]

    def test_finishes_at_path_end(self):
        rp = RoutePlanner(self.graph(), restart=False)
        rp.run_once(0, 0.0, target_lane=3)
        rp.run_once(3, 79.0, target_lane=3)
        assert rp.status == RoutePlanner.FINISHED


class TestSemanticMap:
    def test_nearest_lane_and_association(self):
        ls = lane_mod.build_lane_set([lane_at(0.0), lane_at(3.5)],
                                     [1, -1], [-1, 0])
        states = jnp.array([[10.0, 0.3, 0.0, 5.0, 0.0, 0.0],
                            [20.0, 3.4, 0.0, 5.0, 0.0, 0.0],
                            [20.0, 50.0, 0.0, 5.0, 0.0, 0.0]])
        ids = semantic_map.associate_lanes(ls, states)
        assert ids.tolist() == [0, 1, -1]

    def test_nearest_lane_heading_gate(self):
        ls = lane_mod.build_lane_set([lane_at(0.0)], [-1], [-1])
        # perpendicular heading -> rejected
        lid = semantic_map.nearest_lane(ls, jnp.array([10.0, 0.0]),
                                        jnp.asarray(np.pi / 2))
        assert int(lid) == -1

    def test_rasterize_circles_and_lookup(self):
        spec = semantic_map.GridSpec(origin=jnp.array([0.0, 0.0]),
                                     resolution=0.5, height=64, width=64)
        grid = semantic_map.rasterize_circles(
            spec, jnp.array([[8.0, 8.0]]), jnp.array([2.0]),
            jnp.array([True]))
        assert bool(semantic_map.occupied_at(spec, grid,
                                             jnp.array([8.0, 8.0])))
        assert not bool(semantic_map.occupied_at(spec, grid,
                                                 jnp.array([20.0, 20.0])))
        # out of bounds -> free
        assert not bool(semantic_map.occupied_at(spec, grid,
                                                 jnp.array([-5.0, -5.0])))

    def test_rasterize_obb(self):
        spec = semantic_map.GridSpec(origin=jnp.array([0.0, 0.0]),
                                     resolution=0.25, height=128, width=128)
        st = jnp.array([[10.0, 10.0, 0.0, 0.0, 0.0, 0.0]])
        grid = semantic_map.rasterize_obbs(
            spec, st, jnp.array([4.88]), jnp.array([1.9]),
            jnp.array([1.015]), jnp.array([True]))
        # body center is d_cr ahead of the rear axle
        assert bool(semantic_map.occupied_at(spec, grid,
                                             jnp.array([11.0, 10.0])))
        assert not bool(semantic_map.occupied_at(spec, grid,
                                                 jnp.array([10.0, 12.0])))

    def _occl_spec(self):
        return semantic_map.GridSpec(origin=jnp.array([0.0, 0.0]),
                                     resolution=0.5, height=64, width=64)

    def test_occluded_obstacle_absent_until_occluder_moves(self):
        """FakeMapper parity (data_renderer.cc:236-293): an obstacle hidden
        behind an occluder is absent from the rendered grid; when the
        occluder moves aside, the obstacle reappears."""
        spec = self._occl_spec()
        ego = jnp.array([4.0, 16.0])
        target = jnp.array([[28.0, 16.0]])     # far obstacle on the ray
        occluder = jnp.array([[14.0, 16.0]])   # between ego and target
        moved = jnp.array([[14.0, 26.0]])      # occluder shifted aside

        def render(occ_center):
            grid = semantic_map.rasterize_circles(
                spec, jnp.concatenate([target, occ_center]),
                jnp.array([1.5, 1.5]), jnp.array([True, True]))
            return semantic_map.fake_mapper(spec, grid, ego)

        sensed0 = render(occluder)
        # the occluder's ego-facing rim is visible, target is shadowed
        assert bool(semantic_map.occupied_at(spec, sensed0,
                                             jnp.array([12.8, 16.0])))
        assert not bool(semantic_map.occupied_at(spec, sensed0,
                                                 jnp.array([26.8, 16.0])))
        sensed1 = render(moved)
        assert bool(semantic_map.occupied_at(spec, sensed1,
                                             jnp.array([26.8, 16.0])))

    def test_fake_mapper_persists_seen_cells(self):
        """Previously-seen obstacle cells persist while in range
        (data_renderer.cc:244-258) and drop once the ego moves far away."""
        spec = self._occl_spec()
        target = jnp.array([[28.0, 16.0]])
        grid = semantic_map.rasterize_circles(
            spec, target, jnp.array([1.5]), jnp.array([True]))
        ego0 = jnp.array([4.0, 16.0])
        seen0 = semantic_map.fake_mapper(spec, grid, ego0)
        assert bool(semantic_map.occupied_at(spec, seen0,
                                             jnp.array([26.8, 16.0])))
        # obstacle now occluded by a new occluder, but memory keeps it
        grid2 = semantic_map.rasterize_circles(
            spec, jnp.concatenate([target, jnp.array([[14.0, 16.0]])]),
            jnp.array([1.5, 1.5]), jnp.array([True, True]))
        seen1 = semantic_map.fake_mapper(spec, grid2, ego0, seen_prev=seen0,
                                         dist_thres=30.0)
        assert bool(semantic_map.occupied_at(spec, seen1,
                                             jnp.array([26.8, 16.0])))
        # far-away ego: remembered cells outside dist_thres are dropped
        ego_far = jnp.array([300.0, 300.0])
        seen2 = semantic_map.fake_mapper(spec, jnp.zeros_like(grid), ego_far,
                                         seen_prev=seen1, dist_thres=10.0)
        assert not bool(semantic_map.occupied_at(spec, seen2,
                                                 jnp.array([26.8, 16.0])))

    def test_openloop_prediction_shape(self):
        ls = lane_mod.build_lane_set([lane_at(0.0), lane_at(3.5)],
                                     [1, -1], [-1, 0])
        states = jnp.array([[0.0, 0.0, 0.0, 5.0, 0.0, 0.0],
                            [20.0, 3.5, 0.0, 3.0, 0.0, 0.0]])
        ones = jnp.ones(2)
        geom = fsim.AgentGeom(4.88 * ones, 1.9 * ones, 1.015 * ones,
                              2.85 * ones)
        traj = semantic_map.openloop_prediction(
            ls, states, jnp.array([0, 1], jnp.int32), geom,
            fsim.SimParam(), 0.4, 10)
        assert traj.shape == (11, 2, 6)
        # openloop: agents keep their speeds approximately
        assert float(traj[-1, 1, fsim.V]) == pytest.approx(3.0, abs=0.3)


class TestArena:
    def test_straight_integration(self):
        s0 = jnp.array([[0.0, 0.0, 0.0, 0.0, 5.0]])
        ctrl = arena.ArenaControl(
            steer_rate=jnp.zeros(1), lon_acc=jnp.zeros(1),
            openloop=jnp.array([False]), target_state=jnp.zeros((1, 5)))
        out = arena.run_burst(s0, ctrl, jnp.array([2.85]), 0.002, 500)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   [5.0, 0.0, 0.0, 0.0, 5.0], atol=1e-4)

    def test_circle_radius_matches_bicycle_model(self):
        steer = 0.2
        wb = 2.85
        s0 = jnp.array([[0.0, 0.0, 0.0, steer, 3.0]])
        ctrl = arena.ArenaControl(
            steer_rate=jnp.zeros(1), lon_acc=jnp.zeros(1),
            openloop=jnp.array([False]), target_state=jnp.zeros((1, 5)))
        out = arena.run_burst(s0, ctrl, jnp.array([wb]), 0.002, 1000)
        # after 2 s at v=3: heading = v tan(steer)/L * t
        want = 3.0 * np.tan(steer) / wb * 2.0
        assert float(out[0, arena.ATH]) == pytest.approx(want, rel=1e-3)

    def test_openloop_teleport(self):
        s0 = jnp.zeros((1, 5))
        tgt = jnp.array([[9.0, 1.0, 0.3, 0.1, 4.0]])
        ctrl = arena.ArenaControl(
            steer_rate=jnp.zeros(1), lon_acc=jnp.zeros(1),
            openloop=jnp.array([True]), target_state=tgt)
        out = arena.step_all(s0, ctrl, jnp.array([2.85]), 0.002)
        np.testing.assert_allclose(np.asarray(out), np.asarray(tgt))

    def test_layout_roundtrip(self):
        s6 = jnp.array([[1.0, 2.0, 0.3, 4.0, 0.1, 0.5]])
        s5 = arena.from_agent_states(s6)
        back = arena.to_agent_states(s5, lon_acc=s6[:, 5])
        np.testing.assert_allclose(np.asarray(back), np.asarray(s6))


class TestUrbanDemo:
    def test_closed_loop_collision_free(self):
        import examples.urban_demo as demo
        collisions, v_mean = demo.main(["--steps", "30"])
        assert collisions == 0
        assert v_mean > 3.0


class TestLaneNetPlaygrounds:
    def test_highway_loads(self):
        from dftpav_tpu import playgrounds
        pg = playgrounds.load("highway_v1")
        assert pg.lane_set.n_lanes == 3
        assert len(pg.agents) == 5
        assert float(pg.lane_set.lane(0).length) == pytest.approx(600.0, abs=2)

    def test_ring_loads_and_mpdm_runs(self):
        from dftpav_tpu import playgrounds
        from dftpav_tpu.urban import mpdm, semantic_map

        pg = playgrounds.load("ring_v1")
        ls = pg.lane_set
        states = [[pg.start[0], pg.start[1], pg.start[2], pg.start[3],
                   0.0, 0.0]]
        for (lid, s, v) in pg.agents:
            pos, hd = lane_mod.state_of_frenet(
                ls.lane(lid), jnp.asarray(float(s)), jnp.asarray(0.0))
            states.append([float(pos[0]), float(pos[1]), float(hd), v,
                           0.0, 0.0])
        states = jnp.asarray(states)
        geom = default_geom(states.shape[0])
        lane_ids = semantic_map.associate_lanes(ls, states)
        assert (np.asarray(lane_ids) >= 0).all()
        res = mpdm.mpdm_plan(ls, states, jnp.maximum(lane_ids, 0), geom, 0,
                             fsim.SimParam(),
                             mpdm.MPDMConfig(desired_velocity=6.0))
        assert bool(res.valid[int(res.behavior)])
