"""Batched CheckReplan gating + long-horizon warm streams.

Reference semantics: TrajPlannerServer::CheckReplan replans only when
needed — no executing trajectory, trajectory nearly exhausted, or a
collision found sweeping the executing trajectory at 0.05 s granularity
(traj_server_ros.cpp:359-402). The single-scenario server reproduces this
host-side (sim/server.py); replan.check_replan_batch is the batched/jitted
twin, and make_gated_replanner re-solves only the flagged lanes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dftpav_tpu import replan, scenarios, solver
from dftpav_tpu.config import EngineFlags, PlannerConfig
from dftpav_tpu.types import Dims, weights_from_config

DIMS = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
B = 8


@pytest.fixture(scope="module")
def solved():
    cfg = PlannerConfig()
    scens = scenarios.batch_scenarios(DIMS, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)
    res = solver.make_solver(cfg, DIMS, max_iterations=80,
                             engine="rounds")(batch, w)
    return cfg, batch, res, w


class TestCheckReplanBatch:
    def test_fresh_solutions_mostly_clear(self, solved):
        """A just-solved batch should not mass-trigger replans (the whole
        point of gating: the reference replans the minority that needs
        it)."""
        cfg, batch, res, w = solved
        need = replan.check_replan_batch(batch, res, jnp.zeros((B,)), w,
                                         DIMS, cfg)
        assert np.asarray(need).mean() <= 0.5

    def test_blocked_corridor_triggers(self, solved):
        """A lane whose corridor the executing trajectory violates (the
        map changed) must replan; untouched lanes must not flip."""
        cfg, batch, res, w = solved
        need0 = np.asarray(replan.check_replan_batch(
            batch, res, jnp.zeros((B,)), w, DIMS, cfg))
        cn = np.asarray(batch.corr_n)
        cp = np.asarray(batch.corr_p).copy()
        cp[0] -= 50.0 * cn[0]          # push lane 0's planes past the traj
        bad = batch._replace(corr_p=jnp.asarray(cp))
        need1 = np.asarray(replan.check_replan_batch(
            bad, res, jnp.zeros((B,)), w, DIMS, cfg))
        assert need1[0]
        np.testing.assert_array_equal(need0[1:], need1[1:])

    def test_near_end_triggers_only_when_goal_moved(self, solved):
        """Reference is_near && target_moved (traj_server_ros.cpp:373-380):
        near the end of the trajectory, a MOVED goal forces a replan; a
        static goal (end pose still on target) does not — a parked lane
        idles."""
        cfg, batch, res, w = solved
        T_tot = np.asarray(res.dT)[:, 0] * DIMS.N
        age = jnp.asarray(T_tot - 1.0)         # < near_end_s remaining
        need_static = np.asarray(replan.check_replan_batch(
            batch, res, age, w, DIMS, cfg))
        fin = np.asarray(batch.fin_state).copy()
        fin[:, -1, :, 0] += 2.0                # goal teleports 2 m
        moved = batch._replace(fin_state=jnp.asarray(fin))
        need_moved = np.asarray(replan.check_replan_batch(
            moved, res, age, w, DIMS, cfg))
        assert need_moved.all()
        assert need_moved.sum() > need_static.sum()

    def test_failed_solve_triggers(self, solved):
        cfg, batch, res, w = solved
        res_f = res._replace(success=res.success & (jnp.arange(B) != 2))
        need = np.asarray(replan.check_replan_batch(
            batch, res_f, jnp.zeros((B,)), w, DIMS, cfg))
        assert need[2]


class TestGatedReplanner:
    def test_gated_step_semantics(self, solved):
        """A gated tick re-solves flagged lanes (age resets to 0) and only
        ages the clear ones; untouched lanes keep their previous result
        bit-identically."""
        cfg, batch, res, w = solved
        gr = replan.make_gated_replanner(cfg, DIMS, dt_shift=0.1,
                                         max_iterations=30,
                                         engine="rounds", capacity=0.5)
        age0 = jnp.zeros((B,), batch.init_T.dtype)
        gb, gp, ga, n_need = gr(batch, res, age0, w)
        need = np.asarray(replan.check_replan_batch(
            batch, res, age0 + 0.1, w, DIMS, cfg))
        ga = np.asarray(ga)
        assert int(np.asarray(n_need)) == int(need.sum())
        # aged lanes: exactly the un-replanned ones sit at 0.1
        n_replanned = int((ga == 0.0).sum())
        assert n_replanned == min(int(need.sum()), B)
        cost0 = np.asarray(res.cost)
        cost1 = np.asarray(gp.cost)
        keep = ~need
        np.testing.assert_array_equal(cost0[keep], cost1[keep])

    def test_long_horizon_stream_50_ticks(self, solved):
        """VERDICT r4 task 10: a 50-tick gated warm stream keeps success
        full and the cost trajectory bounded (warm-start drift does not
        accumulate)."""
        cfg, batch, res, w = solved
        gr = replan.make_gated_replanner(cfg, DIMS, dt_shift=0.1,
                                         max_iterations=30,
                                         engine="rounds", capacity=0.5)
        gb, gp, ga = batch, res, jnp.zeros((B,), batch.init_T.dtype)
        cost_first = float(np.nanmedian(np.asarray(gp.cost)))
        for _ in range(50):
            gb, gp, ga, _n = gr(gb, gp, ga, w)
        succ = np.asarray(gp.success.astype(jnp.int32))
        assert succ.mean() == 1.0
        cost_last = float(np.nanmedian(np.asarray(gp.cost)))
        # remaining problems shrink as lanes execute: cost must not grow
        assert cost_last < 2.0 * cost_first


class TestMultigearWarmStream:
    def test_warm_stream_crosses_gear_boundary(self):
        """VERDICT r4 task 10 (multigear leg): the (8, 2) per-segment
        class's warm stream stays successful across the gear boundary —
        slot-aware resampling re-pieces the crossing segment at the slot's
        own count and remaps its corridors (ADVICE r4 medium fix)."""
        dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=2, Po=8, Ns=(8, 2))
        cfg = PlannerConfig()
        scen = scenarios.gear_scenario(dims)
        scen = jax.tree.map(
            lambda a: np.asarray(a, np.float32)
            if np.asarray(a).dtype == np.float64 else np.asarray(a), scen)
        batch = jax.tree.map(jnp.asarray,
                             scenarios.stack_scenarios([scen] * 4))
        w = weights_from_config(cfg.opt, dtype=jnp.float32)
        solve = solver.make_solver(cfg, dims, max_iterations=120,
                                   engine="rounds",
                                   flags=EngineFlags.tuned())
        res = solve(batch, w)
        assert np.asarray(res.success.astype(jnp.int32)).all()
        T0 = float(np.asarray(res.dT)[0, 0]) * dims.N  # first-gear duration
        rp = replan.make_replanner(cfg, dims, dt_shift=0.6 * T0,
                                   max_iterations=120, engine="rounds",
                                   flags=EngineFlags.tuned())
        # two shifts of 0.6*T0 cross the gear boundary
        b1, r1 = rp(batch, res, w)
        assert np.asarray(r1.success.astype(jnp.int32)).all()
        b2, r2 = rp(b1, r1, w)
        assert np.asarray(r2.success.astype(jnp.int32)).mean() >= 0.75
        # after the crossing, the active (former reversal) segment's head
        # velocity direction flips sign vs the original approach
        m2 = np.asarray(b2.seg_mask)
        assert m2[:, 1].sum() < m2[:, 0].sum() or m2[:, 0].all()

    def test_slot_resample_fractions(self):
        """The warm guess for a slot with Ns[s]=2 carries ONE midpoint at
        1/2 of the remaining duration (not 1/8 — the ADVICE r4 bug)."""
        from dftpav_tpu import minco

        dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8, Ns=(8, 2))
        cfg = PlannerConfig()
        w = weights_from_config(cfg.opt, dtype=jnp.float64)
        scen = scenarios.gear_scenario(dims)
        scen_j = jax.tree.map(jnp.asarray, scen)
        # synthetic previous solution: straight-line coefficients
        from dftpav_tpu.types import SolveResult

        N = dims.N
        coeffs = np.zeros((2, N, 6, 2))
        for s in range(2):
            for i in range(N):
                coeffs[s, i, 0] = (i * 1.0, float(s))   # piece start
                coeffs[s, i, 1] = (1.0, 0.0)            # d/dtau = 1 in x
        prev = SolveResult(
            coeffs=jnp.asarray(coeffs), dT=jnp.asarray([1.0, 0.5]),
            cost=jnp.asarray(1.0), n_iters=jnp.asarray(10),
            status=jnp.asarray(0), success=jnp.asarray(True))
        out = replan.warm_start_scenario_multigear(scen_j, prev, 0.0, w,
                                                   dims)
        # slot 1 (2 pieces over segment 1, duration 4.0, x from 0..8):
        # ONE valid midpoint at x = 4.0 (fraction 1/2), rest zero padding
        inner1 = np.asarray(out.init_inner)[1]
        np.testing.assert_allclose(inner1[0, 0], 4.0, atol=1e-6)
        np.testing.assert_allclose(inner1[1:], 0.0)
        # slot 0 (8 pieces over segment 0): midpoints at k/8 of duration 8
        inner0 = np.asarray(out.init_inner)[0]
        np.testing.assert_allclose(inner0[:, 0], np.arange(1, 8),
                                   atol=1e-6)
