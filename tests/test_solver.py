"""End-to-end solves: convergence, constraint satisfaction, full-path parity
between the batched JAX solver and the scalar reference-oracle L-BFGS."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dftpav_tpu import cost as cost_mod
from dftpav_tpu import minco, scenarios, solver
from dftpav_tpu.basis import sample_grid
from dftpav_tpu.config import LBFGSParams, PlannerConfig
from dftpav_tpu.types import Dims, weights_from_config
from oracle import reference_lbfgs

CFG = PlannerConfig()
DIMS = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=0, Po=8)


def _check_trajectory(scen, res, dims, tol_corridor=0.05, tol_vel=0.15):
    """Sampled solution stays (approximately) inside corridors and limits.
    Penalties are soft, so small violations are expected — like the reference,
    which accepts any cost < 5e4 (traj_optimizer.cpp:197)."""
    grid = sample_grid(dims.N, dims.K, dims.Kdes)
    b = np.asarray(res.coeffs[0])     # [N,6,2]
    dT = float(res.dT[0])
    beta0 = grid.beta[0]
    beta1 = grid.beta[1]
    sig = np.einsum("nkc,ncd->nkd", beta0, b)
    dsig = np.einsum("nkc,ncd->nkd", beta1, b) / dT
    # corridor: ego hull vertices inside half-planes
    le, _dle, _L = cost_mod.hull_arrays(CFG)
    vn = np.maximum(np.linalg.norm(dsig, axis=-1, keepdims=True), 1e-9)
    R = np.stack([np.stack([dsig[..., 0], -dsig[..., 1]], -1),
                  np.stack([dsig[..., 1], dsig[..., 0]], -1)], -2) / vn[..., None]
    R = R * float(scen.singul[0])
    bpt = sig[:, :, None, :] + np.einsum("nkij,ej->nkei", R, le)
    viol = np.einsum("nkhd,nkehd->nkeh", np.asarray(scen.corr_n[0]),
                     bpt[:, :, :, None, :]
                     - np.asarray(scen.corr_p[0])[:, :, None, :, :])
    viol = np.where(np.asarray(scen.corr_mask[0])[:, :, None, :]
                    & np.asarray(grid.mask)[:, :, None, None], viol, -1.0)
    assert viol.max() < tol_corridor, f"corridor violation {viol.max()}"
    speeds = np.linalg.norm(dsig, axis=-1)[np.asarray(grid.mask)]
    assert speeds.max() < CFG.opt.max_forward_vel + tol_vel


def test_single_scenario_converges():
    scen = scenarios.straight_scenario(DIMS, length=14.0, lateral=2.0,
                                       corridor_half=4.0)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    res = solver.solve_one(jax.tree.map(jnp.asarray, scen), w, DIMS, CFG,
                           max_iterations=800)
    assert bool(res.success), (int(res.status), float(res.cost))
    assert float(res.cost) < 1e4
    _check_trajectory(scen, res, DIMS)
    # boundary conditions hold exactly (hard-constrained through MINCO)
    p0, v0 = minco.eval_derivatives(res.coeffs[0][0], res.dT[0],
                                    jnp.zeros(()), (0, 1))
    np.testing.assert_allclose(np.asarray(p0), np.asarray(scen.ini_state[0][:, 0]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(scen.ini_state[0][:, 1]),
                               atol=1e-9)


def test_batched_solver():
    B = 8
    scens = scenarios.batch_scenarios(DIMS, B, seed=3)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    solve = solver.make_solver(CFG, DIMS, max_iterations=600)
    res = solve(jax.tree.map(jnp.asarray, scens), w)
    assert res.coeffs.shape == (B, 1, DIMS.N, 6, 2)
    assert np.all(np.asarray(res.success)), (
        np.asarray(res.status), np.asarray(res.cost))


def test_full_path_parity_with_oracle():
    """The batched while-loop solver must follow the scalar oracle through an
    entire trajectory optimization (same cost function, f64): this is the
    config[1] parity gate from BASELINE.md."""
    dims = Dims(S=1, N=6, K=8, Kdes=12, H=4, O=0, Po=8)
    scen = scenarios.straight_scenario(dims, length=12.0, lateral=1.5,
                                       corridor_half=3.0)
    scen = jax.tree.map(jnp.asarray, scen)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    x0 = cost_mod.initial_guess(scen, w, dims)

    p = LBFGSParams(mem_size=64, past=3, delta=1e-4, g_epsilon=1e-16,
                    max_iterations=300)
    fun_jit = jax.jit(jax.value_and_grad(
        lambda x: cost_mod.total_cost(x, scen, w, dims, CFG)[0]))

    def fun_np(x):
        f, g = fun_jit(jnp.asarray(x))
        return float(f), np.asarray(g)

    from dftpav_tpu import lbfgs as jlbfgs
    res = jlbfgs.minimize(fun_jit, x0, p)
    xo, fo, _go, ko, so = reference_lbfgs.minimize(fun_np, np.asarray(x0), p)

    assert int(res.status) == so
    assert int(res.n_iters) == ko
    np.testing.assert_allclose(float(res.f), fo, rtol=1e-9)
    # trajectory deviation: sampled positions agree far below the 1e-3 gate
    u_j = cost_mod.unpack(res.x, dims)
    u_o = cost_mod.unpack(jnp.asarray(xo), dims)
    np.testing.assert_allclose(np.asarray(u_j.inner), np.asarray(u_o.inner),
                               atol=1e-6)
    T_j = cost_mod.virtual_to_real(u_j.vt, w.mini_t)
    T_o = cost_mod.virtual_to_real(u_o.vt, w.mini_t)
    np.testing.assert_allclose(np.asarray(T_j), np.asarray(T_o), rtol=1e-6)


def test_gear_scenario_solve():
    dims = Dims(S=2, N=6, K=8, Kdes=12, H=4, O=0, Po=8)
    scen = scenarios.gear_scenario(dims)
    w = weights_from_config(CFG.opt, dtype=jnp.float64)
    res = solver.solve_one(jax.tree.map(jnp.asarray, scen), w, dims, CFG,
                           max_iterations=800)
    assert bool(res.success), (int(res.status), float(res.cost))
    # gear junction: tail of seg0 == head of seg1 (position), velocities
    # opposite with magnitude non_sinv
    pe, ve = minco.eval_derivatives(res.coeffs[0][-1], res.dT[0],
                                    jnp.ones(()), (0, 1))
    ps, vs = minco.eval_derivatives(res.coeffs[1][0], res.dT[1],
                                    jnp.zeros(()), (0, 1))
    np.testing.assert_allclose(np.asarray(pe), np.asarray(ps), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ve), -np.asarray(vs), atol=1e-8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ve)),
                               CFG.opt.non_sinv, atol=1e-8)


def test_float32_solve():
    """The fast path (bench dtype) still succeeds."""
    scen = scenarios.straight_scenario(DIMS, dtype=np.float32)
    w = weights_from_config(CFG.opt, dtype=jnp.float32)
    res = solver.solve_one(jax.tree.map(jnp.asarray, scen), w, DIMS, CFG,
                           max_iterations=400)
    assert res.coeffs.dtype == jnp.float32
    assert bool(res.success), (int(res.status), float(res.cost))


def test_warm_start_replan_reduces_iterations():
    """Receding-horizon warm starts must collapse iteration counts
    (the batched equivalent of traj_server_ros.cpp:406-501 seeding)."""
    from dftpav_tpu import replan

    cfg = PlannerConfig()
    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    B = 16
    scens = scenarios.batch_scenarios(dims, B, seed=7, dtype=np.float32,
                                      n_obstacles=2)
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)
    cold = solver.make_solver(cfg, dims, max_iterations=150, jit=False)
    r0 = cold(batch, w)
    assert np.asarray(r0.success).all()

    rp = replan.make_replanner(cfg, dims, dt_shift=0.1, max_iterations=150,
                               jit=False)
    shifted, r1 = rp(batch, r0, w)
    assert np.asarray(r1.success).all()
    it0 = np.median(np.asarray(r0.n_iters))
    it1 = np.median(np.asarray(r1.n_iters))
    assert it1 < 0.6 * it0, (it0, it1)
    # shifted start state sits on the previous trajectory (continuity)
    p_prev = np.asarray(r0.coeffs[:, 0, 0, 0])  # not a strict check here
    assert shifted.ini_state.shape == batch.ini_state.shape


def test_warm_start_replan_multigear():
    """Multi-gear receding-horizon warm start (traj_server_ros.cpp:406-501
    over a SingulTrajData): iteration collapse within a segment, and correct
    gear-boundary crossing (segment roll + mask shrink) when the seed time
    passes the first gear switch."""
    from dftpav_tpu import replan

    cfg = PlannerConfig()
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    B = 4
    scens = scenarios.stack_scenarios(
        [scenarios.gear_scenario(dims, dtype=np.float32) for _ in range(B)])
    w = weights_from_config(cfg.opt, dtype=jnp.float32)
    batch = jax.tree.map(jnp.asarray, scens)
    cold = solver.make_solver(cfg, dims, max_iterations=300, jit=False)
    r0 = cold(batch, w)
    assert np.asarray(r0.success).all()

    # --- seed inside segment 0: both segments stay, iterations collapse ---
    rp = replan.make_replanner(cfg, dims, dt_shift=0.1, max_iterations=300,
                               jit=False)
    shifted, r1 = rp(batch, r0, w)
    assert np.asarray(r1.success).all()
    assert np.asarray(shifted.seg_mask).all()
    np.testing.assert_array_equal(np.asarray(shifted.singul),
                                  np.asarray(batch.singul))
    it0 = np.median(np.asarray(r0.n_iters))
    it1 = np.median(np.asarray(r1.n_iters))
    assert it1 < 0.6 * it0, (it0, it1)

    # new head = previous trajectory state at the seed time (independent
    # Horner evaluation of the normalized piece coefficients)
    T0 = float(np.asarray(r0.dT)[0, 0]) * dims.N
    c = np.asarray(r0.coeffs)[0, 0]                       # [N, 6, 2]
    dT = np.asarray(r0.dT)[0, 0]
    s = 0.1 / dT
    idx = min(int(s), dims.N - 1)
    tau = s - idx
    pos = sum(c[idx, k] * tau**k for k in range(6))
    np.testing.assert_allclose(np.asarray(shifted.ini_state)[0, 0, :, 0],
                               pos, atol=1e-5)

    # --- seed past the gear switch: roll to segment 1, one active segment ---
    t_cross = T0 + 0.2
    rp2 = replan.make_replanner(cfg, dims, dt_shift=t_cross,
                                max_iterations=300, jit=False)
    shifted2, r2 = rp2(batch, r0, w)
    sm = np.asarray(shifted2.seg_mask)
    assert sm[:, 0].all() and not sm[:, 1].any(), sm
    np.testing.assert_array_equal(np.asarray(shifted2.singul)[:, 0],
                                  np.asarray(batch.singul)[:, 1])
    assert np.asarray(r2.success).all(), np.asarray(r2.cost)
    # remaining duration ~ T1 - 0.2
    T1 = np.asarray(r0.dT)[0, 1] * dims.N
    np.testing.assert_allclose(np.asarray(shifted2.init_T)[0, 0],
                               T1 - 0.2, rtol=0.05)


def test_solve_with_retry_scatters_fixed_lanes():
    """solver.solve_with_retry: failed lanes are re-solved at rescaled
    initial durations and their results scattered back; successful lanes
    keep their first result untouched."""
    import numpy as np

    from dftpav_tpu import scenarios as scen_mod
    from dftpav_tpu import solver as solver_mod
    from dftpav_tpu.types import Dims, SolveResult, weights_from_config
    from dftpav_tpu.config import PlannerConfig

    dims = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    batch = scen_mod.batch_scenarios(dims, 8, seed=3, dtype=np.float64)
    batch = jax.tree.map(jnp.asarray, batch)
    w = weights_from_config(PlannerConfig().opt, jnp.float64)

    calls = []

    def fake_solve(b, _w):
        B = b.ini_state.shape[0]
        calls.append((B, np.asarray(b.init_T[:, 0]).copy()))
        # lanes succeed iff their init_T was scaled up (> 1.5x the base)
        base = np.asarray(batch.init_T[:, 0])
        t = np.asarray(b.init_T[:, 0])
        # first call: lanes 0-5 succeed, 6-7 fail; retry calls: succeed
        # when the duration was stretched
        if len(calls) == 1:
            success = np.arange(B) < 6
        else:
            success = t > 1.2 * base[:1]  # stretched
        return SolveResult(
            coeffs=jnp.full((B, 1, 8, 6, 2), float(len(calls))),
            dT=jnp.ones((B, 1)), cost=jnp.full((B,), 7.0),
            n_iters=jnp.ones((B,), jnp.int32),
            status=jnp.zeros((B,), jnp.int32),
            success=jnp.asarray(success))

    out = solver_mod.solve_with_retry(fake_solve, batch, w,
                                      time_scales=(1.6,), pad_to=4)
    assert np.asarray(out.success).all()
    # retried lanes carry the second call's coeffs; others the first's
    c = np.asarray(out.coeffs)[:, 0, 0, 0, 0]
    np.testing.assert_array_equal(c[:6], 1.0)
    np.testing.assert_array_equal(c[6:], 2.0)
    # the retry batch was padded to a multiple of pad_to
    assert calls[1][0] == 4
