"""Per-segment piece classes (Dims.Ns): the static-shape form of the
reference's adaptive piecing (max(round(dur/1s), 2), traj_manager.cpp:543).

Checks: (1) the piece-subdivision identity used to emit class-uniform
outputs is exact; (2) a short segment expressed inside a padded class
(Ns=(2,) at N=8) produces the IDENTICAL objective/gradient as the native
N=2 class; (3) the rounds engine solves a reverse-park class (8, 2) with
valid boundary conditions and continuous output trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dftpav_tpu import cost as cost_mod
from dftpav_tpu import minco, scenarios, solver
from dftpav_tpu.config import PlannerConfig
from dftpav_tpu.ops import kcost
from dftpav_tpu.types import Dims, weights_from_config

jax.config.update("jax_enable_x64", True)


def test_subdivision_exact():
    """minco.subdivide re-bases a quintic exactly: both representations
    evaluate identically (pos/vel/acc) at dense times."""
    rng = np.random.default_rng(0)
    n, r = 3, 4
    b = jnp.asarray(rng.normal(size=(n, 6, 2)))
    dT = 0.7
    bs = minco.subdivide(b, r)
    assert bs.shape == (n * r, 6, 2)
    dTs = dT / r
    for t in np.linspace(0.0, n * dT - 1e-9, 23):
        i = min(int(t / dT), n - 1)
        tau = t / dT - i
        j = min(int(t / dTs), n * r - 1)
        tau_s = t / dTs - j
        a = minco.eval_derivatives(b[i], dT, jnp.asarray(tau),
                                   orders=(0, 1, 2))
        c = minco.eval_derivatives(bs[j], dTs, jnp.asarray(tau_s),
                                   orders=(0, 1, 2))
        for x, y in zip(a, c):
            np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-9)


def _pad_scenario(scen, dims_small: Dims, dims_pad: Dims):
    """Embed a native (S=1, N=n) scenario into the padded Ns=(n,) class."""
    n = dims_small.N
    N = dims_pad.N
    K1 = dims_small.K1
    dt = scen.init_inner.dtype
    inner = jnp.zeros((1, N - 1, 2), dt).at[:, : n - 1].set(scen.init_inner)
    corr_n = jnp.zeros((1, N, K1, dims_pad.H, 2), dt).at[:, :n].set(
        scen.corr_n)
    corr_p = jnp.zeros((1, N, K1, dims_pad.H, 2), dt).at[:, :n].set(
        scen.corr_p)
    corr_m = jnp.zeros((1, N, K1, dims_pad.H), bool).at[:, :n].set(
        scen.corr_mask)
    return scen._replace(init_inner=inner, corr_n=corr_n, corr_p=corr_p,
                         corr_mask=corr_m)


def test_padded_short_class_matches_native_small_class():
    """Objective + used-row gradients of an Ns=(2,) padded class equal the
    native N=2 class on the same scenario (the padded sample rows and rhs
    rows must be inert)."""
    dtype = jnp.float64
    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, dtype)
    dims2 = Dims(S=1, N=2, K=16, Kdes=32, H=4, O=2, Po=8)
    dims_pad = Dims(S=1, N=8, K=16, Kdes=32, H=4, O=2, Po=8, Ns=(2,))
    B = 4
    small = scenarios.batch_scenarios(dims2, B, seed=3, dtype=np.float64,
                                      n_obstacles=2)
    small = jax.tree.map(jnp.asarray, small)
    clamped2 = jax.vmap(lambda s: solver.clamp_boundary_states(s, w))(small)
    padded = jax.vmap(lambda s: _pad_scenario(s, dims2, dims_pad))(clamped2)

    def pack(dims, batch):
        x0 = jax.vmap(lambda s: cost_mod.initial_guess(s, w, dims))(batch)
        dp = kcost.dp_of(dims)
        return jnp.zeros((dp, B), dtype).at[: x0.shape[1]].set(x0.T)

    sw = kcost.StaticW.build(w, PlannerConfig())
    with jax.default_matmul_precision("float32"):
        f2, g2 = kcost.eval_fg(pack(dims2, clamped2),
                               kcost.prep_scenario(clamped2, dims2, dtype),
                               kcost.make_consts(dims2, dtype), sw, dims2)
        fp, gp = kcost.eval_fg(pack(dims_pad, padded),
                               kcost.prep_scenario(padded, dims_pad, dtype),
                               kcost.make_consts(dims_pad, dtype), sw,
                               dims_pad)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(f2), rtol=1e-12)
    # used rows: 1 inner waypoint (2 rows) + 1 virtual time; the padded
    # class stores the inner waypoint in the same leading rows and the
    # virtual time at row 2*(N-1)
    np.testing.assert_allclose(np.asarray(gp[:2]), np.asarray(g2[:2]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gp[14]), np.asarray(g2[2]),
                               rtol=1e-10, atol=1e-12)
    # unused inner rows carry exactly zero gradient
    assert not np.any(np.asarray(gp[2:14]))


def test_rounds_engine_perseg_reverse_park():
    """solve_batch_rounds on the (8, 2) reverse-park class: solves land
    with ok statuses, the output (subdivided onto uniform N pieces)
    satisfies the boundary states and is continuous across pieces."""
    from dftpav_tpu.ops.pallas_solve import solve_batch_rounds

    dtype = jnp.float64
    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, dtype)
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8, Ns=(8, 2))
    B = 4
    scens = [scenarios.gear_scenario(Dims(S=2, N=8, K=16, Kdes=32, H=4,
                                          O=0, Po=8))
             for _ in range(B)]
    # shorten segment 1's duration so the (8, 2) class is the natural fit
    scens = [s._replace(init_T=np.asarray(s.init_T).copy()) for s in scens]
    batch = jax.tree.map(jnp.asarray, scenarios.stack_scenarios(scens))
    res = solve_batch_rounds(batch, w, dims, cfg, max_iterations=150)
    assert np.all(np.asarray(res.status) >= 0)
    assert np.all(np.asarray(res.success))

    # boundary + continuity on lane 0
    coeffs = np.asarray(res.coeffs)[0]        # [S, N, 6, 2]
    dT = np.asarray(res.dT)[0]                # [S]
    scen0 = jax.tree.map(lambda a: np.asarray(a)[0], batch)
    for s in range(2):
        b = jnp.asarray(coeffs[s])
        # head/tail position (junction positions are decision variables,
        # so only segment 0 head and segment 1 tail are pinned)
        p0, v0 = minco.eval_derivatives(b[0], dT[s], jnp.asarray(0.0),
                                        orders=(0, 1))
        pN, vN = minco.eval_derivatives(b[-1], dT[s], jnp.asarray(1.0),
                                        orders=(0, 1))
        if s == 0:
            np.testing.assert_allclose(np.asarray(p0),
                                       scen0.ini_state[0, :, 0], atol=1e-6)
            np.testing.assert_allclose(np.asarray(v0),
                                       scen0.ini_state[0, :, 1], atol=1e-6)
        if s == 1:
            np.testing.assert_allclose(np.asarray(pN),
                                       scen0.fin_state[1, :, 0], atol=1e-6)
            np.testing.assert_allclose(np.asarray(vN),
                                       scen0.fin_state[1, :, 1], atol=1e-6)
        # C2 continuity across every uniform output piece boundary
        for j in range(1, dims.N):
            left = minco.eval_derivatives(b[j - 1], dT[s], jnp.asarray(1.0),
                                          orders=(0, 1, 2))
            right = minco.eval_derivatives(b[j], dT[s], jnp.asarray(0.0),
                                           orders=(0, 1, 2))
            for x, y in zip(left, right):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-6, atol=1e-6)


def test_perseg_beats_uniform_overpiecing():
    """The point of the feature: a short reversal solved on 2 pieces must
    not do WORSE than over-pieced uniform N=8 on the same scenarios
    (PERF.md: over-piecing the 0.4 s reversal stiffens the warm-start
    spline, jerk ~ dT^-5, and stalls the line search)."""
    from dftpav_tpu.ops.pallas_solve import solve_batch_rounds

    dtype = jnp.float64
    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, dtype)
    base = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0, Po=8)
    B = 4
    scens = []
    for i in range(B):
        s = scenarios.gear_scenario(base)
        t = np.asarray(s.init_T).copy()
        t[1] = 0.5 + 0.1 * i          # short reversal
        scens.append(s._replace(init_T=t))
    batch = jax.tree.map(jnp.asarray, scenarios.stack_scenarios(scens))

    res_u = solve_batch_rounds(batch, w, base, cfg, max_iterations=150)
    res_p = solve_batch_rounds(batch, w,
                               Dims(S=2, N=8, K=16, Kdes=32, H=4, O=0,
                                    Po=8, Ns=(8, 2)),
                               cfg, max_iterations=150)
    assert np.asarray(res_p.success).sum() >= np.asarray(res_u.success).sum()
    ok = np.asarray(res_p.success) & np.asarray(res_u.success)
    if ok.any():
        # within the commonly-solved set the per-segment class should not
        # blow up cost (generous bound: the classes optimize slightly
        # different discretizations)
        assert (np.nanmedian(np.asarray(res_p.cost)[ok])
                <= 1.5 * np.nanmedian(np.asarray(res_u.cost)[ok]))


def test_rounds_engine_three_gear():
    """S=3 three-gear maneuver (forward - reverse - forward, the
    parallel-park shape) on a per-segment class Ns=(4, 2, 2): the solver
    stack is segment-count generic, so anything the front end emits beyond
    two gears (reference plans every segment at its own piecing,
    traj_manager.cpp:543) has a solving class. Asserts ok statuses, pinned
    start/goal boundary states, and C2 continuity inside each segment."""
    from dftpav_tpu.ops.pallas_solve import solve_batch_rounds

    cfg = PlannerConfig()
    w = weights_from_config(cfg.opt, jnp.float64)
    dims = Dims(S=3, N=8, K=16, Kdes=32, H=4, O=0, Po=8, Ns=(4, 2, 2))
    B = 4
    scens = [scenarios.multi_gear_scenario(dims) for _ in range(B)]
    batch = jax.tree.map(jnp.asarray, scenarios.stack_scenarios(scens))
    res = solve_batch_rounds(batch, w, dims, cfg, max_iterations=200)
    assert np.all(np.asarray(res.status) >= 0)
    assert np.all(np.asarray(res.success))

    coeffs = np.asarray(res.coeffs)[0]        # [S, N, 6, 2]
    dT = np.asarray(res.dT)[0]                # [S]
    scen0 = jax.tree.map(lambda a: np.asarray(a)[0], batch)
    # pinned ends: segment 0 head, segment S-1 tail
    b0 = jnp.asarray(coeffs[0])
    p0, v0 = minco.eval_derivatives(b0[0], dT[0], jnp.asarray(0.0),
                                    orders=(0, 1))
    np.testing.assert_allclose(np.asarray(p0), scen0.ini_state[0, :, 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), scen0.ini_state[0, :, 1],
                               atol=1e-6)
    bl = jnp.asarray(coeffs[2])
    pN, vN = minco.eval_derivatives(bl[-1], dT[2], jnp.asarray(1.0),
                                    orders=(0, 1))
    np.testing.assert_allclose(np.asarray(pN), scen0.fin_state[2, :, 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vN), scen0.fin_state[2, :, 1],
                               atol=1e-6)
    # C2 continuity across every uniform piece boundary in every segment
    for s in range(3):
        b = jnp.asarray(coeffs[s])
        for j in range(1, dims.N):
            left = minco.eval_derivatives(b[j - 1], dT[s], jnp.asarray(1.0),
                                          orders=(0, 1, 2))
            right = minco.eval_derivatives(b[j], dT[s], jnp.asarray(0.0),
                                           orders=(0, 1, 2))
            for x, y in zip(left, right):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-6, atol=1e-6)
