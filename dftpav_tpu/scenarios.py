"""Scenario construction helpers: synthetic problems for tests and benchmarks,
and conversion of front-end output into solver scenarios.

The reference gets its problems from KinoAstar + getRectangleConst
(traj_manager.cpp:509-641); here we additionally provide fully synthetic
generators so the batched solver can be exercised at scale without a map.
"""

from __future__ import annotations

import numpy as np

from dftpav_tpu import minco
from dftpav_tpu.basis import sample_grid
from dftpav_tpu.types import Dims, Scenario, state_to_flat


def _init_traj_centers(ini, fin, inner, total_T, dims: Dims, dtype):
    """Sample the initial-guess MINCO trajectory at the constraint grid.

    The reference builds corridors around states sampled from the front-end
    trajectory the optimizer is seeded with (traj_manager.cpp:531-594);
    centering the synthetic corridor boxes on the same curve keeps fixtures
    faithful. Pure numpy (host-side fixture construction). Returns [N, K1, 2].
    """
    N = dims.N
    grid = sample_grid(dims.N, dims.K, dims.Kdes)
    dT = total_T / N
    Ainv = minco.minco_inverse(N)
    rhs = np.zeros((6 * N, 2))
    rhs[0] = ini[:, 0]
    rhs[1] = ini[:, 1] * dT
    rhs[2] = ini[:, 2] * dT * dT
    rhs[5:6 * (N - 1):6] = inner
    rhs[6 * N - 3] = fin[:, 0]
    rhs[6 * N - 2] = fin[:, 1] * dT
    rhs[6 * N - 1] = fin[:, 2] * dT * dT
    b = (Ainv @ rhs).reshape(N, 6, 2)
    pos = np.einsum("nkc,ncd->nkd", grid.beta[0], b).astype(dtype)
    dpos = np.einsum("nkc,ncd->nkd", grid.beta[1], b).astype(dtype)
    vn = np.linalg.norm(dpos, axis=-1, keepdims=True)
    head = np.where(vn > 1e-9, dpos / np.maximum(vn, 1e-9),
                    np.array([1.0, 0.0], dtype))
    return pos, head


def _corridor_from_obb(pos, head, grow, dims: Dims, dtype,
                       vehicle=None, singul=1):
    """Heading-aligned rectangle corridors grown from the vehicle footprint.

    Mirrors getRectangleConst (traj_manager.cpp:1213-1469): each corridor is a
    rectangle aligned with the sampled vehicle yaw, containing the OBB, with
    every side pushed out by `grow` (the reference grows until collision or a
    10 m cap; with no obstacles nearby that is a fixed margin).
    pos/head: [N, K1, 2] rear-axle positions and unit headings.
    """
    from dftpav_tpu.config import VehicleParam
    vp = vehicle or VehicleParam()
    h = head * float(singul)
    nvec = np.stack([-h[..., 1], h[..., 0]], axis=-1)
    center = pos + vp.d_cr * h
    ext_l = vp.length / 2.0 + grow
    ext_w = vp.width / 2.0 + grow
    n = np.stack([h, -h, nvec, -nvec], axis=-2).astype(dtype)   # [N,K1,4,2]
    p = np.stack([center + ext_l * h, center - ext_l * h,
                  center + ext_w * nvec, center - ext_w * nvec],
                 axis=-2).astype(dtype)
    mask = np.zeros(n.shape[:-1], bool)
    mask[..., :4] = True
    return n, p, mask


def _corridor_from_boxes(centers, half_x, half_y, dims: Dims, dtype):
    """Axis-aligned rectangle corridors per constraint point.

    centers: [N, K1, 2]. Returns (corr_n, corr_p, corr_mask) for one segment.
    Half-plane convention: outward unit normal n, boundary point p.
    """
    N, K1 = dims.N, dims.K1
    n = np.zeros((N, K1, dims.H, 2), dtype)
    p = np.zeros((N, K1, dims.H, 2), dtype)
    n[..., 0, :] = (1.0, 0.0)
    n[..., 1, :] = (-1.0, 0.0)
    n[..., 2, :] = (0.0, 1.0)
    n[..., 3, :] = (0.0, -1.0)
    p[..., 0, :] = centers + np.array([half_x, 0.0], dtype)
    p[..., 1, :] = centers - np.array([half_x, 0.0], dtype)
    p[..., 2, :] = centers + np.array([0.0, half_y], dtype)
    p[..., 3, :] = centers - np.array([0.0, half_y], dtype)
    mask = np.zeros((N, K1, dims.H), bool)
    mask[..., :4] = True
    return n, p, mask


def straight_scenario(dims: Dims, length=12.0, lateral=2.0, v0=1.0, v1=1.0,
                      corridor_half=8.0, wheel_base=2.85, dtype=np.float64,
                      n_obstacles=0, obstacle_speed=2.0, rng=None) -> Scenario:
    """A single forward segment from (0,0,yaw=0) to (length, lateral, yaw=0)
    inside a generous corridor. Optional circling obstacles mimic the parking
    scene's moving cars (reference: parking_moving_obstacles.cc:42-57)."""
    assert dims.S == 1, "straight_scenario builds single-segment problems"
    N, K1 = dims.N, dims.K1
    rng = rng or np.random.default_rng(0)

    ini = state_to_flat((0.0, 0.0), 0.0, v0, 0.0, 0.0, wheel_base, 1, dtype=dtype)
    fin = state_to_flat((length, lateral), 0.0, v1, 0.0, 0.0, wheel_base, 1,
                        dtype=dtype)

    frac = np.linspace(0.0, 1.0, N + 1)[1:-1]
    inner = np.stack([length * frac, lateral * frac], axis=-1).astype(dtype)

    dist = float(np.hypot(length, lateral))
    init_T = np.array([max(dist / 3.0, 1.0)], dtype)

    pos_c, head_c = _init_traj_centers(ini, fin, inner, float(init_T[0]),
                                       dims, dtype)
    corr_n, corr_p, corr_mask = _corridor_from_obb(
        pos_c, head_c, corridor_half, dims, dtype)

    O, Po = dims.O, dims.Po
    obs_coef = np.zeros((O, Po, 6, 2), dtype)
    obs_dt = np.ones((O,), dtype)
    obs_rel_t0 = np.zeros((O,), dtype)
    obs_mask = np.zeros((O,), bool)
    for o in range(min(n_obstacles, O)):
        # constant-velocity straight mover crossing near the path
        horizon = 30.0
        dt = horizon / Po
        ang = rng.uniform(0, 2 * np.pi)
        vel = obstacle_speed * np.array([np.cos(ang), np.sin(ang)])
        # start on/near the ego path so the interaction penalty activates
        u = rng.uniform(0.3, 0.7)
        start = np.array([length * u + rng.uniform(-1.0, 1.0),
                          lateral * u + rng.uniform(-1.5, 1.5)])
        # piecewise-linear as quintic pieces: c0 = segment start, c1 = vel*dt
        for pp in range(Po):
            obs_coef[o, pp, 0] = start + vel * (pp * dt)
            obs_coef[o, pp, 1] = vel * dt
        obs_dt[o] = dt
        obs_mask[o] = True

    return Scenario(
        ini_state=ini[None], fin_state=fin[None], init_inner=inner[None],
        init_T=init_T, singul=np.array([1], np.int32),
        seg_mask=np.array([True]),
        corr_n=corr_n[None], corr_p=corr_p[None], corr_mask=corr_mask[None],
        obs_coef=obs_coef, obs_dt=obs_dt, obs_rel_t0=obs_rel_t0,
        obs_mask=obs_mask,
    )


def random_parking_scenario(dims: Dims, rng, wheel_base=2.85,
                            dtype=np.float64, n_obstacles=0) -> Scenario:
    """Randomized maneuver: random goal offset/heading, tight-ish corridor,
    single forward segment (gear handling exercised in multiseg tests)."""
    length = rng.uniform(8.0, 18.0)
    lateral = rng.uniform(-4.0, 4.0)
    v0 = rng.uniform(0.2, 2.0)
    v1 = rng.uniform(0.2, 1.0)
    half = rng.uniform(3.0, 8.0)
    return straight_scenario(dims, length=length, lateral=lateral, v0=v0,
                             v1=v1, corridor_half=half, wheel_base=wheel_base,
                             dtype=dtype, n_obstacles=n_obstacles, rng=rng)


def stack_scenarios(scens: list[Scenario]) -> Scenario:
    """Stack single scenarios into a batched Scenario pytree (leading [B])."""
    return Scenario(*(np.stack(parts) for parts in zip(*scens)))


def batch_scenarios(dims: Dims, batch: int, seed=0, dtype=np.float64,
                    n_obstacles=0) -> Scenario:
    rng = np.random.default_rng(seed)
    return stack_scenarios([
        random_parking_scenario(dims, rng, dtype=dtype,
                                n_obstacles=n_obstacles)
        for _ in range(batch)])


def gear_scenario(dims: Dims, wheel_base=2.85, dtype=np.float64) -> Scenario:
    """Two-segment forward/reverse maneuver (S=2): drive forward, then back
    into a lateral offset — exercises gear-position/angle decision
    variables. Ns-aware: with a per-segment piece class, each slot's inner
    waypoints sit at its own k/Ns[s] fractions, corridors are laid out on
    its own sample grid, and durations scale with the slot's piece count
    (a 2-piece reversal gets a reversal-length duration — solving a short
    segment on 8 pieces produces dT^-5 jerk blowups by design)."""
    assert dims.S == 2
    N = dims.N
    ns = dims.ns_tuple
    ini = state_to_flat((0.0, 0.0), 0.0, 1.0, 0.0, 0.0, wheel_base, 1, dtype=dtype)
    mid_pos = np.array([8.0, 1.0])
    mid_yaw = 0.5
    mid_f = state_to_flat(mid_pos, mid_yaw, 0.2, 0.0, 0.0, wheel_base, 1, dtype=dtype)
    mid_b = state_to_flat(mid_pos, mid_yaw, 0.2, 0.0, 0.0, wheel_base, -1, dtype=dtype)
    end = state_to_flat((5.0, -2.0), 0.2, 0.5, 0.0, 0.0, wheel_base, -1, dtype=dtype)

    def seg_inner(n_s, a, b):
        frac = np.linspace(0.0, 1.0, n_s + 1)[1:-1]
        pts = (np.asarray(a) + (np.asarray(b) - np.asarray(a))
               * frac[:, None]).astype(dtype)
        out = np.zeros((N - 1, 2), dtype)
        out[:n_s - 1] = pts
        return out

    inner0 = seg_inner(ns[0], (0.0, 0.0), mid_pos)
    inner1 = seg_inner(ns[1], mid_pos, (5.0, -2.0))

    def seg_corridor(n_s, a, b):
        grid = sample_grid(n_s, dims.K, dims.Kdes)
        s_frac = (grid.frac / n_s).astype(dtype)        # [n_s, K1]
        c = (np.asarray(a)
             + (np.asarray(b) - np.asarray(a)) * s_frac[..., None])
        cn = np.zeros((N, dims.K1, dims.H, 2), dtype)
        cp = np.zeros((N, dims.K1, dims.H, 2), dtype)
        cm = np.zeros((N, dims.K1, dims.H), bool)
        d1 = Dims(**{**dims.__dict__, "S": 2, "N": n_s, "Ns": None})
        n_, p_, m_ = _corridor_from_boxes(c, 10.0, 10.0, d1, dtype)
        cn[:n_s], cp[:n_s], cm[:n_s] = n_, p_, m_
        return cn, cp, cm

    n0, p0, m0 = seg_corridor(ns[0], (0.0, 0.0), mid_pos)
    n1, p1, m1 = seg_corridor(ns[1], mid_pos, (5.0, -2.0))

    O, Po = dims.O, dims.Po
    return Scenario(
        ini_state=np.stack([ini, mid_b]),
        fin_state=np.stack([mid_f, end]),
        init_inner=np.stack([inner0, inner1]),
        init_T=np.array([4.0, 4.0], dtype) if dims.Ns is None else
        np.array([max(2.0, 0.75 * ns[0]), max(2.0, 0.75 * ns[1])], dtype),
        singul=np.array([1, -1], np.int32),
        seg_mask=np.array([True, True]),
        corr_n=np.stack([n0, n1]), corr_p=np.stack([p0, p1]),
        corr_mask=np.stack([m0, m1]),
        obs_coef=np.zeros((O, Po, 6, 2), dtype), obs_dt=np.ones((O,), dtype),
        obs_rel_t0=np.zeros((O,), dtype), obs_mask=np.zeros((O,), bool),
    )


def multi_gear_scenario(dims: Dims, wheel_base=2.85,
                        dtype=np.float64) -> Scenario:
    """S-segment alternating-gear zig-zag (forward, reverse, forward, ...).

    Generalizes gear_scenario to any segment count — S=3 is the classic
    'pull past - back in - pull forward' parallel-park shape, and the
    reference's manager plans however many gear segments the kino A* front
    end emits (traj_manager.cpp:543). Ns-aware exactly like gear_scenario:
    each slot's inner waypoints sit at its own k/Ns[s] fractions, corridors
    ride its own sample grid, and init durations scale with its piece
    count."""
    S, N = dims.S, dims.N
    ns = dims.ns_tuple

    # zig-zag waypoints: forward advances alternate with reverse tucks
    pts = [np.array([0.0, 0.0])]
    yaws = [0.0]
    for i in range(S):
        if i % 2 == 0:
            pts.append(pts[-1] + np.array([7.0, 1.2 - 1.6 * (i // 2)]))
            yaws.append(0.45)
        else:
            pts.append(pts[-1] + np.array([-3.2, -2.4]))
            yaws.append(0.15)
    sing = [1 if i % 2 == 0 else -1 for i in range(S)]

    def seg_inner(n_s, a, b):
        frac = np.linspace(0.0, 1.0, n_s + 1)[1:-1]
        out = np.zeros((N - 1, 2), dtype)
        out[:n_s - 1] = (np.asarray(a) + (np.asarray(b) - np.asarray(a))
                         * frac[:, None]).astype(dtype)
        return out

    def seg_corridor(n_s, a, b):
        grid = sample_grid(n_s, dims.K, dims.Kdes)
        s_frac = (grid.frac / n_s).astype(dtype)          # [n_s, K1]
        c = (np.asarray(a)
             + (np.asarray(b) - np.asarray(a)) * s_frac[..., None])
        cn = np.zeros((N, dims.K1, dims.H, 2), dtype)
        cp = np.zeros((N, dims.K1, dims.H, 2), dtype)
        cm = np.zeros((N, dims.K1, dims.H), bool)
        d1 = Dims(**{**dims.__dict__, "N": n_s, "Ns": None})
        n_, p_, m_ = _corridor_from_boxes(c, 10.0, 10.0, d1, dtype)
        cn[:n_s], cp[:n_s], cm[:n_s] = n_, p_, m_
        return cn, cp, cm

    ini_l, fin_l, inner_l, cn_l, cp_l, cm_l, T_l = [], [], [], [], [], [], []
    for i in range(S):
        vi = 1.0 if i == 0 else 0.2
        vo = 0.5 if i == S - 1 else 0.2
        ini_l.append(state_to_flat(pts[i], yaws[i], vi, 0.0, 0.0,
                                   wheel_base, sing[i], dtype=dtype))
        fin_l.append(state_to_flat(pts[i + 1], yaws[i + 1], vo, 0.0, 0.0,
                                   wheel_base, sing[i], dtype=dtype))
        inner_l.append(seg_inner(ns[i], pts[i], pts[i + 1]))
        n_, p_, m_ = seg_corridor(ns[i], pts[i], pts[i + 1])
        cn_l.append(n_)
        cp_l.append(p_)
        cm_l.append(m_)
        T_l.append(4.0 if dims.Ns is None else max(2.0, 0.75 * ns[i]))

    O, Po = dims.O, dims.Po
    return Scenario(
        ini_state=np.stack(ini_l), fin_state=np.stack(fin_l),
        init_inner=np.stack(inner_l),
        init_T=np.asarray(T_l, dtype),
        singul=np.asarray(sing, np.int32),
        seg_mask=np.ones((S,), bool),
        corr_n=np.stack(cn_l), corr_p=np.stack(cp_l),
        corr_mask=np.stack(cm_l),
        obs_coef=np.zeros((O, Po, 6, 2), dtype), obs_dt=np.ones((O,), dtype),
        obs_rel_t0=np.zeros((O,), dtype), obs_mask=np.zeros((O,), bool),
    )


# ---------------------------------------------------------------------------
# Front-end-sourced batches (the REAL problem distribution)
# ---------------------------------------------------------------------------

def random_lot_grid(rng, lot=(40.0, 60.0), res=0.1, n_boxes=6):
    """A randomized parking-lot occupancy grid: boundary walls + rectangular
    obstacle islands (the obstacles_norm.json analogue of the reference's
    playgrounds)."""
    from dftpav_tpu.frontend import GridMap2D

    ny, nx = int(lot[0] / res), int(lot[1] / res)
    occ = np.zeros((ny, nx), np.uint8)
    occ[:3, :] = 1
    occ[-3:, :] = 1
    occ[:, :3] = 1
    occ[:, -3:] = 1
    for _ in range(n_boxes):
        w = rng.uniform(2.0, 5.0)
        h = rng.uniform(2.0, 5.0)
        x0 = rng.uniform(4.0, lot[1] - 4.0 - w)
        y0 = rng.uniform(4.0, lot[0] - 4.0 - h)
        occ[int(y0 / res):int((y0 + h) / res),
            int(x0 / res):int((x0 + w) / res)] = 1
    return GridMap2D(occ, origin=(0.0, 0.0), resolution=res)


def frontend_batch(dims: Dims, batch: int, seed=0, dtype=np.float32,
                   n_obstacles=0, lot=(40.0, 60.0), queries_per_grid=16,
                   max_search_time=0.1):
    """Batched scenarios from the ACTUAL front end: randomized lot grids,
    native kino A* + Reeds-Shepp + rectangle-corridor growth
    (traj_manager.cpp:160-238 pipeline), optional circling movers MINCO-fit
    as surround trajectories (parking_moving_obstacles.cc:42-100).

    Only plans whose gear-segment count fits dims.S are kept (for the S=1
    bench class that is the single-gear subset of the distribution — same
    class the synthetic bench draws from, but with real corridor geometry).
    Returns a Scenario with leading [batch].
    """
    from dftpav_tpu.config import FrontendConfig, PlannerConfig
    from dftpav_tpu.pipeline import ParkingPlanner
    from dftpav_tpu.sim.obstacles import CircularMover, fit_surround_trajs

    rng = np.random.default_rng(seed)
    cfg = PlannerConfig()
    cfg = type(cfg)(**{**cfg.__dict__,
                       "frontend": FrontendConfig(
                           max_search_time=max_search_time)})
    out = []
    attempts = 0
    while len(out) < batch:
        grid = random_lot_grid(rng, lot=lot,
                               n_boxes=int(rng.integers(4, 9)))
        pp = ParkingPlanner(grid, cfg, dims, dtype=dtype)
        vp = cfg.vehicle

        def free_pose():
            for _ in range(50):
                x = rng.uniform(5.0, lot[1] - 5.0)
                y = rng.uniform(5.0, lot[0] - 5.0)
                yaw = rng.uniform(-np.pi, np.pi)
                if not grid.obb_collides(x, y, yaw, vp.length + 0.6,
                                         vp.width + 0.6, vp.d_cr):
                    return x, y, yaw
            return None

        for _ in range(queries_per_grid):
            if len(out) >= batch:
                break
            attempts += 1
            if attempts > 60 * batch:
                raise RuntimeError(
                    f"front end produced only {len(out)}/{batch} scenarios")
            sp = free_pose()
            if sp is None:
                continue
            # goal ahead-ish of the start so single-gear plans dominate when
            # dims.S == 1; multi-gear classes draw fully random goals
            if dims.S == 1:
                d = rng.uniform(8.0, 18.0)
                dyaw = rng.uniform(-0.7, 0.7)
                gx = sp[0] + d * np.cos(sp[2] + dyaw * 0.5)
                gy = sp[1] + d * np.sin(sp[2] + dyaw * 0.5)
                gyaw = sp[2] + dyaw
            else:
                g = free_pose()
                if g is None:
                    continue
                gx, gy, gyaw = g
            if not (3.0 < gx < lot[1] - 3.0 and 3.0 < gy < lot[0] - 3.0):
                continue
            if grid.obb_collides(gx, gy, gyaw, vp.length + 0.4,
                                 vp.width + 0.4, vp.d_cr):
                continue
            v0 = rng.uniform(0.2, 2.0)
            scen, meta = pp.plan_scenario((sp[0], sp[1], sp[2], v0),
                                          (gx, gy, gyaw, 0.0))
            if scen is None:
                continue
            if n_obstacles > 0 and dims.O > 0:
                movers = [CircularMover(
                    center=(rng.uniform(10.0, lot[1] - 10.0),
                            rng.uniform(10.0, lot[0] - 10.0)),
                    radius=rng.uniform(8.0, 14.0),
                    speed=rng.uniform(2.0, 4.5),
                    phase=rng.uniform(0.0, 2 * np.pi),
                    ccw=bool(rng.integers(0, 2)))
                    for _ in range(min(n_obstacles, dims.O))]
                obs = fit_surround_trajs(movers, 0.0, dims, dtype=dtype)
                scen = scen._replace(
                    obs_coef=obs["obs_coef"], obs_dt=obs["obs_dt"],
                    obs_rel_t0=obs["obs_rel_t0"], obs_mask=obs["obs_mask"])
            out.append(scen)
    return stack_scenarios(out)


def frontend_pool_multigear(classes, n_plans: int, seed=11,
                            dtype=np.float32, n_obstacles=0,
                            lot=(40.0, 60.0), queries_per_grid=16,
                            max_search_time=0.1):
    """Pool of TWO-gear front-end plans bucketed by per-segment piece
    class.

    `classes`: list of Dims with Ns set (the S=2 class ladder). Every
    successful nseg==2 plan is assembled for the class whose Ns equals its
    natural quantized counts (pipeline.plan_scenario ladder selection) —
    the reference plans EVERY scenario at its own piecing
    (traj_manager.cpp:543); this is its static-shape form. Returns
    (buckets, n_s2): buckets maps each class's Ns tuple to a list of
    Scenario, n_s2 counts all two-gear plans seen (including ones whose
    counts no class covers — the admission denominator for the
    distribution-weighted bench line).
    """
    from dftpav_tpu.config import FrontendConfig, PlannerConfig
    from dftpav_tpu.pipeline import ParkingPlanner
    from dftpav_tpu.sim.obstacles import CircularMover, fit_surround_trajs

    rng = np.random.default_rng(seed)
    cfg = PlannerConfig()
    cfg = type(cfg)(**{**cfg.__dict__,
                       "frontend": FrontendConfig(
                           max_search_time=max_search_time)})
    buckets = {c.Ns: [] for c in classes}
    n_s2 = 0
    attempts = 0
    got = 0
    while got < n_plans and attempts < 80 * n_plans:
        grid = random_lot_grid(rng, lot=lot,
                               n_boxes=int(rng.integers(4, 9)))
        pp = ParkingPlanner(grid, cfg, classes[0], dtype=dtype,
                            dims_classes=list(classes))
        vp = cfg.vehicle

        def free_pose():
            for _ in range(50):
                x = rng.uniform(5.0, lot[1] - 5.0)
                y = rng.uniform(5.0, lot[0] - 5.0)
                yaw = rng.uniform(-np.pi, np.pi)
                if not grid.obb_collides(x, y, yaw, vp.length + 0.6,
                                         vp.width + 0.6, vp.d_cr):
                    return x, y, yaw
            return None

        for _ in range(queries_per_grid):
            if got >= n_plans:
                break
            attempts += 1
            sp = free_pose()
            g = free_pose()
            if sp is None or g is None:
                continue
            if grid.obb_collides(g[0], g[1], g[2], vp.length + 0.4,
                                 vp.width + 0.4, vp.d_cr):
                continue
            v0 = rng.uniform(0.2, 2.0)
            scen, meta = pp.plan_scenario((sp[0], sp[1], sp[2], v0),
                                          (g[0], g[1], g[2], 0.0))
            if scen is None or meta.n_segments != 2:
                continue
            n_s2 += 1
            got += 1
            key = meta.dims.Ns
            if n_obstacles > 0 and meta.dims.O > 0:
                movers = [CircularMover(
                    center=(rng.uniform(10.0, lot[1] - 10.0),
                            rng.uniform(10.0, lot[0] - 10.0)),
                    radius=rng.uniform(8.0, 14.0),
                    speed=rng.uniform(2.0, 4.5),
                    phase=rng.uniform(0.0, 2 * np.pi),
                    ccw=bool(rng.integers(0, 2)))
                    for _ in range(min(n_obstacles, meta.dims.O))]
                obs = fit_surround_trajs(movers, 0.0, meta.dims,
                                         dtype=dtype)
                scen = scen._replace(
                    obs_coef=obs["obs_coef"], obs_dt=obs["obs_dt"],
                    obs_rel_t0=obs["obs_rel_t0"], obs_mask=obs["obs_mask"])
            buckets[key].append(scen)
    return buckets, n_s2
