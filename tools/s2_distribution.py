"""Measure the quantized per-segment piece-count distribution of the S<=2
front-end (reverse-park) plan stream — the data behind the multigear class
ladder (VERDICT r4 task 2: cover >= 95% of the S=2 distribution).

Host-only (native kino A* + corridor growth); prints the histogram of
pipeline.quantized_counts over successful plans.
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_plans=600, seed=11):
    from dftpav_tpu.config import FrontendConfig, PlannerConfig
    from dftpav_tpu.pipeline import ParkingPlanner, quantized_counts
    from dftpav_tpu.scenarios import random_lot_grid
    from dftpav_tpu.types import Dims

    rng = np.random.default_rng(seed)
    cfg = PlannerConfig()
    cfg = type(cfg)(**{**cfg.__dict__,
                       "frontend": FrontendConfig(max_search_time=0.1)})
    dims = Dims(S=2, N=8, K=16, Kdes=32, H=4, O=2, Po=8)
    lot = (40.0, 60.0)
    hist = collections.Counter()
    durs_by = collections.defaultdict(list)
    got = 0
    attempts = 0
    while got < n_plans and attempts < 80 * n_plans:
        grid = random_lot_grid(rng, lot=lot, n_boxes=int(rng.integers(4, 9)))
        pp = ParkingPlanner(grid, cfg, dims, dtype=np.float32)
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

        for _ in range(16):
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
            if scen is None:
                continue
            got += 1
            counts = quantized_counts(meta.durations, dims.N,
                                      cfg.opt.traj_piece_duration)
            hist[counts] += 1
            durs_by[counts].append(tuple(round(d, 2)
                                         for d in meta.durations))

    total = sum(hist.values())
    print(f"plans={total} (attempts={attempts})")
    cum = 0.0
    for counts, c in hist.most_common():
        cum += c / total
        print(f"  Ns={counts}: {c} ({100 * c / total:.1f}%)  cum "
              f"{100 * cum:.1f}%   e.g. durs {durs_by[counts][:3]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
