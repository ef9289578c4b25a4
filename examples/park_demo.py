"""Closed-loop parking demo — the run.sh / park.cc equivalent.

Usage:
    python examples/park_demo.py [playground] [--duration 40] [--out demo.png]

Loads a playground, runs the receding-horizon closed loop (plant 500 Hz
substeps, control 100 Hz, replans 20 Hz) and renders the scene + executed
track to a PNG.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("playground", nargs="?", default="parking_lot")
    ap.add_argument("--duration", type=float, default=40.0)
    ap.add_argument("--out", default="park_demo.png")
    args = ap.parse_args()

    from dftpav_tpu import playgrounds, viz
    from dftpav_tpu.config import PlannerConfig
    from dftpav_tpu.pipeline import ParkingPlanner
    from dftpav_tpu.sim import PlannerServer, SimLoop
    from dftpav_tpu.types import Dims

    pg = playgrounds.load(args.playground)
    print(f"playground: {pg.name} — {pg.description}")
    cfg = PlannerConfig()
    O = max(len(pg.movers), 0)
    classes = [Dims(S=4, N=n, K=16, Kdes=32, H=4, O=O, Po=8)
               for n in (2, 4, 8)]
    pp = ParkingPlanner(pg.grid, cfg, classes[-1], dtype=np.float32,
                        dims_classes=classes)
    srv = PlannerServer(pp, goal=pg.goal, budget=0.5, movers=pg.movers)
    ego0 = [pg.start[0], pg.start[1], pg.start[2], 0.0, pg.start[3]]
    loop = SimLoop(srv, ego0=ego0)

    t0 = time.time()
    log = loop.run(duration=args.duration)
    ego = np.array(log.ego)
    err = np.hypot(ego[-1, 0] - pg.goal[0], ego[-1, 1] - pg.goal[1])
    print(f"sim {log.t[-1]:.1f}s in {time.time() - t0:.1f}s wall | "
          f"replans {srv.n_replans} (failed {srv.n_failures}) | "
          f"final error {err:.3f} m")

    ax = viz.plot_grid(pg.grid)
    viz.plot_ego_track(ax, ego)
    viz.plot_vehicle(ax, ego[-1, 0], ego[-1, 1], ego[-1, 2], cfg.vehicle,
                     color="tab:red", alpha=1.0)
    gx, gy, gyaw = pg.goal[0], pg.goal[1], pg.goal[2]
    viz.plot_vehicle(ax, gx, gy, gyaw, cfg.vehicle, color="tab:green",
                     alpha=1.0)
    for seg in srv.container.segments:
        viz.plot_trajectory(ax, seg.coeffs, seg.dT, seg.singul, cfg.vehicle)
    viz.save(ax, args.out, title=f"{pg.name}: final error {err:.2f} m")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
