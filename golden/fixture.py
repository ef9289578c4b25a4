"""Fixture writer/parser for the golden C++ parity harness.

golden/oracle_main.cpp compiles the UNMODIFIED reference PolyTrajOptimizer
(/root/reference/src/Plan/traj_planner/src/traj_optimizer.cpp) headlessly;
this module converts a dftpav_tpu Scenario into the driver's text fixture and
parses the GOLDEN output lines back. Format documented in oracle_main.cpp.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent
ORACLE_BIN = GOLDEN_DIR / "build" / "golden_oracle"


def _fmt(x) -> str:
    return f"{float(x):.17g}"


def piece_resolutions(dims, n: int | None = None) -> list[int]:
    """Per-piece sample resolution K_i (traj_optimizer.cpp:486-523: first and
    last piece use destraj_resolution, interior pieces traj_resolution).
    `n` overrides the piece count (per-segment classes, Dims.Ns)."""
    n = dims.N if n is None else n
    return [dims.Kdes if i in (0, n - 1) else dims.K for i in range(n)]


def scenario_to_fixture(scen, dims, path, lbfgs_delta=None,
                        lbfgs_past=None) -> None:
    """Write one UNBATCHED Scenario (numpy float64 leaves) as a driver
    fixture. Per-segment piece classes (dims.Ns) write each segment with
    its OWN piece count — the reference's adaptive piecing
    (traj_manager.cpp:543) — reading only that segment's first n_s pieces
    of inner waypoints / corridors."""
    toks: list[str] = []
    S = int(np.sum(scen.seg_mask))
    toks.append(str(S))
    ns = dims.ns_tuple
    for s in range(S):
        n_s = ns[s]
        ks = piece_resolutions(dims, n_s)
        toks += [str(int(scen.singul[s])), str(n_s)]
        for M in (scen.ini_state[s], scen.fin_state[s]):
            for c in range(3):
                for r in range(2):
                    toks.append(_fmt(M[r, c]))
        for j in range(n_s - 1):
            toks += [_fmt(scen.init_inner[s, j, 0]),
                     _fmt(scen.init_inner[s, j, 1])]
        toks.append(_fmt(scen.init_T[s]))
        toks.append(str(sum(k + 1 for k in ks)))
        for i in range(n_s):
            for j in range(ks[i] + 1):
                H = int(np.sum(scen.corr_mask[s, i, j]))
                toks.append(str(H))
                for h in range(H):
                    n = scen.corr_n[s, i, j, h]
                    p = scen.corr_p[s, i, j, h]
                    toks += [_fmt(n[0]), _fmt(n[1]), _fmt(p[0]), _fmt(p[1])]
    O = int(np.sum(scen.obs_mask))
    toks.append(str(O))
    for o in range(O):
        dt = float(scen.obs_dt[o])
        Po = scen.obs_coef.shape[1]
        toks += [_fmt(scen.obs_rel_t0[o]), str(Po), _fmt(dt)]
        for pc in range(Po):
            c = scen.obs_coef[o, pc]  # [6, 2] normalized: sum_k c[k] tau^k
            # Reference Piece column j multiplies t^(5-j) in absolute in-piece
            # time (poly_traj_utils.hpp:76-85); tau = t/dt => c_t[k] = c[k]/dt^k.
            for j in range(6):
                k = 5 - j
                toks += [_fmt(c[k, 0] / dt ** k), _fmt(c[k, 1] / dt ** k)]
    if lbfgs_delta is not None:
        toks.append(_fmt(lbfgs_delta))
        if lbfgs_past is not None:
            toks.append(str(int(lbfgs_past)))
    Path(path).write_text("\n".join(toks) + "\n")


def run_oracle(fixture_path, n_samples: int = 200, timeout: float = 600.0):
    """Run the compiled reference on a fixture. Returns (ok, segs) where each
    seg is dict(T=, jerk=, pts=[(t, x, y), ...])."""
    out = subprocess.run(
        [str(ORACLE_BIN), str(fixture_path), str(n_samples)],
        capture_output=True, text=True, timeout=timeout, check=True)
    return parse_output(out.stdout)


def parse_output(text: str):
    ok, segs = None, []
    for line in text.splitlines():
        if not line.startswith("GOLDEN"):
            continue
        t = line.split()
        if t[1] == "ok":
            ok = bool(int(t[2]))
        elif t[1] == "seg":
            segs.append(dict(T=float(t[4]), jerk=float(t[6]), pts=[]))
        elif t[1] == "pt":
            segs[-1]["pts"].append((float(t[2]), float(t[3]), float(t[4])))
    return ok, segs


def sample_segment_positions(coeffs_seg, dT, n_samples: int = 200):
    """Sample positions of one optimized segment at t = T * j/(n-1).

    coeffs_seg: [N, 6, 2] normalized coefficients, dT scalar piece duration.
    Mirrors Trajectory::getPos (poly_traj_utils.hpp:76-85) for comparison.
    """
    coeffs_seg = np.asarray(coeffs_seg, np.float64)
    N = coeffs_seg.shape[0]
    dT = float(dT)
    T = N * dT
    ts = T * np.arange(n_samples) / (n_samples - 1)
    idx = np.minimum((ts / dT).astype(int), N - 1)
    tau = ts / dT - idx
    pows = tau[:, None] ** np.arange(6)
    pos = np.einsum("jk,jkd->jd", pows, coeffs_seg[idx])
    return ts, pos


def ensure_oracle_built() -> bool:
    """Build the oracle if missing or stale; returns False when the
    toolchain or the reference tree is unavailable (callers should skip).

    Staleness: the binary is rebuilt whenever oracle_main.cpp, build.sh, or
    any stub header is newer than it (the binary is NOT committed —
    golden/build/ is gitignored — so parity always runs against the current
    harness + reference source on this machine's toolchain)."""
    ref = Path("/root/reference/src/Plan/traj_planner/src/traj_optimizer.cpp")
    if not ref.exists():
        return ORACLE_BIN.exists()
    if ORACLE_BIN.exists():
        bin_mtime = ORACLE_BIN.stat().st_mtime
        srcs = [GOLDEN_DIR / "oracle_main.cpp", GOLDEN_DIR / "build.sh", ref]
        srcs += list((GOLDEN_DIR / "stubs").rglob("*.h"))
        if all(s.stat().st_mtime <= bin_mtime for s in srcs):
            return True
    try:
        subprocess.run(["bash", str(GOLDEN_DIR / "build.sh")],
                       capture_output=True, text=True, timeout=600, check=True)
    except (subprocess.SubprocessError, FileNotFoundError):
        return ORACLE_BIN.exists()
    return ORACLE_BIN.exists()
