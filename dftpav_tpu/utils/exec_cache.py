"""On-disk executable cache: serialize compiled XLA executables and
cold-load them in later processes.

The remote-TPU relay compiles the fused-kernel class in ~150-230 s
(local chipless AOT: ~55 s), and JAX's persistent compilation cache
cannot be used (its read path hung the relay when force-enabled —
utils/cache.py). `jax.experimental.serialize_executable`, however, works
through the relay (measured: the B=1024 fused headline serializes to a
43 MB blob in 0.5 s and a FRESH process loads it in 0.4 s and runs
correctly) — so the cold-start cost of a cached class is load + first
dispatch (~9 s) instead of a full compile.

Safety: the cache key hashes jax version, device kind, the caller's key
parts (dims/weights/iteration budget/engine flags/batch shapes) AND the
source bytes of every module that shapes the compiled program — any code
change invalidates the cache. Kill switch: DFTPAV_EXEC_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

# modules whose source defines the compiled program (relative to the
# package root); hashed into every cache key
_SOURCE_MODULES = (
    "ops/pallas_solve.py", "ops/kcost.py", "ops/bcost.py", "ops/blbfgs.py",
    "cost.py", "minco.py", "basis.py", "lbfgs.py", "config.py", "types.py",
    "solver.py",
)

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DIR = os.path.join(os.path.dirname(_PKG_DIR), ".exec_cache")


def enabled() -> bool:
    return os.environ.get("DFTPAV_EXEC_CACHE", "1") != "0"


def _source_hash() -> str:
    h = hashlib.sha256()
    for rel in _SOURCE_MODULES:
        p = os.path.join(_PKG_DIR, rel)
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())
    return h.hexdigest()[:16]


def cache_key(key_parts) -> str:
    import jax

    try:
        dev = jax.devices()[0]
        dev_kind = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    except Exception:
        dev_kind = "none"
    # program-shaping knobs (EngineFlags etc.) arrive via key_parts — since
    # round 5 the traced program reads no environment variables, so the key
    # no longer scrapes os.environ
    payload = repr((jax.__version__, dev_kind, _source_hash(), key_parts))
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def gc(cache_dir: str | None = None, max_bytes: int | None = None) -> int:
    """Evict least-recently-used blobs until the cache fits max_bytes
    (default DFTPAV_EXEC_CACHE_MAX_GB, 3.0). Returns bytes freed. Runs
    automatically after every save; loads bump mtime so warm classes
    survive."""
    cdir = cache_dir or os.environ.get("DFTPAV_EXEC_CACHE_DIR", DEFAULT_DIR)
    if max_bytes is None:
        max_bytes = int(float(os.environ.get(
            "DFTPAV_EXEC_CACHE_MAX_GB", "3.0")) * (1 << 30))
    try:
        entries = []
        for name in os.listdir(cdir):
            if not name.endswith(".pkl"):
                continue
            path = os.path.join(cdir, name)
            st = os.stat(path)
            entries.append((st.st_mtime, st.st_size, path))
    except OSError:
        return 0
    total = sum(e[1] for e in entries)
    freed = 0
    for mtime, size, path in sorted(entries):
        if total - freed <= max_bytes:
            break
        try:
            os.remove(path)
            freed += size
        except OSError:
            pass
    return freed


def load_or_compile(jitted, args, key_parts, cache_dir: str | None = None,
                    verbose: bool = False):
    """Return a callable executable for `jitted` on `args` (example values
    or ShapeDtypeStructs), loading a previously-serialized executable when
    the key matches, else compiling and persisting it.

    key_parts: any repr-able value capturing everything that selects the
    program BESIDES the arg shapes/dtypes (weights, dims, budgets, engine
    flags) — arg shapes are appended automatically.
    """
    import jax
    from jax.experimental import serialize_executable as se

    shapes = jax.tree.map(
        lambda a: (tuple(a.shape), str(a.dtype)) if hasattr(a, "shape")
        else repr(a), args)
    key = cache_key((key_parts, shapes))
    cdir = cache_dir or os.environ.get("DFTPAV_EXEC_CACHE_DIR", DEFAULT_DIR)
    path = os.path.join(cdir, key + ".pkl")

    # deserialized executables re-target ALL local devices: under a
    # multi-device host (e.g. the 8-virtual-CPU test mesh) a blob compiled
    # single-device fails at dispatch, so the load path is single-device
    # only (the TPU relay exposes one device — the case that matters)
    single_dev = len(jax.devices()) == 1
    if enabled() and single_dev and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                blob = pickle.load(f)
            loaded = se.deserialize_and_load(*blob)
            try:
                os.utime(path)      # LRU bump for gc()
            except OSError:
                pass
            if verbose:
                print(f"[exec_cache] loaded {path}")
            return loaded
        except Exception as e:  # corrupt/incompatible blob: recompile
            if verbose:
                print(f"[exec_cache] load failed ({e}); recompiling")

    compiled = jitted.lower(*args).compile()
    if enabled():
        try:
            blob = se.serialize(compiled)
            os.makedirs(cdir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump(blob, f)
            os.replace(tmp, path)
            gc(cdir)
            if verbose:
                print(f"[exec_cache] saved {path}")
        except Exception as e:
            if verbose:
                print(f"[exec_cache] save failed ({e}); continuing")
    return compiled
