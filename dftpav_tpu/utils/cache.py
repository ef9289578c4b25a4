"""Persistent-compilation-cache enabling that works on the axon TPU relay.

JAX's persistent cache normally self-disables on this environment: the
platform check passes (the relay reports platform "tpu"), but the cache is
only initialized through `is_cache_used` -> `_initialize_cache`, and that
path short-circuits before initialization under the relay client, so every
process pays the full remote compile (458 s for the bench class, measured
round 2). Forcing initialization via `set_cache_dir` + marking the cache
used makes the WRITE path live (entries serialize through the relay's PJRT
executable serialization — verified), but the READ path — deserializing a
cached executable back through the relay — HANGS the relay indefinitely
(reproduced twice at 500 s+). Until the relay implements executable
loading, this helper is useful only on real local TPU/CPU backends; do NOT
enable it in relay-driven benches.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Force-enable JAX's persistent compilation cache (idempotent).

    Call AFTER importing jax but before the first jit execution. Returns the
    cache directory in use.
    """
    import jax
    from jax._src import compilation_cache as cc

    # The relay backend hangs on cache READS (see module docstring): refuse
    # to arm the cache there unless the caller explicitly overrides.
    if (os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
            and not os.environ.get("DFTPAV_CACHE_FORCE")):
        raise RuntimeError(
            "enable_persistent_cache: relay environment detected "
            "(PALLAS_AXON_REMOTE_COMPILE set); executable deserialization "
            "hangs the relay. Set DFTPAV_CACHE_FORCE=1 to override.")

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    cc.set_cache_dir(path)
    try:
        # private internals (jax 0.9.0): force the is-cache-used probe past
        # the relay's platform short-circuit so writes happen
        with cc._cache_initialized_mutex:
            cc._cache_checked = True
            cc._cache_used = True
    except AttributeError as e:
        raise RuntimeError(
            "enable_persistent_cache relies on jax-internal attributes that "
            f"moved in this jax version: {e}") from e
    return path
