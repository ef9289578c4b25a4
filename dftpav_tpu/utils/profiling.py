"""Profiling helpers: JAX profiler traces + relay-safe device timing.

The reference's observability is printf timing (SURVEY.md §5). Here:
  * `trace(path)` wraps jax.profiler.trace for TensorBoard-viewable traces;
  * `device_time_ms` measures a jitted callable amortized over k chained
    device executions with ONE host readback — the only reliable timing
    through an RPC relay to remote TPUs, where a single call's wall time is
    dominated by round-trip latency (~33 ms on the axon relay).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block into `log_dir` (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Synchronize through a host readback; returns a scalar from x."""
    return float(np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])


def device_time_ms(fn, args, k: int = 10, reps: int = 3) -> float:
    """Amortized per-call device time of `fn(*args)` in ms.

    Chains k calls inside one jitted program (each call's first argument is
    perturbed by a tiny function of the previous result so XLA cannot CSE
    the calls away), then divides one readback-synchronized wall time by k.
    """
    def chained(first, rest):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *rest)
            leaf = jnp.asarray(jax.tree.leaves(out)[0])
            bump = (leaf.reshape(-1)[0] * 0.0).astype(x.dtype)
            return (x + bump, acc + leaf.reshape(-1)[0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, k, body, (first, jnp.float32(0)))
        return acc

    jfn = jax.jit(chained)
    first, rest = args[0], tuple(args[1:])
    _ = sync(jfn(first, rest))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = sync(jfn(first, rest))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / k
