"""TPU-optimized operator implementations (batch-minor layout, Pallas kernels).

The readable reference implementations live in dftpav_tpu.{cost,lbfgs} and are
batched with `jax.vmap` (batch-major: [B, ...small dims]). On TPU that layout
tiles every intermediate as (8, 128) over the *small* trailing dims — measured
44 GB of HBM traffic per cost+grad evaluation at B=1024 (~60 ms, ~100x off
speed-of-light). The modules here re-express the same math with the scenario
batch as the minor-most axis ([...small dims, B]) so the vector lanes are
filled by independent scenarios; the math and iterate paths are identical and
covered by parity tests against the vmap path (tests/test_ops.py).
"""

from dftpav_tpu.ops import bcost  # noqa: F401
