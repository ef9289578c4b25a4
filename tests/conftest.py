"""Test configuration: force an 8-device CPU mesh and float64 for parity math.

The execution harness pins the remote-TPU "axon" PJRT plugin via
PYTHONPATH sitecustomize + JAX_PLATFORMS=axon; once registered it overrides
any later platform selection (and deadlocks under pytest). Tests must run on
local CPU, so if the axon environment is detected we re-exec pytest once with
a scrubbed environment before anything touches jax. The driver's benchmark
entry points (bench.py, __graft_entry__.py) still run on the real TPU.
"""

import os
import sys

if (os.environ.get("DFTPAV_TESTS_REEXECED") != "1"
        and os.environ.get("DFTPAV_HW_TESTS") != "1") and (
    os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
    or ".axon_site" in os.environ.get("PYTHONPATH", "")
):
    env = dict(os.environ)
    env["DFTPAV_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    # works for both `python -m pytest ...` and the `pytest` console script:
    # argv[1:] holds the user arguments in either case
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

if os.environ.get("DFTPAV_HW_TESTS") == "1":
    # hardware-test mode (tests/test_fused_hw.py): keep the real TPU
    # backend and f32 — only the hardware-gated tests run meaningfully
    import jax  # noqa: E402
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_enable_x64", True)
