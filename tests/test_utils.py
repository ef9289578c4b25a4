"""Tests for the auxiliary subsystems: metrics, checkpoint, serialization."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dftpav_tpu.utils import (
    Metrics,
    TicToc,
    load_pytree,
    load_trajectory,
    save_pytree,
    save_trajectory,
    trajectory_from_dict,
    trajectory_to_dict,
)


class TestMetrics:
    def test_counters_and_series(self):
        m = Metrics()
        m.count("solves", 64)
        m.count("solves", 64)
        with m.timer("step"):
            pass
        m.record("step", 2.0)
        s = m.summary()
        assert s["solves"] == 128
        assert s["step"]["n"] == 2
        json.loads(m.dumps())  # valid JSON

    def test_throughput(self):
        m = Metrics()
        m.throughput("solves", 1000, 2.0)
        assert m.summary()["solves_per_s"] == pytest.approx(500.0)

    def test_tictoc_monotonic(self):
        t = TicToc()
        a = t.toc()
        b = t.toc()
        assert b >= a >= 0.0


class TestCheckpoint:
    def test_roundtrip_namedtuple_pytree(self, tmp_path):
        from dftpav_tpu.types import Dims, empty_obstacles

        dims = Dims(S=1, N=4, K=4, Kdes=4, H=4, O=2, Po=4)
        tree = empty_obstacles(dims)
        tree["extra"] = jnp.arange(7.0)
        path = str(tmp_path / "ckpt.npz")
        save_pytree(path, tree, metadata={"step": 42})
        loaded, meta = load_pytree(path, tree)
        assert meta["step"] == 42
        np.testing.assert_array_equal(np.asarray(loaded["extra"]),
                                      np.arange(7.0))
        assert loaded["obs_coef"].shape == tree["obs_coef"].shape

    def test_roundtrip_solve_result_like(self, tmp_path):
        tree = dict(x=np.random.default_rng(0).normal(size=(3, 5)),
                    ok=np.array([True, False, True]))
        path = str(tmp_path / "s.npz")
        save_pytree(path, tree)
        loaded, _ = load_pytree(path, tree)
        np.testing.assert_array_equal(loaded["x"], tree["x"])
        np.testing.assert_array_equal(loaded["ok"], tree["ok"])


class TestSerialization:
    def test_trajectory_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        coeffs = rng.normal(size=(2, 4, 6, 2))
        dT = np.array([0.9, 1.1])
        singul = np.array([1, -1])
        d = trajectory_to_dict(coeffs, dT, singul, start_time=3.25)
        c2, dT2, sg2, t0 = trajectory_from_dict(d)
        np.testing.assert_allclose(c2, coeffs)
        np.testing.assert_allclose(dT2, dT)
        assert sg2.tolist() == [1, -1]
        assert t0 == 3.25

        path = str(tmp_path / "traj.json")
        save_trajectory(path, coeffs, dT, singul, 3.25)
        c3, _, _, _ = load_trajectory(path)
        np.testing.assert_allclose(c3, coeffs)
        assert os.path.getsize(path) > 0

    def test_solved_trajectory_evaluates_after_roundtrip(self, tmp_path):
        """Solve -> serialize -> load -> evaluate states (end-to-end)."""
        from dftpav_tpu import minco

        coeffs = np.zeros((1, 3, 6, 2))
        coeffs[0, :, 1, 0] = 1.0  # x = tau per piece
        d = trajectory_to_dict(coeffs, [1.0], [1])
        c2, dT2, sg2, _ = trajectory_from_dict(d)
        st = minco.eval_segment_states(jnp.asarray(c2[0]),
                                       jnp.asarray(dT2[0]), 1, 2.85,
                                       jnp.asarray([0.5]))
        assert float(st["vel"][0]) == pytest.approx(1.0, abs=1e-6)


class TestExecCache:
    def test_keys_and_save(self, tmp_path, monkeypatch):
        """utils/exec_cache: blobs are written per key; key parts (which
        carry EngineFlags since round 5 — the key no longer scrapes
        os.environ) change the key; the kill switch bypasses the cache.
        (The LOAD path is single-device only — a deserialized executable
        re-targets all local devices, which the 8-virtual-CPU suite mesh
        cannot satisfy; the real load/run roundtrip is exercised on the
        TPU by solver.make_solver(engine='fused') + test_fused_hw.)"""
        import jax
        import jax.numpy as jnp

        from dftpav_tpu.utils import exec_cache

        def f(x):
            return (x * 2.0 + 1.0).sum(axis=-1)

        x = jnp.arange(12.0).reshape(3, 4)
        jitted = jax.jit(f)
        c1 = exec_cache.load_or_compile(jitted, (x,), key_parts="a",
                                        cache_dir=str(tmp_path))
        out1 = np.asarray(c1(x))
        np.testing.assert_allclose(out1, np.asarray(f(x)))
        assert len(list(tmp_path.glob("*.pkl"))) == 1
        # same key -> no new entry
        exec_cache.load_or_compile(jitted, (x,), key_parts="a",
                                   cache_dir=str(tmp_path))
        assert len(list(tmp_path.glob("*.pkl"))) == 1
        # different key parts -> different entry
        exec_cache.load_or_compile(jitted, (x,), key_parts="b",
                                   cache_dir=str(tmp_path))
        assert len(list(tmp_path.glob("*.pkl"))) == 2
        # EngineFlags in key_parts fold into the key (the env-knob era's
        # os.environ scraping is gone: library code reads no env vars)
        from dftpav_tpu.config import EngineFlags
        k_def = exec_cache.cache_key(("fused", EngineFlags()))
        k_tuned = exec_cache.cache_key(("fused", EngineFlags.tuned()))
        assert k_def != k_tuned
        monkeypatch.setenv("DFTPAV_SOME_KNOB", "1")
        assert exec_cache.cache_key(("fused", EngineFlags())) == k_def
        exec_cache.load_or_compile(jitted, (x,),
                                   key_parts=("fused", EngineFlags()),
                                   cache_dir=str(tmp_path))
        assert len(list(tmp_path.glob("*.pkl"))) == 3
        # kill switch bypasses both read and write
        monkeypatch.setenv("DFTPAV_EXEC_CACHE", "0")
        c4 = exec_cache.load_or_compile(jitted, (x,), key_parts="zz",
                                        cache_dir=str(tmp_path))
        np.testing.assert_allclose(np.asarray(c4(x)), out1)
        assert len(list(tmp_path.glob("*.pkl"))) == 3

    def test_load_roundtrip_single_device(self, tmp_path):
        """On a single-device backend the second call LOADS the serialized
        executable and runs it (skipped on the multi-device suite mesh)."""
        import jax
        import jax.numpy as jnp

        from dftpav_tpu.utils import exec_cache

        if len(jax.devices()) != 1:
            pytest.skip("load path is single-device only")

        def f(x):
            return x * 3.0

        x = jnp.arange(6.0)
        jitted = jax.jit(f)
        c1 = exec_cache.load_or_compile(jitted, (x,), key_parts="r",
                                        cache_dir=str(tmp_path))
        c2 = exec_cache.load_or_compile(jitted, (x,), key_parts="r",
                                        cache_dir=str(tmp_path))
        np.testing.assert_allclose(np.asarray(c2(x)), np.asarray(c1(x)))
