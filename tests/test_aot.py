"""AOT executable delivery (dojo_tpu/aot.py): serialize → blob → load →
execute round trip, metadata gating, and graceful fallbacks.

The real payloads (aot/steps_b256.xz etc.) are TPU executables serialized
on the relay — load_aot must SKIP them on this CPU host (device-kind gate)
rather than crash, and the save/load round trip is exercised with a local
CPU executable."""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import aot


def _tiny(x, y):
    return jnp.tanh(x @ y) + 1.0


def _run_single_device(body, tmp_path):
    """Run a snippet in a SINGLE-device CPU process: deserialize_and_load
    maps an executable across all local devices, so the round trip must be
    exercised without the suite's xla_force_host_platform_device_count=8
    (the production path is exactly one TPU chip)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    prelude = textwrap.dedent(
        f"""
        import jax, jax.numpy as jnp, numpy as np
        from dojo_tpu import aot
        aot.aot_dir = lambda: {str(tmp_path)!r}
        def _tiny(x, y):
            return jnp.tanh(x @ y) + 1.0
        """
    )
    return subprocess.run(
        [sys.executable, "-c", prelude + textwrap.dedent(body)],
        env=env, capture_output=True, text=True, timeout=600,
    )


def test_save_load_roundtrip(tmp_path):
    r = _run_single_device(
        """
        x = jnp.ones((8, 8), jnp.float32)
        y = jnp.eye(8, dtype=jnp.float32)
        compiled = jax.jit(_tiny).lower(x, y).compile()
        cfg = {"shape": 8, "v": 1}
        path = aot.save_aot("tiny", compiled, cfg, example_args=(x, y),
                            verbose=False)
        assert path is not None, "save failed"
        loaded = aot.load_aot("tiny", cfg, verbose=False)
        assert loaded is not None, "load failed"
        assert loaded.code_match
        xs, ys = jax.tree.map(jnp.asarray, loaded.example_args)
        np.testing.assert_allclose(
            np.asarray(loaded(xs, ys)), np.asarray(_tiny(x, y)), rtol=1e-6
        )
        print("ROUNDTRIP_OK")
        """,
        tmp_path,
    )
    if "serialization" in r.stderr and "ROUNDTRIP_OK" not in r.stdout:
        pytest.skip("backend does not support executable serialization")
    assert "ROUNDTRIP_OK" in r.stdout, r.stderr[-2000:]


def test_config_mismatch_returns_none(tmp_path):
    r = _run_single_device(
        """
        x = jnp.ones((4, 4), jnp.float32)
        compiled = jax.jit(_tiny).lower(x, x).compile()
        assert aot.save_aot("t2", compiled, {"v": 1}, verbose=False)
        assert aot.load_aot("t2", {"v": 2}, verbose=False) is None
        assert aot.load_aot("t2", {"v": 2}, verbose=False,
                            check_config=False) is not None
        print("CONFIG_OK")
        """,
        tmp_path,
    )
    assert "CONFIG_OK" in r.stdout, r.stderr[-2000:]


def test_missing_and_corrupt_blobs_return_none(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "aot_dir", lambda: str(tmp_path))
    assert aot.load_aot("nope", verbose=False) is None
    (tmp_path / "bad.xz").write_bytes(b"not a blob")
    assert aot.load_aot("bad", verbose=False) is None


def test_shipped_tpu_blobs_are_skipped_on_cpu():
    """The committed relay-TPU blobs must degrade to None (jit fallback) on
    this CPU host, not crash the bench."""
    import os

    names = [
        f[: -len(".xz")]
        for f in os.listdir(aot.aot_dir())
        if f.endswith(".xz")
    ]
    for name in names:
        got = aot.load_aot(name, verbose=False)
        # on a CPU host every shipped blob is a foreign-device executable
        if "cpu" in aot.device_kind():
            assert got is None, name
