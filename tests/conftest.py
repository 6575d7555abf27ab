"""Test configuration: 8 virtual CPU devices + float64, without the TPU relay.

This box routes XLA compilation through a remote-compile relay (axon
sitecustomize) even for CPU targets, which turns second-long CPU compiles
into multi-minute waits.  The test suite is CPU-only by design, so we
re-exec pytest once with the sitecustomize stripped, 8 virtual CPU devices
(multi-chip sharding paths validated without TPU hardware) and float64
enabled (physics invariants at reference tolerances; the reference engine
is Float64 CPU).  TPU production runs use float32.
"""

import os
import stat
import sys


def _restore_real_stdout():
    """Point fds 1/2 back at the invoker's stream before re-exec.

    By conftest-import time pytest's global capture has replaced fd 1/2 with
    temp files; the re-exec'd pytest would write its report into them and the
    output would vanish.  Pytest keeps dup'ed saves of the original fds —
    find the first non-regular-file fd and restore it.
    """
    try:
        if not stat.S_ISREG(os.fstat(1).st_mode):
            return  # capture not active (e.g. pytest -s)
    except OSError:
        return
    for fd in range(3, 64):
        try:
            st = os.fstat(fd)
        except OSError:
            continue
        if not (stat.S_ISFIFO(st.st_mode) or stat.S_ISCHR(st.st_mode)):
            continue
        try:
            if os.readlink(f"/proc/self/fd/{fd}") == "/dev/null":
                continue  # pytest's saved stdin dup
        except OSError:
            pass
        os.dup2(fd, 1)
        os.dup2(fd, 2)
        return


if "axon" in os.environ.get("PYTHONPATH", "") and not os.environ.get(
    "DOJO_TPU_TESTS_REEXEC"
):
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    env["DOJO_TPU_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    _restore_real_stdout()
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/dojo_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
