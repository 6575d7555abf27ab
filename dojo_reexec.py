"""pytest -p plugin: re-exec the test run without the TPU remote-compile relay.

This host's axon sitecustomize (PYTHONPATH=/root/.axon_site) routes all XLA
compiles — including CPU — through a remote relay, turning second-long test
compiles into minutes.  Loaded via `addopts = -p dojo_reexec` (pytest.ini),
this module runs at plugin-import time, BEFORE pytest's capture replaces
stdout, so the re-exec'd run inherits the real stdout/stderr.
"""

import os
import sys


def _raise_stack_limit():
    """XLA:CPU has segfaulted mid-compile deep into a long suite run
    (LLVM recursion on big jacfwd modules); give the main thread an
    unbounded stack before the re-exec so growth never hits the 8 MB
    default."""
    try:
        import resource

        _, hard = resource.getrlimit(resource.RLIMIT_STACK)
        resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
    except Exception:
        pass


if "axon" in os.environ.get("PYTHONPATH", "") and not os.environ.get(
    "DOJO_TPU_TESTS_REEXEC"
):
    _raise_stack_limit()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    env["DOJO_TPU_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
