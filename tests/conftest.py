"""Test configuration: 8 virtual CPU devices + float64.

The relay bypass (re-exec without the axon sitecustomize) happens in the
dojo_reexec plugin (repo root, loaded via pytest.ini addopts) BEFORE pytest
capture starts.  Here we only configure JAX: 8 virtual CPU devices so
multi-chip sharding paths are validated without TPU hardware, float64 so
physics invariants are checked at reference tolerances (the reference
engine is Float64 CPU; TPU production runs use float32), and a persistent
compile cache (first-compile on this 1-core host is minutes).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
# NOTE: tests must NOT share a compile cache with relay/driver runs — the
# axon relay AOT-compiles CPU executables for ITS machine (avx512+amx);
# loading those here warns "could lead to execution errors such as SIGILL"
# and the full suite has segfaulted doing so.  Local-only cache:
from dojo_tpu.cachedir import repo_cache_dir
jax.config.update("jax_compilation_cache_dir", repo_cache_dir("local"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# XLA:CPU has crashed (SIGSEGV/SIGABRT, 4 distinct runs) compiling or
# deserializing an executable ~33 modules into a full-suite process, while
# every module passes in isolation and in sub-suite bisects — cumulative
# compiled-executable state in one process is the trigger.  Dropping the
# jit caches between test modules releases the executables; the persistent
# compile cache turns any re-trace into a cheap deserialize.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
