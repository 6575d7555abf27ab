"""Diagnose why the persistent XLA cache never hits across driver sessions.

Round-4 postmortem: .xla_cache holds FIVE distinct jit_batched-* entries
(same function, same shapes, Aug 20 11:50/13:17/13:42/19:45/23:39) — the
cache key is unstable across relay claims.  This probe:
  1. jits a distinctive function and reports whether the persistent cache
     hit (with jax_explain_cache_misses on, stderr says why not);
  2. prints the backend fingerprint components that enter the cache key
     (platform_version etc.) so successive sessions can be diffed;
  3. round-trips jax.experimental.serialize_executable to test the AOT
     escape hatch (compile once, commit the executable, skip compile).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dojo_tpu.cachedir import enable_compile_cache, repo_cache_dir

jax.config.update("jax_explain_cache_misses", True)
enable_compile_cache(min_compile_secs=0.0)


def main():
    dev = jax.devices()[0]
    client = dev.client
    print("platform:", dev.platform)
    print("device_kind:", getattr(dev, "device_kind", "?"))
    print("platform_version:", client.platform_version)
    print("runtime_type:", getattr(client, "runtime_type", "?"))
    print("jax:", jax.__version__)
    try:
        print("device coords:", getattr(dev, "coords", None),
              "core:", getattr(dev, "core_on_chip", None),
              "id:", dev.id, "process:", dev.process_index)
    except Exception as e:
        print("coords err:", e)

    cache = repo_cache_dir()
    n0 = len(os.listdir(cache))

    @jax.jit
    def probe_fn(x):
        # distinctive body so the key is ours alone
        return jnp.tanh(x @ x.T) * 1.234567 + jnp.sin(x).sum()

    x = jnp.ones((64, 64), jnp.float32)
    t0 = time.perf_counter()
    probe_fn(x).block_until_ready()
    t1 = time.perf_counter() - t0
    n1 = len(os.listdir(cache))
    print(f"probe compile: {t1:.2f}s, cache entries {n0} -> {n1} "
          f"({'MISS (new entry written)' if n1 > n0 else 'HIT'})")
    new = sorted(
        os.listdir(cache), key=lambda f: os.path.getmtime(os.path.join(cache, f))
    )[-1]
    print("newest entry:", new)

    # AOT serialize round-trip
    try:
        from jax.experimental import serialize_executable as se

        lowered = jax.jit(probe_fn).lower(x)
        compiled = lowered.compile()
        payload, in_tree, out_tree = se.serialize(compiled)
        print("serialized executable bytes:", len(payload))
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
        y = loaded(x)
        print("AOT round-trip ok:", bool(jnp.isfinite(y).all()))
    except Exception as e:
        print("serialize_executable FAILED:", repr(e))


if __name__ == "__main__":
    main()
