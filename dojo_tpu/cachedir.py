"""Persistent XLA compile-cache location.

Round-3 lesson: /tmp is wiped between driver sessions, so caches that live
there (and the 10-30 min cold compiles they amortize) vanish before the
driver's end-of-round bench run.  Keep the caches inside the repo tree
(gitignored) instead — the repo directory persists across sessions.

Separate suffixes stay load-bearing (BASELINE.md round-3 notes): the relay
AOT-compiles CPU executables for ITS machine (avx512+amx); loading those
into a local CPU process can SIGILL, so TPU/relay runs, local CPU test
runs, and the multichip dryrun each get their own directory.
"""

import os


def repo_cache_dir(suffix=""):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, ".xla_cache" + (("_" + suffix) if suffix else ""))
    os.makedirs(path, exist_ok=True)
    return path


def enable_compile_cache(suffix="", min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at the repo-local dir.

    Respects an explicit JAX_COMPILATION_CACHE_DIR env override.
    """
    import jax

    try:
        if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            jax.config.update("jax_compilation_cache_dir", repo_cache_dir(suffix))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
