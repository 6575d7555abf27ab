"""Ahead-of-time compiled-executable delivery.

Round 1-4 postmortem: the driver's end-of-round bench run NEVER hit the
persistent XLA compile cache the builder primed (BENCH_r03/r04 telemetry:
`cache_hit: false`, cold compile 189.4 s / 189.8 s byte-identical across
rounds), because the cache key is unstable across relay sessions —
`.xla_cache` holds five distinct entries for the SAME jit_batched function
compiled at different times of one day.  Cold MPC compile is ~2,480 s,
which can never fit the driver's bench budget, so the north-star metric
went unrecorded four rounds straight.

The fix: compile ONCE on the relay TPU, serialize the compiled executable
itself (`jax.experimental.serialize_executable` — the relay's PJRT
advertises `SerializedExecutable v9; compat c49`, a versioned compat
window), and COMMIT the blob to the repo under `aot/`.  The bench then
loads the executable in O(seconds), skipping HLO tracing, the cache-key
lottery, and XLA compilation entirely.  Every load is wrapped: any
mismatch (different device kind, incompatible server build, stale
signature) falls back to the normal jit path with the persistent cache.

Blobs are xz-compressed pickles of (payload, in_tree, out_tree, meta).
Pytree defs pickle by class reference, so load_aot imports dojo_tpu first
(registering the Params/BodyState/... pytree nodes).
"""

from __future__ import annotations

import hashlib
import lzma
import os
import pickle


def aot_dir():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "aot")
    os.makedirs(path, exist_ok=True)
    return path


def _path(name):
    return os.path.join(aot_dir(), name + ".xz")


def signature(obj) -> str:
    """Stable fingerprint of a config description (dict of shapes/flags)."""
    return hashlib.sha256(repr(obj).encode()).hexdigest()[:16]


def code_hash() -> str:
    """Content hash over the engine sources (dojo_tpu/**/*.py).  Stored in
    blob meta and REPORTED (not enforced) at load: a blob built from older
    sources still runs — the bench surfaces `aot_code_match: false` so a
    stale measurement is visible rather than silently swapped for a
    2,400 s cold compile."""
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(dirpath, f)
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def device_kind():
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


def save_aot(name: str, compiled, config=None, example_args=None,
             verbose=True, preset=3):
    """Serialize a jax compiled executable (result of .lower(...).compile())
    to aot/<name>.xz.  Returns the blob path, or None on failure.

    example_args: optional pytree of arrays — stored as numpy so the load
    path can reconstruct VALID inputs without building the model (the
    driver's bench then runs with zero tracing, zero compilation, and zero
    URDF/mechanism construction on its critical path)."""
    try:
        import jax
        import numpy as np

        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        args_np = (
            jax.tree.map(lambda a: np.asarray(a), example_args)
            if example_args is not None
            else None
        )
        blob = pickle.dumps(
            {
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "example_args": args_np,
                "meta": {
                    "device": device_kind(),
                    "config_sig": signature(config),
                    "config": repr(config),
                    "code_hash": code_hash(),
                },
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        comp = lzma.compress(blob, preset=preset)
        path = _path(name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(comp)
        os.replace(tmp, path)
        if verbose:
            print(
                f"aot: saved {name}: payload {len(payload)/1e6:.1f} MB, "
                f"blob {len(comp)/1e6:.1f} MB"
            )
        return path
    except Exception as e:  # noqa: BLE001 — never let AOT saving kill a run
        if verbose:
            print(f"aot: save {name} FAILED: {e!r}")
        return None


def update_example_args(name: str, fn, verbose=True, preset=3):
    """Rewrite the stored example_args of aot/<name>.xz in place:
    `fn(old_args) -> new_args` (numpy pytrees).  The serialized executable
    payload and meta are preserved — this is how tuned runtime data (gains,
    spring params) gets baked into the blob the driver's bench will run,
    WITHOUT a recompile.  New leaves must keep the compiled input shapes/
    dtypes; shape drift surfaces at the blob's first call, not here."""
    import numpy as np  # noqa: F401 — fn typically builds numpy leaves

    path = _path(name)
    with open(path, "rb") as f:
        blob = pickle.loads(lzma.decompress(f.read()))
    blob["example_args"] = fn(blob.get("example_args"))
    comp = lzma.compress(
        pickle.dumps(blob, protocol=pickle.HIGHEST_PROTOCOL), preset=preset
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(comp)
    os.replace(tmp, path)
    if verbose:
        print(f"aot: rewrote example_args of {name} ({len(comp)/1e6:.1f} MB)")
    return path


class LoadedAOT:
    """A deserialized executable + its stored example args + metadata."""

    def __init__(self, fn, example_args, meta):
        self.fn = fn
        self.example_args = example_args
        self.meta = meta
        self.code_match = meta.get("code_hash") == code_hash()

    def __call__(self, *args):
        return self.fn(*args)


def load_aot(name: str, config=None, verbose=True, check_config=True):
    """Load aot/<name>.xz → LoadedAOT, or None if missing/mismatched/
    incompatible.  Cheap to call; all failures degrade to None (jit
    fallback).  A code-hash mismatch does NOT block the load — it is
    surfaced via LoadedAOT.code_match for telemetry."""
    path = _path(name)
    if not os.path.exists(path):
        return None
    try:
        import jax  # noqa: F401 — ensure pytree registrations
        from jax.experimental import serialize_executable as se

        import dojo_tpu  # noqa: F401 — register custom pytree nodes

        with open(path, "rb") as f:
            blob = pickle.loads(lzma.decompress(f.read()))
        meta = blob.get("meta", {})
        if meta.get("device") != device_kind():
            if verbose:
                print(
                    f"aot: {name} skipped (built for {meta.get('device')}, "
                    f"running on {device_kind()})"
                )
            return None
        if (
            check_config
            and config is not None
            and meta.get("config_sig") != signature(config)
        ):
            if verbose:
                print(
                    f"aot: {name} skipped (config mismatch: "
                    f"saved {meta.get('config')!r})"
                )
            return None
        fn = se.deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"]
        )
        out = LoadedAOT(fn, blob.get("example_args"), meta)
        if verbose:
            print(
                f"aot: loaded {name}"
                + ("" if out.code_match else " (STALE: code changed since save)")
            )
        return out
    except Exception as e:  # noqa: BLE001 — any failure → jit fallback
        if verbose:
            print(f"aot: load {name} FAILED ({e!r}); falling back to jit")
        return None
