"""Cross-process compiled-executable cache (VERDICT r4 item 7).

The JAX persistent compilation cache never hits for Mosaic-containing
programs on the tunneled-TPU environments this project runs in
(BASELINE.md r3/r4 notes) — every process pays a 20-300 s remote
compile for the SAME render program. `jax.experimental.
serialize_executable` does round-trip on this runtime (measured:
deserialize 0.1 s + first dispatch ~0 s vs 4.5-80 s fresh compile,
tools/aot_probe.py), so this module caches serialized executables on
disk, keyed by a hash of the LOWERED program text plus the JAX version
and device kind — same key ⇒ byte-identical program, so staleness is
impossible by construction (any code/config/shape change changes the
lowered text).

Failures at any stage (serialization unsupported, corrupt file, version
skew) fall back silently to a normal compile. Disable with
RRT_AOT_CACHE=0.
"""
from __future__ import annotations

import hashlib
import os
import pickle


def enabled() -> bool:
    return os.environ.get("RRT_AOT_CACHE", "1") != "0"


def cache_dir() -> str:
    return os.environ.get("RRT_JAX_CACHE", "/root/.cache/rrt_jax")


def compile_cached(jit_fn, args, tag: str = "pass"):
    """`jit_fn.lower(*args).compile()` with a disk round-trip.

    Returns a compiled executable callable with the same tree signature
    as the jitted function (donation included — it is part of the
    lowering). Returns None if lowering itself fails (caller should use
    the plain jitted function)."""
    import jax

    lowered = jit_fn.lower(*args)
    if not enabled():
        return lowered.compile()
    try:
        txt = lowered.as_text()
        dev = jax.devices()[0]
        key = hashlib.sha256(
            (jax.__version__ + "|" + dev.device_kind + "|"
             + dev.platform).encode() + txt.encode()).hexdigest()[:32]
        path = os.path.join(cache_dir(), f"aot_{tag}_{key}.bin")
    except Exception:  # noqa: BLE001 — hashing trouble: just compile
        return lowered.compile()

    from jax.experimental import serialize_executable as se
    ot = lowered.out_tree
    ot = ot() if callable(ot) else ot
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            return se.deserialize_and_load(payload, lowered.in_tree, ot)
        except Exception:  # noqa: BLE001 — corrupt/stale: recompile
            try:
                os.remove(path)
            except OSError:
                pass
    compiled = lowered.compile()
    try:
        payload, _, _ = se.serialize(compiled)
        os.makedirs(cache_dir(), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
    except Exception:  # noqa: BLE001 — serialization unsupported: skip
        pass
    return compiled
