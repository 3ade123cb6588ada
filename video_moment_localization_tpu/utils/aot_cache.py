"""Persisted-executable (AOT) cache for the bench's jitted programs.

Round-4 postmortem (VERDICT r4 items 1-2): the driver bench was killed
twice (r02, r04) by cold-compile variance — the axon remote compile
service ranges from ~100 s to *minutes per program, any program* on slow
days (measured 2026-08-20: a 512x512 matmul-sum took 292 s to come back;
the r4 fused serving chain hadn't compiled at 940+ s vs 368 s in r3).
The persistent XLA *compilation cache* cannot help: the tunnel session
salts its keys, so it never hits across processes (docs/ARCHITECTURE.md
"axon quirks").

``jax.experimental.serialize_executable`` bypasses the compile service
entirely: it serializes the *compiled TPU executable*, and
``deserialize_and_load`` returns a runnable in ~0.1 s with no compile
dispatched (measured round-trip, including cross-process: a payload
written by one process loads and runs bit-identically in a fresh one).
This module wraps it as a keyed on-disk cache:

* ``get_or_compile(name, fn, args)`` — deserialize ``bench_cache/<name>``
  if present and fingerprint-compatible, else ``jit(fn).lower(args)
  .compile()``, persist, and return the compiled callable either way.
* The fingerprint pins jax/jaxlib versions, device kind, platform and
  device count — any mismatch is a silent miss (recompile + overwrite),
  never an error. Deserialization failures likewise degrade to compile.
* Payloads are written atomically (tmp + rename) so a killed bench never
  leaves a truncated cache entry for the next run to trip on.

The cache directory defaults to ``<repo>/bench_cache`` (override:
``VML_AOT_CACHE``); entries are committed to the repo so the driver's
end-of-round bench — a fresh process in a fresh tunnel session — hits
warm executables and measures in seconds instead of re-paying the
compile-service lottery. Disable with ``VML_AOT_CACHE=off``.
"""

from __future__ import annotations

import os
import pickle
import tempfile
import zlib
from typing import Any, Callable


def _cache_dir() -> str | None:
    env = os.environ.get("VML_AOT_CACHE")
    if env == "off":
        return None
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "bench_cache")


_code_hash_cache: list = []


def code_hash() -> str:
    """Hash of every compute-path source file that can shape a compiled
    program. A serialized executable is a *frozen build* of this code: if
    the fingerprint did not pin it, editing a kernel would silently keep
    benchmarking the old binary. Any source change invalidates the cache
    (one cold rebuild re-persists current code)."""
    if _code_hash_cache:
        return _code_hash_cache[0]
    import hashlib

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    files = []
    for sub in ("models", "ops", "train", "parallel"):
        d = os.path.join(pkg, sub)
        files += [os.path.join(d, f) for f in sorted(os.listdir(d))
                  if f.endswith(".py")]
    files.append(os.path.join(pkg, "config.py"))
    for path in files:
        h.update(path.split(os.sep)[-1].encode())
        with open(path, "rb") as f:
            h.update(f.read())
    _code_hash_cache.append(h.hexdigest()[:16])
    return _code_hash_cache[0]


def fingerprint() -> dict:
    """Environment identity a serialized executable is only valid under."""
    import jax
    import jaxlib

    dev = jax.devices()[0]
    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "num_devices": jax.device_count(),
        "code": code_hash(),
    }


def _path(name: str) -> str | None:
    d = _cache_dir()
    return None if d is None else os.path.join(d, f"{name}.aot")


def load(name: str) -> Callable | None:
    """Load a persisted executable, or None on any miss/mismatch/error."""
    path = _path(name)
    if path is None or not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            raw = f.read()
        # Entries are zlib-compressed pickles (executables compress ~3-5x,
        # and they live in git); accept uncompressed for forward-compat.
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            pass
        entry = pickle.loads(raw)
        if entry.get("fingerprint") != fingerprint():
            return None
        return se.deserialize_and_load(entry["payload"], entry["in_tree"],
                                       entry["out_tree"])
    except Exception:  # noqa: BLE001 - cache misses must never be fatal
        return None


def save(name: str, compiled: Any) -> bool:
    """Persist a jax.stages.Compiled; returns False on any failure."""
    path = _path(name)
    if path is None:
        return False
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        entry = {"fingerprint": fingerprint(), "payload": payload,
                 "in_tree": in_tree, "out_tree": out_tree}
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                                   prefix=f".{name}.", suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(zlib.compress(
                pickle.dumps(entry, protocol=pickle.HIGHEST_PROTOCOL), 6))
        os.replace(tmp, path)
        return True
    except Exception:  # noqa: BLE001
        try:
            os.unlink(tmp)  # type: ignore[possibly-undefined]
        except Exception:  # noqa: BLE001
            pass
        return False


def get_or_compile(name: str, fn: Callable, args: tuple,
                   log: Callable[[str], None] | None = None) -> Callable:
    """Cached-compile ``fn`` at ``args``: deserialize if possible, else
    ``jit(fn).lower(*args).compile()`` and persist.

    ``fn`` may already be a jitted callable (jax.jit output) — ``.lower``
    exists on both. The returned callable takes positional args only,
    shapes/dtypes fixed at ``args``.

    A deserialized executable can be loadable but broken at *call* time
    (e.g. XLA:CPU AOT machine-feature mismatch raises on execution), so a
    cache hit is returned behind a first-call guard: if its first
    invocation raises, the entry is recompiled from source, re-persisted,
    and the call retried — the cache can delay a caller once, never fail
    it."""
    import jax

    def _compile() -> Any:
        if log:
            log(f"aot_cache: '{name}' cold — compiling")
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        compiled = jitted.lower(*args).compile()
        if save(name, compiled) and log:
            log(f"aot_cache: '{name}' persisted")
        return compiled

    cached = load(name)
    if cached is None:
        return _compile()
    if log:
        log(f"aot_cache: '{name}' loaded from cache")
    state = {"fn": cached, "validated": False}

    def call(*call_args):
        if state["validated"]:
            return state["fn"](*call_args)
        try:
            out = state["fn"](*call_args)
        except Exception:  # noqa: BLE001 - stale/incompatible entry
            if log:
                log(f"aot_cache: '{name}' cached executable failed on "
                    f"first call — recompiling")
            state["fn"] = _compile()
            out = state["fn"](*call_args)
        state["validated"] = True
        return out

    return call
