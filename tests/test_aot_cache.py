"""Tests for the persisted-executable cache (utils/aot_cache.py).

The bench's compile-lottery fix (VERDICT r4 items 1-2) rests on this
module: these tests pin its contract on the CPU backend — cache miss
compiles + persists, cache hit returns a runnable with identical
numerics, fingerprint/corruption mismatches degrade to a silent
recompile, and the ``off`` switch disables persistence.
"""

from __future__ import annotations

import os
import pickle
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_moment_localization_tpu.utils import aot_cache


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "aot"
    monkeypatch.setenv("VML_AOT_CACHE", str(d))
    return d


def _fn(x, y):
    return {"s": (x @ y).sum(), "m": x * 2.0}


def _args():
    return (jnp.arange(12.0).reshape(3, 4), jnp.ones((4, 2)))


def test_miss_compiles_persists_and_hits(cache_dir):
    args = _args()
    logs = []
    c1 = aot_cache.get_or_compile("prog", _fn, args, log=logs.append)
    out1 = c1(*args)
    assert any("cold" in ln for ln in logs)
    # CPU PjRt may not support executable serialization in every jaxlib;
    # persistence then silently degrades (save() False) — the contract is
    # "never fatal", and the hit path is only testable when it persisted.
    if not (cache_dir / "prog.aot").exists():
        pytest.skip("executable serialization unsupported on this backend")
    logs.clear()
    c2 = aot_cache.get_or_compile("prog", _fn, args, log=logs.append)
    out2 = c2(*args)
    assert any("loaded from cache" in ln for ln in logs)
    np.testing.assert_array_equal(np.asarray(out1["s"]), np.asarray(out2["s"]))
    np.testing.assert_array_equal(np.asarray(out1["m"]), np.asarray(out2["m"]))


def test_fingerprint_mismatch_is_a_miss(cache_dir):
    args = _args()
    aot_cache.get_or_compile("prog", _fn, args)
    path = cache_dir / "prog.aot"
    if not path.exists():
        pytest.skip("executable serialization unsupported on this backend")
    with open(path, "rb") as f:
        entry = pickle.loads(zlib.decompress(f.read()))
    entry["fingerprint"]["jaxlib"] = "0.0.0"
    with open(path, "wb") as f:
        f.write(pickle.dumps(entry))  # uncompressed entries also accepted
    assert aot_cache.load("prog") is None  # silent miss, not an error


def test_code_change_is_a_miss(cache_dir, monkeypatch):
    """A persisted executable is a frozen build of the compute-path
    sources; any edit to them must invalidate it (else a kernel change
    would silently keep benchmarking the old binary)."""
    args = _args()
    aot_cache.get_or_compile("prog", _fn, args)
    if not (cache_dir / "prog.aot").exists():
        pytest.skip("executable serialization unsupported on this backend")
    assert aot_cache.load("prog") is not None
    monkeypatch.setattr(aot_cache, "_code_hash_cache", ["deadbeef"])
    assert aot_cache.load("prog") is None  # silent miss, recompile path


def test_corrupt_payload_is_a_miss(cache_dir):
    os.makedirs(cache_dir, exist_ok=True)
    with open(cache_dir / "bad.aot", "wb") as f:
        f.write(b"not a pickle")
    assert aot_cache.load("bad") is None


def test_off_switch_disables_persistence(tmp_path, monkeypatch):
    monkeypatch.setenv("VML_AOT_CACHE", "off")
    args = _args()
    compiled = aot_cache.get_or_compile("prog", _fn, args)
    out = compiled(*args)
    assert np.isfinite(np.asarray(out["s"]))
    assert aot_cache.load("prog") is None
    assert aot_cache.save("prog", None) is False


def test_prejitted_callable_accepted(cache_dir):
    args = _args()
    compiled = aot_cache.get_or_compile("jitted", jax.jit(_fn), args)
    out = compiled(*args)
    assert np.asarray(out["s"]).shape == ()


def test_bench_rehearsal_redirects_cache_off_repo(monkeypatch, tmp_path):
    """A non-TPU bench rehearsal must never write into the committed
    bench_cache/ — entries are keyed by name, so a CPU-compiled entry
    would clobber the TPU binary the driver's bench depends on (this
    happened once: a CPU rehearsal overwrote two committed executables,
    forcing the real run cold until restored)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    repo_default = aot_cache._cache_dir.__wrapped__() if hasattr(
        aot_cache._cache_dir, "__wrapped__") else None

    # Default: redirect to a platform-specific scratch dir, not the repo.
    monkeypatch.delenv("VML_AOT_CACHE", raising=False)
    bench._redirect_rehearsal_cache("cpu")
    redirected = aot_cache._cache_dir()
    assert redirected == os.environ["VML_AOT_CACHE"]
    assert "bench_cache" not in redirected
    if repo_default:
        assert redirected != repo_default

    # An explicit override (e.g. 'off') is respected.
    monkeypatch.setenv("VML_AOT_CACHE", str(tmp_path / "explicit"))
    bench._redirect_rehearsal_cache("cpu")
    assert aot_cache._cache_dir() == str(tmp_path / "explicit")
