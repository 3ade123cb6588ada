"""Device-derived kernel budgets + compile-failure fallback (ops/limits.py).

Round-3 review item 4: gates must derive from the device (not this-chip
magic numbers) and a Mosaic compile failure must route to the XLA path.
These tests force artificially small budgets via the env override and
observe clean gate rejection, and drive the fallback wrapper through a
simulated Mosaic failure.
"""

import numpy as np
import pytest

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.ops import limits, smin_pallas, smin_train_pallas
from video_moment_localization_tpu.ops import content_pallas, content_train_pallas


CHARADES = ModelConfig(compute_dtype="bfloat16")
ANET = ModelConfig(T=128, L=64, max_query_length=20, input_video_dim=500,
                   compute_dtype="bfloat16")


def test_budgets_reproduce_v5e_constants(monkeypatch):
    """On the 128 MiB-VMEM class (v5e and the CPU test default standing in
    for it) the derived budgets equal the measured round-3 constants."""
    monkeypatch.delenv("VML_VMEM_BYTES", raising=False)
    assert limits.device_vmem_bytes() == 128 * 1024 * 1024
    assert limits.kernel_vmem_limit() == 100 * 1024 * 1024
    assert limits.serving_budget() == 80_000_000
    assert limits.train_budget() == 90_000_000


def test_low_vmem_device_rejects_fused_configs(monkeypatch):
    """A 16 MiB part (TPU v2/v3 class) must reject every flagship fused
    config up front instead of over-admitting and crashing in Mosaic."""
    monkeypatch.setenv("VML_VMEM_BYTES", str(16 * 1024 * 1024))
    assert not smin_pallas.supports(CHARADES)
    assert not smin_pallas.supports(16, 4, 512)
    assert not smin_train_pallas.supports_train(CHARADES)
    monkeypatch.delenv("VML_VMEM_BYTES")
    assert smin_pallas.supports(CHARADES)
    assert smin_train_pallas.supports_train(CHARADES)


def test_vmem_override_scales_bb(monkeypatch):
    """_pick_bb admission scales with the device budget: a halved VMEM
    halves the biggest admitted cell."""
    bb_full = smin_pallas._pick_bb(64, 16, 4, 512)
    monkeypatch.setenv("VML_VMEM_BYTES", str(34 * 1024 * 1024))
    bb_small = smin_pallas._pick_bb(64, 16, 4, 512)
    assert bb_small < bb_full
    assert bb_small >= 1


def test_row_cap_override(monkeypatch):
    monkeypatch.setenv("VML_MAX_CELL_ROWS", "500")
    assert not smin_pallas.supports(16, 4, 512)   # Charades NC=544 > 500
    monkeypatch.delenv("VML_MAX_CELL_ROWS")
    assert smin_pallas.supports(16, 4, 512)


def test_registry_disables_every_gate():
    for name, check in [
        ("smin_pallas", lambda: smin_pallas.supports(CHARADES)),
        ("smin_train_pallas",
         lambda: smin_train_pallas.supports_train(CHARADES)),
        ("content_train_pallas", lambda: content_train_pallas.supports(ANET)),
        ("content_pallas", lambda: content_pallas.supports(16, 4)),
    ]:
        assert check(), name
        limits.disable_kernel(name, "test")
        try:
            assert not check(), name
        finally:
            limits.enable_kernel(name)
        assert check(), name


def test_is_compile_error_classification():
    assert limits.is_compile_error(
        RuntimeError("INTERNAL: Mosaic failed to compile TPU kernel: foo"))
    assert limits.is_compile_error(
        Exception("RESOURCE_EXHAUSTED: XLA compilation ran out of memory"))
    assert limits.is_compile_error(
        NotImplementedError("no lowering rule for reduce_precision"))
    assert not limits.is_compile_error(ValueError("nan loss detected"))
    assert not limits.is_compile_error(KeyError("video_features"))
    # Runtime HBM OOMs must propagate (round-4 review): retrying would
    # re-call with donated/deleted arrays and wrongly disable kernels.
    assert not limits.is_compile_error(Exception(
        "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
        "17301504000 bytes."))
    assert not limits.is_compile_error(Exception(
        "RESOURCE_EXHAUSTED: Error allocating device buffer: Attempting "
        "to allocate 16.50G. That was not possible. There are 2.1G free."))


def test_fallback_skips_retry_on_deleted_donated_args():
    """A compile-classified error after donated inputs were consumed must
    propagate unchanged instead of retrying with deleted arrays."""

    class FakeArray:
        def is_deleted(self):
            return True

    def build():
        def fn(x):
            raise RuntimeError(
                "INTERNAL: Mosaic failed to compile TPU kernel: stack")
        return fn

    try:
        wrapped = limits.with_kernel_fallback(build, ("smin_pallas",))
        with pytest.raises(RuntimeError, match="Mosaic failed"):
            wrapped(FakeArray())
        assert not limits.kernel_disabled("smin_pallas")
    finally:
        limits.enable_kernel("smin_pallas")


def test_fallback_wrapper_reroutes_once():
    """Simulated Mosaic failure: the wrapper disables the kernel, rebuilds,
    and the rebuilt callable (which consults the registry) succeeds."""
    calls = []

    def build():
        fused = not limits.kernel_disabled("smin_pallas")
        mode = "fused" if fused else "xla"

        def fn(x):
            calls.append(mode)
            if fused:
                raise RuntimeError(
                    "INTERNAL: Mosaic failed to compile TPU kernel: stack")
            return x + 1

        return fn

    try:
        wrapped = limits.with_kernel_fallback(build, ("smin_pallas",),
                                              label="test")
        with pytest.warns(RuntimeWarning, match="smin_pallas"):
            assert wrapped(41) == 42
        assert calls == ["fused", "xla"]
        assert "smin_pallas" in limits.disabled_kernels()
        # Subsequent calls go straight to the rebuilt callable.
        assert wrapped(1) == 2
        assert calls == ["fused", "xla", "xla"]
    finally:
        limits.enable_kernel("smin_pallas")


def test_fallback_propagates_real_errors():
    def build():
        def fn(x):
            raise ValueError("bad batch")

        return fn

    wrapped = limits.with_kernel_fallback(build, ("smin_pallas",))
    with pytest.raises(ValueError, match="bad batch"):
        wrapped(0)
    assert "smin_pallas" not in limits.disabled_kernels()


def test_fallback_gives_up_when_xla_path_fails():
    """A compile error with every listed kernel already disabled must
    propagate (the XLA path itself failed — nothing left to fall to)."""
    limits.disable_kernel("smin_pallas", "test")
    try:
        def build():
            def fn(x):
                raise RuntimeError("Mosaic failed to compile TPU kernel")

            return fn

        wrapped = limits.with_kernel_fallback(build, ("smin_pallas",))
        with pytest.raises(RuntimeError, match="Mosaic"):
            wrapped(0)
    finally:
        limits.enable_kernel("smin_pallas")


def test_eval_step_runs_with_kernels_force_disabled(monkeypatch):
    """End-to-end sanity: with every fused kernel disabled in the registry
    the eval step still produces metrics (the XLA route)."""
    import jax

    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.parallel.steps import make_eval_step

    cfg = ModelConfig(T=8, L=4, C=2, D=32, dl=16, num_smi_layers=1,
                      input_video_dim=12, max_query_length=5,
                      lstm_hidden_size=16, word_dim=20)
    for k in ("smin_pallas", "content_pallas", "proposal_pallas",
              "lstm_pallas"):
        limits.disable_kernel(k, "test")
    try:
        params = init_smin_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        B, N = 2, cfg.L * (cfg.L + 1) // 2
        batch = {
            "video_features": rng.standard_normal((B, 8, 12)).astype(np.float32),
            "video_mask": np.ones((B, 8, 1), np.float32),
            "query_features": rng.standard_normal((B, 5, 20)).astype(np.float32),
            "query_mask": np.ones((B, 5, 1), np.float32),
            "length_mask": np.ones((B, 4), np.float32),
            "sm": rng.uniform(size=(B, N)).astype(np.float32),
            "ym": np.zeros((B, N), np.float32),
            "ss": np.ones((B, 4), np.float32) * 0.6,
            "ys": np.ones((B, 4), np.float32),
            "se": np.ones((B, 4), np.float32) * 0.6,
            "ye": np.ones((B, 4), np.float32),
            "ya": np.ones((B, 4), np.float32),
            "sample_mask": np.ones((B,), np.float32),
        }
        out = make_eval_step(cfg)(params, batch)
        assert np.isfinite(float(out["loss"]))
    finally:
        for k in ("smin_pallas", "content_pallas", "proposal_pallas",
                  "lstm_pallas"):
            limits.enable_kernel(k)
