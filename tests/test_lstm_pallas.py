"""Parity of the fused 2-layer biLSTM kernel vs the XLA scan path.

Interpret mode on CPU: same masked-carry semantics, ragged masks, both
dtypes. The kernel computes gates in f32 even for bf16 activations (the
XLA path gates in bf16), so bf16 parity uses a bf16-scale tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_moment_localization_tpu.models.lstm import bilstm, init_bilstm_params
from video_moment_localization_tpu.ops import lstm_pallas


def _data(B=8, S=13, Din=36, H=128, seed=0, dtype=jnp.float32):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    layers = init_bilstm_params(k1, Din, H, 2)
    x = jax.random.normal(k2, (B, S, Din), jnp.float32).astype(dtype)
    lengths = jax.random.randint(k3, (B,), 1, S + 1)
    mask = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.float32)
    return x, mask, layers


def test_supports_gate():
    x, mask, layers = _data()
    assert lstm_pallas.supports(layers, 13, 8)
    # H not lane-aligned -> rejected.
    _, _, l96 = _data(H=96)
    assert not lstm_pallas.supports(l96, 13, 8)
    # single layer -> rejected.
    assert not lstm_pallas.supports(layers[:1], 13, 8)


def test_fp32_parity():
    x, mask, layers = _data()
    ref = bilstm(x, mask, layers)
    out = lstm_pallas.bilstm_fused(x, mask, layers, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_parity():
    x, mask, layers = _data(dtype=jnp.bfloat16)
    ref = np.asarray(bilstm(x, mask, layers)).astype(np.float32)
    out = np.asarray(
        lstm_pallas.bilstm_fused(x, mask, layers, interpret=True)
    ).astype(np.float32)
    # bf16 activations, f32 in-kernel gates vs bf16 XLA gates.
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_padded_steps_are_zero():
    x, mask, layers = _data(seed=3)
    out = np.asarray(lstm_pallas.bilstm_fused(x, mask, layers, interpret=True))
    m = np.asarray(mask)
    assert np.all(out[m == 0.0] == 0.0)


@pytest.mark.parametrize("B", [4, 6])
def test_odd_batches(B):
    # B=6 exercises the small-BB tail of the sweep (bb=2).
    x, mask, layers = _data(B=B, seed=7)
    ref = bilstm(x, mask, layers)
    out = lstm_pallas.bilstm_fused(x, mask, layers, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
