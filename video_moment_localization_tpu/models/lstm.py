"""Masked multi-layer bidirectional LSTM via `jax.lax.scan`.

XLA-native replacement for the reference's cuDNN LSTM + pack/pad ragged
handling (reference models.py:46,52-54). Ragged sequences are handled by a
mask-carried state instead of packing:

* forward direction: the (h, c) carry only advances where the step is valid,
  and outputs at padded steps are zeroed — identical to packed semantics for
  right-padded sequences;
* backward direction: the scan runs over reversed time; since padding sits at
  the end of each sequence, the zero-initialized carry simply stays zero
  until the first valid (i.e. last real) step, exactly reproducing
  `pack_padded_sequence`'s per-sample start at t = len-1.

Parameter layout matches PyTorch bit-for-bit for weight porting: per
layer/direction `w_ih (4H, in)`, `w_hh (4H, H)`, `b_ih (4H,)`, `b_hh (4H,)`
with gate order (input, forget, cell, output).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_bilstm_params(
    key: jax.Array, input_size: int, hidden_size: int, num_layers: int
) -> List[Dict[str, Any]]:
    """Torch-default init: every tensor ~ U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    layers = []
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else 2 * hidden_size
        directions = {}
        for direction in ("fwd", "bwd"):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            directions[direction] = {
                "w_ih": _uniform(k1, (4 * hidden_size, in_dim), bound),
                "w_hh": _uniform(k2, (4 * hidden_size, hidden_size), bound),
                "b_ih": _uniform(k3, (4 * hidden_size,), bound),
                "b_hh": _uniform(k4, (4 * hidden_size,), bound),
            }
        layers.append(directions)
    return layers


def _lstm_scan(x: jnp.ndarray, mask: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    """One direction over (B, S, in) with validity mask (B, S) -> (B, S, H)."""
    B = x.shape[0]
    H = p["w_hh"].shape[1]
    dtype = x.dtype
    w_ih_t = p["w_ih"].T.astype(dtype)  # (in, 4H)
    w_hh_t = p["w_hh"].T.astype(dtype)  # (H, 4H)
    bias = (p["b_ih"] + p["b_hh"]).astype(dtype)

    # Precompute the input projection for all steps in one big matmul (MXU),
    # leaving only the small recurrent matmul inside the scan.
    x_proj = x @ w_ih_t + bias                              # (B, S, 4H)

    def step(carry, inp):
        h, c = carry
        xp_t, m_t = inp                                      # (B, 4H), (B, 1)
        gates = xp_t + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)            # torch gate order
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h = m_t * h_new + (1.0 - m_t) * h
        c = m_t * c_new + (1.0 - m_t) * c
        return (h, c), h * m_t

    init = (jnp.zeros((B, H), dtype), jnp.zeros((B, H), dtype))
    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask[..., None].astype(dtype), 0, 1))
    _, ys = jax.lax.scan(step, init, xs)
    return jnp.swapaxes(ys, 0, 1)                            # (B, S, H)


def bilstm(
    x: jnp.ndarray, mask: jnp.ndarray, layers: List[Dict[str, Any]]
) -> jnp.ndarray:
    """Multi-layer biLSTM: (B, S, in), mask (B, S) -> (B, S, 2H).

    Negative result (measured, round 3): batching the two directions into
    ONE (2B, S) scan — halving the sequential step count, bit-identical
    outputs — is ~1.45x SLOWER on chip (11.4 vs 7.9 ms at B=6144 serving,
    scripts/bench_ablate.py --variants lstm): the per-step h[:B]/h[B:]
    slice + concat around the two recurrent matmuls costs more than the
    halved step count saves. Two short scans stay."""
    h = x
    for p in layers:
        fwd = _lstm_scan(h, mask, p["fwd"])
        bwd = jnp.flip(_lstm_scan(jnp.flip(h, 1), jnp.flip(mask, 1), p["bwd"]), 1)
        h = jnp.concatenate([fwd, bwd], axis=-1)
    return h
