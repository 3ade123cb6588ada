"""SMIN (Structured Multi-level Interaction Network), TPU-native.

Pure-functional pytree modules: `init_smin_params(key, cfg)` builds the
parameter pytree, `smin_forward(params, cfg, batch...)` is a jit/pjit-able
function of (params, arrays). Semantics match the reference module-for-module
(citations per function); layout and execution are XLA-first:

* 1x1 convs are pointwise matmuls over the channel axis (MXU-friendly, no
  NCHW permutes);
* the proposal map comes from the fused prefix-sum/Pallas op
  (ops/proposal.py) instead of a dense einsum against Wc;
* all masking follows the reference's three distinct patterns exactly
  (pre-softmax -1e9 fill in boundary/word attention, post-softmax multiply
  in the intra-moment clip attention) — SURVEY.md "masking subtleties";
* activations can run in bfloat16 (cfg.compute_dtype) with fp32 parameters
  and fp32 scoring heads.

Parameter tree (torch-portable; see models/port.py):
  video_encoder: {ve: {w (dv,D), b}, pe (T,D)}
  query_encoder: [per layer {fwd|bwd: {w_ih, w_hh, b_ih, b_hh}}]
  smi: [per layer {content: {...}, boundary: {...}, moment: {...}}]
  localization: {pm|ps|pe|pa: {w (D,1), b (1,)}}
"""

from __future__ import annotations

import contextlib
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.models.lstm import bilstm, init_bilstm_params
from video_moment_localization_tpu.ops.proposal import proposal_features_auto

Params = Dict[str, Any]

_NEG_INF = -1e9


# --------------------------------------------------------------------- #
# Initialization (torch-default distributions for drop-in parity)
# --------------------------------------------------------------------- #
def _linear_init(key, in_dim: int, out_dim: int) -> Params:
    """W, b ~ U(-1/sqrt(in), 1/sqrt(in)) — torch Linear/1x1-conv default."""
    bound = 1.0 / math.sqrt(in_dim)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_dim,), jnp.float32, -bound, bound),
    }


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    dtype = x.dtype
    return x @ p["w"].astype(dtype) + p["b"].astype(dtype)


def init_smin_params(key: jax.Array, cfg: ModelConfig) -> Params:
    D, dl = cfg.D, cfg.dl
    keys = jax.random.split(key, 4 + cfg.num_smi_layers)

    video_encoder = {
        "ve": _linear_init(keys[0], cfg.input_video_dim, D),
        # Learned positional embedding, N(0,1) like torch nn.Embedding
        # (the reference deviates from the paper here too — models.py:29-31).
        "pe": jax.random.normal(keys[1], (cfg.T, D), jnp.float32),
    }
    query_encoder = init_bilstm_params(keys[2], cfg.word_dim, cfg.lstm_hidden_size, 2)

    smi = []
    for i in range(cfg.num_smi_layers):
        k = jax.random.split(keys[4 + i], 9)
        smi.append(
            {
                "content": {
                    "c_hat": _linear_init(k[0], D, dl),
                    "w_hat": _linear_init(k[1], D, dl),
                    "s_hat": _linear_init(k[2], D, dl),
                    "c_out": _linear_init(k[3], dl, D),
                    "attn_q": _linear_init(k[4], dl, dl),
                    "attn_k": _linear_init(k[5], dl, dl),
                },
                "boundary": {
                    "attn_q": _linear_init(k[6], D, D),
                    "attn_k": _linear_init(k[7], D, D),
                },
                "moment": {
                    "conv_fb": _linear_init(k[8], D, D),
                    "conv_fc": _linear_init(jax.random.fold_in(k[8], 1), D, D),
                },
            }
        )

    lk = jax.random.split(keys[3], 4)
    localization = {
        "pm": _linear_init(lk[0], D, 1),
        "ps": _linear_init(lk[1], D, 1),
        "pe": _linear_init(lk[2], D, 1),
        "pa": _linear_init(lk[3], D, 1),
    }
    return {
        "video_encoder": video_encoder,
        "query_encoder": query_encoder,
        "smi": smi,
        "localization": localization,
    }


# --------------------------------------------------------------------- #
# Backbone: encoders + cross-modal Hadamard fusion
# --------------------------------------------------------------------- #
def video_encoder(p: Params, video_features: jnp.ndarray, video_mask: jnp.ndarray):
    """Linear projection + learned positional embedding, both masked.

    Reference: models.py:7-36 (VideoEncoder).
    video_features (B, T, dv), video_mask (B, T, 1) -> (B, T, D).
    """
    dtype = video_features.dtype
    mask = video_mask.astype(dtype)
    x = _linear(p["ve"], video_features) * mask
    return x + p["pe"].astype(dtype)[None] * mask


def query_encoder(p: Params, query_features: jnp.ndarray, query_mask: jnp.ndarray,
                  hidden_size: int, fused: bool = False):
    """biLSTM sentence/word features.

    Reference: models.py:38-64 (QueryEncoder): fs = [last valid forward
    state, backward state at t=0], fw = padded per-word outputs.

    ``fused=True`` routes the grad-free fused VMEM recurrence kernel
    (ops/lstm_pallas.py) when the shape family supports it — serving
    only; the XLA scan stays the differentiable path.
    """
    mask = query_mask[..., 0]                                   # (B, Nq)
    if fused:
        from video_moment_localization_tpu.ops import lstm_pallas

        if lstm_pallas.supports(p, mask.shape[1], mask.shape[0]):
            fw = lstm_pallas.bilstm_fused(query_features, mask, p)
        else:
            fw = bilstm(query_features, mask, p)
    else:
        fw = bilstm(query_features, mask, p)                    # (B, Nq, 2H)
    lengths = jnp.maximum(mask.sum(axis=1).astype(jnp.int32), 1)
    # Last valid forward state via a one-hot contraction rather than
    # take_along_axis: the gather lowers to a serial TPU gather fusion
    # (measured 3.2 ms/step of the B=1024 train step, scripts/
    # profile_train.py) while the one-hot einsum is a dense VPU/MXU op
    # whose transpose is another einsum (no scatter in the backward).
    # Bit-identical to the gather: the one-hot rows are exact {0,1}.
    onehot = jax.nn.one_hot(lengths - 1, fw.shape[1], dtype=fw.dtype)
    f_fwd = jnp.einsum("bn,bnh->bh", onehot, fw[..., :hidden_size])
    f_bwd = fw[:, 0, hidden_size:]
    fs = jnp.concatenate([f_fwd, f_bwd], axis=-1)               # (B, 2H)
    return fs, fw


def backbone(p: Params, cfg: ModelConfig, video_features, video_mask,
             query_features, query_mask, fused_lstm: bool = False):
    """Cross-modal fusion f = fv * fs (reference models.py:66-83)."""
    fv = video_encoder(p["video_encoder"], video_features, video_mask)
    fs, fw = query_encoder(p["query_encoder"], query_features, query_mask,
                           cfg.lstm_hidden_size, fused=fused_lstm)
    f = fv * fs[:, None, :]
    return f, fs, fw


# --------------------------------------------------------------------- #
# Attention primitives
# --------------------------------------------------------------------- #
# Debug introspection: the reference's Attention module stores its last
# softmax weights on `self.attn_weights` (reference models.py:150) for
# interactive debugging. The functional counterpart is this sink: inside
# `attention_weights_sink()` every attention primitive appends
# (name, weights) in call order. Use with an UN-JITTED forward (call
# `smin_forward` directly, no jax.jit) so the captured arrays are concrete;
# under jit they would be tracers.
_ATTN_SINK: Optional[list] = None


@contextlib.contextmanager
def attention_weights_sink():
    """Capture attention weights of forward passes run inside the block.

    Yields a list that fills with ``(name, weights)`` tuples — `"word"`
    for the boundary unit's query-word attention ((B, Lq, Nq), reference
    models.py:128-154) and `"content"` for the content-clip attention
    ((B, L, L, C, Nq) dense / (B, N, C, Nq) packed, models.py:198-226) —
    in call order (per SMI layer: content then word). Re-entrant; restores
    the previous sink on exit.
    """
    global _ATTN_SINK
    prev, sink = _ATTN_SINK, []
    _ATTN_SINK = sink
    try:
        yield sink
    finally:
        _ATTN_SINK = prev


def _record_attn(name: str, weights) -> None:
    if _ATTN_SINK is not None:
        _ATTN_SINK.append((name, weights))


def word_attention(p: Params, query, key, value, key_mask):
    """Single-head scaled-dot attention, raw value passthrough (no W_v).

    Reference: models.py:128-154 (Attention). Key mask applied as
    pre-softmax -1e9 fill. query (B, Lq, D), key/value (B, Lk, D),
    key_mask (B, Lk, 1).
    """
    D = query.shape[-1]
    q = _linear(p["attn_q"], query)
    k = _linear(p["attn_k"], key)
    logits = jnp.einsum("bqd,bkd->bqk", q, k) / math.sqrt(D)
    m = key_mask[..., 0][:, None, :].astype(logits.dtype)       # (B, 1, Lk)
    logits = jnp.where(m > 0, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    _record_attn("word", weights)
    return jnp.einsum("bqk,bkd->bqd", weights, value)


def content_attention(p: Params, query5, key, value, key_mask):
    """Word attention broadcast over the (L, L, C) proposal-clip grid.

    Reference: models.py:198-226 (ContentAttention).
    query5 (B, L, L, C, dl), key/value (B, Nq, dl), key_mask (B, Nq, 1).
    """
    dl = query5.shape[-1]
    q = _linear(p["attn_q"], query5)
    k = _linear(p["attn_k"], key)
    logits = jnp.einsum("blmcd,bnd->blmcn", q, k) / math.sqrt(dl)
    m = key_mask[..., 0][:, None, None, None, :].astype(logits.dtype)
    logits = jnp.where(m > 0, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)                   # (B, L, L, C, Nq)
    _record_attn("content", weights)
    return jnp.einsum("blmcn,bnd->blmcd", weights, value)


# --------------------------------------------------------------------- #
# SMI units
# --------------------------------------------------------------------- #
def moment_gate(f_m, f_s):
    """fbar_m = sigmoid(f_m * f_s) * f_m — the gated moment message.

    The reference computes this identical value independently inside BOTH
    the content unit (models.py:268-269) and the boundary unit
    (models.py:191-193) of every SMI block; computing it once per block
    saves a full (B, N, D)-sized elementwise pass per layer. f_s is
    broadcast over the map axes (f_m may be (B, L, L, D) or packed
    (B, N, D))."""
    fs = f_s.reshape(f_s.shape[0], *([1] * (f_m.ndim - 2)), f_s.shape[-1])
    return jax.nn.sigmoid(f_m * fs) * f_m


def boundary_unit(p: Params, f_b, f_w, f_s, f_m, query_mask, length_mask,
                  fbar=None):
    """Query-guided boundary refinement + moment->boundary message.

    Reference: models.py:156-196 (BoundaryUnit), including the row-mask /
    fill / post-multiply ordering of A_b.
    """
    D = f_b.shape[-1]
    dtype = f_b.dtype
    f_b_mask = length_mask[..., None].astype(dtype)             # (B, L, 1)

    f_baq = word_attention(p, f_b, f_w, f_w, query_mask) * f_b_mask
    f_bq = f_b * (f_baq + f_s[:, None, :])
    logits = jnp.einsum("bid,bjd->bij", f_bq, f_bq) / math.sqrt(D)
    key_m = length_mask[:, None, :].astype(dtype)               # (B, 1, L)
    logits = jnp.where(key_m > 0, logits, _NEG_INF)
    A_b = jax.nn.softmax(logits, axis=-1) * f_b_mask            # (B, L, L)

    f_bb = jnp.einsum("bij,bjd->bid", A_b, f_b) * f_b_mask

    if fbar is None:
        fbar = moment_gate(f_m, f_s)                            # (B, L, L, D)
    f_bm = jnp.einsum("bij,bijd->bid", A_b, fbar)
    return f_bb + f_b + f_bm


def content_unit(p: Params, f_c, f_w, f_s, f_m, query_mask, moment_mask,
                 fbar=None):
    """Query-guided content refinement + intra-moment clip self-attention.

    Reference: models.py:228-276 (ContentUnit). NB: the clip self-attention
    softmax is NOT masked inside — the mask multiplies afterwards
    (models.py:262-263); replicated deliberately.
    """
    dl = p["c_hat"]["w"].shape[1]
    dtype = f_c.dtype
    f_c_mask = moment_mask[..., None, None].astype(dtype)       # (B, L, L, 1, 1)
    q_mask = query_mask.astype(dtype)

    f_c_hat = _linear(p["c_hat"], f_c) * f_c_mask               # (B, L, L, C, dl)
    f_w_hat = _linear(p["w_hat"], f_w) * q_mask                 # (B, Nq, dl)
    f_s_hat = _linear(p["s_hat"], f_s)                          # (B, dl)

    f_caq = content_attention(p, f_c_hat, f_w_hat, f_w_hat, query_mask) * f_c_mask
    f_cq = f_c_hat * (f_caq + f_s_hat[:, None, None, None, :])
    A_c = jnp.einsum("blmcd,blmed->blmce", f_cq, f_cq) / math.sqrt(dl)
    A_c = jax.nn.softmax(A_c, axis=-1) * f_c_mask               # post-softmax mask

    f_cc_hat = jnp.einsum("blmce,blmed->blmcd", A_c, f_c_hat)
    f_cc = _linear(p["c_out"], f_cc_hat) * f_c_mask             # (B, L, L, C, D)

    if fbar is None:
        fbar = moment_gate(f_m, f_s)                            # (B, L, L, D)
    return f_cc + f_c + fbar[:, :, :, None, :]


def moment_unit(p: Params, f_c, f_m, f_b, moment_mask):
    """Boundary outer-product + content-mean fusion into the moment map.

    Reference: models.py:278-303 (MomentUnit). The 1x1 Conv2d's are
    pointwise channel matmuls — no layout permutes needed on TPU.
    """
    dtype = f_m.dtype
    f_m_mask = moment_mask[..., None].astype(dtype)             # (B, L, L, 1)
    outer = f_b[:, :, None, :] * f_b[:, None, :, :]             # (B, L, L, D)
    conv_fb = _linear(p["conv_fb"], outer) * f_m_mask
    conv_fc = _linear(p["conv_fc"], jnp.mean(f_c, axis=3)) * f_m_mask
    return conv_fb + conv_fc + f_m


def smi_block(p: Params, f_c, f_m, f_b, f_w, f_s, query_mask, length_mask, moment_mask):
    """One interaction block (reference models.py:305-322): the moment unit
    consumes the *updated* content/boundary but the *previous* f_m."""
    fbar = moment_gate(f_m, f_s)     # shared by content + boundary units
    cu = content_unit(p["content"], f_c, f_w, f_s, f_m, query_mask, moment_mask,
                      fbar=fbar)
    bu = boundary_unit(p["boundary"], f_b, f_w, f_s, f_m, query_mask, length_mask,
                       fbar=fbar)
    mu = moment_unit(p["moment"], cu, f_m, bu, moment_mask)
    return cu, mu, bu


# --------------------------------------------------------------------- #
# Triangular-packed SMI stack (TPU-native default)
#
# Same math as the dense units above, but over the N = L(L+1)/2 valid
# (i <= j) moment pairs only (ops/packing.py) — the dense path spends ~47%
# of its FLOPs/HBM on lower-triangle garbage the reference immediately
# masks to zero. Numerics at valid positions are identical; the dense units
# are retained for reference-oracle parity tests and the Pallas dense path.
# --------------------------------------------------------------------- #
def content_attention_packed(p: Params, query3, key, value, key_mask):
    """content_attention with one packed pair axis: query3 (B, N, C, dl)."""
    dl = query3.shape[-1]
    q = _linear(p["attn_q"], query3)
    k = _linear(p["attn_k"], key)
    logits = jnp.einsum("bncd,bmd->bncm", q, k) / math.sqrt(dl)
    m = key_mask[..., 0][:, None, None, :].astype(logits.dtype)
    logits = jnp.where(m > 0, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)                   # (B, N, C, Nq)
    _record_attn("content", weights)
    return jnp.einsum("bncm,bmd->bncd", weights, value)


def content_unit_packed(p: Params, f_c, f_w, f_s, f_m, query_mask, vmask,
                        fbar=None):
    """ContentUnit over packed pairs: f_c (B, N, C, D), f_m (B, N, D),
    vmask (B, N)."""
    dl = p["c_hat"]["w"].shape[1]
    dtype = f_c.dtype
    f_c_mask = vmask[..., None, None].astype(dtype)             # (B, N, 1, 1)
    q_mask = query_mask.astype(dtype)

    f_c_hat = _linear(p["c_hat"], f_c) * f_c_mask               # (B, N, C, dl)
    f_w_hat = _linear(p["w_hat"], f_w) * q_mask
    f_s_hat = _linear(p["s_hat"], f_s)

    f_caq = content_attention_packed(p, f_c_hat, f_w_hat, f_w_hat, query_mask)
    f_caq = f_caq * f_c_mask
    f_cq = f_c_hat * (f_caq + f_s_hat[:, None, None, :])
    A_c = jnp.einsum("bncd,bned->bnce", f_cq, f_cq) / math.sqrt(dl)
    A_c = jax.nn.softmax(A_c, axis=-1) * f_c_mask               # post-softmax mask

    f_cc_hat = jnp.einsum("bnce,bned->bncd", A_c, f_c_hat)
    f_cc = _linear(p["c_out"], f_cc_hat) * f_c_mask

    if fbar is None:
        fbar = moment_gate(f_m, f_s)                            # (B, N, D)
    return f_cc + f_c + fbar[:, :, None, :]


def boundary_unit_packed(p: Params, f_b, f_w, f_s, f_m, query_mask,
                         length_mask, L: int, fbar=None):
    """BoundaryUnit with the moment->boundary message read from packed f_m.

    The dense message f_bm[i] = sum_j A_b[i, j] * (g.f_m)[i, j] becomes a
    packed gather of A_b at valid pairs + one MXU row-aggregation matmul
    (ops/packing.py `rowsum_packed`); lower-triangle terms were zero anyway.
    """
    from video_moment_localization_tpu.ops.packing import (
        gather_cols,
        rowsum_packed,
        triu_packing,
    )

    D = f_b.shape[-1]
    dtype = f_b.dtype
    f_b_mask = length_mask[..., None].astype(dtype)             # (B, L, 1)

    f_baq = word_attention(p, f_b, f_w, f_w, query_mask) * f_b_mask
    f_bq = f_b * (f_baq + f_s[:, None, :])
    logits = jnp.einsum("bid,bjd->bij", f_bq, f_bq) / math.sqrt(D)
    key_m = length_mask[:, None, :].astype(dtype)
    logits = jnp.where(key_m > 0, logits, _NEG_INF)
    A_b = jax.nn.softmax(logits, axis=-1) * f_b_mask            # (B, L, L)

    f_bb = jnp.einsum("bij,bjd->bid", A_b, f_b) * f_b_mask

    if fbar is None:
        fbar = moment_gate(f_m, f_s)                            # (B, N, D)
    pk = triu_packing(L)
    B = A_b.shape[0]
    A_b_packed = gather_cols(A_b.reshape(B, L * L), pk.flat_idx, L * L)
    f_bm = rowsum_packed(A_b_packed[..., None] * fbar, L)       # (B, L, D)
    return f_bb + f_b + f_bm


def moment_unit_packed(p: Params, f_c, f_m, f_b, vmask, L: int):
    """MomentUnit over packed pairs: boundary outer-product via static
    per-pair gathers of f_b."""
    from video_moment_localization_tpu.ops.packing import gather_rows, triu_packing

    dtype = f_m.dtype
    pk = triu_packing(L)
    f_m_mask = vmask[..., None].astype(dtype)                   # (B, N, 1)
    outer = gather_rows(f_b, pk.i_idx) * gather_rows(f_b, pk.j_idx)  # (B, N, D)
    conv_fb = _linear(p["conv_fb"], outer) * f_m_mask
    conv_fc = _linear(p["conv_fc"], jnp.mean(f_c, axis=2)) * f_m_mask
    return conv_fb + conv_fc + f_m


def smi_block_packed(p: Params, f_c, f_m, f_b, f_w, f_s, query_mask,
                     length_mask, vmask, L: int, fused_content: bool = False):
    fbar = moment_gate(f_m, f_s)     # shared by content + boundary units
    if fused_content:
        from video_moment_localization_tpu.ops.content_pallas import (
            content_unit_fused,
        )

        cu = content_unit_fused(p["content"], f_c, f_w, f_s, f_m,
                                query_mask, vmask)
    else:
        cu = content_unit_packed(p["content"], f_c, f_w, f_s, f_m,
                                 query_mask, vmask, fbar=fbar)
    bu = boundary_unit_packed(p["boundary"], f_b, f_w, f_s, f_m, query_mask,
                              length_mask, L, fbar=fbar)
    mu = moment_unit_packed(p["moment"], cu, f_m, bu, vmask, L)
    return cu, mu, bu


# --------------------------------------------------------------------- #
# Heads
# --------------------------------------------------------------------- #
def localization(p: Params, f_m, f_b, length_mask, moment_mask):
    """Four sigmoid 1x1-conv heads (reference models.py:324-344).

    Scores are computed in fp32 regardless of compute dtype.
    """
    f_m32, f_b32 = f_m.astype(jnp.float32), f_b.astype(jnp.float32)
    lm = length_mask.astype(jnp.float32)
    mm = moment_mask.astype(jnp.float32)
    p_m = jax.nn.sigmoid(_linear(p["pm"], f_m32))[..., 0] * mm   # (B, L, L)
    p_s = jax.nn.sigmoid(_linear(p["ps"], f_b32))[..., 0] * lm   # (B, L)
    p_e = jax.nn.sigmoid(_linear(p["pe"], f_b32))[..., 0] * lm
    p_a = jax.nn.sigmoid(_linear(p["pa"], f_b32))[..., 0] * lm
    return p_m, p_s, p_e, p_a


def localization_packed(p: Params, f_m, f_b, length_mask, vmask, L: int,
                        dense_out: bool = False):
    """Scoring heads on packed moments: pm stays in the packed (B, N)
    layout (loss/metrics consume it directly — train/loss.py,
    train/metrics.py). ``dense_out=True`` densifies pm to (B, L, L) for the
    reference-compat eval mode (ModelConfig.compat_head, PARITY.md #16)."""
    f_m32, f_b32 = f_m.astype(jnp.float32), f_b.astype(jnp.float32)
    lm = length_mask.astype(jnp.float32)
    p_m = jax.nn.sigmoid(_linear(p["pm"], f_m32))[..., 0]         # (B, N)
    p_m = p_m * vmask.astype(jnp.float32)
    if dense_out:
        from video_moment_localization_tpu.ops.packing import unpack_map

        p_m = unpack_map(p_m, L)                                  # (B, L, L)
    p_s = jax.nn.sigmoid(_linear(p["ps"], f_b32))[..., 0] * lm
    p_e = jax.nn.sigmoid(_linear(p["pe"], f_b32))[..., 0] * lm
    p_a = jax.nn.sigmoid(_linear(p["pa"], f_b32))[..., 0] * lm
    return p_m, p_s, p_e, p_a


# --------------------------------------------------------------------- #
# Full model
# --------------------------------------------------------------------- #
def smin_forward(
    params: Params,
    cfg: ModelConfig,
    video_features: jnp.ndarray,   # (B, T, dv)
    video_mask: jnp.ndarray,       # (B, T, 1)
    query_features: jnp.ndarray,   # (B, Nq, word_dim)
    query_mask: jnp.ndarray,       # (B, Nq, 1)
    length_mask: jnp.ndarray,      # (B, L)
    moment_mask: jnp.ndarray,      # (B, L, L); may be None in packed mode
    video_group: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward pass -> (pm, ps, pe, pa), all fp32 in [0, 1].

    pm is (B, N = L(L+1)/2) in the packed layout (cfg.packed and not
    cfg.compat_head — the default; moment_mask is unused and may be None),
    (B, L, L) otherwise. Reference: models.py:346-377 (SMIN.forward).

    ``video_group``: optional (vf_g (G, T, dv), vm_g (G, T, 1), vidx (B,))
    — grouped-video serving: the video encoder runs once per UNIQUE video
    and rows are gathered to pairs before the Hadamard fusion
    (f = fv_g[vidx] * fs), bit-identical to encoding each pair's copy.
    When set, ``video_features``/``video_mask`` are ignored (pass None).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    qf = query_features.astype(dtype)

    if video_group is None:
        vf = video_features.astype(dtype)
        f, fs, fw = backbone(params, cfg, vf, video_mask, qf, query_mask)
    else:
        vf_g, vm_g, vidx = video_group
        fv_g = video_encoder(params["video_encoder"], vf_g.astype(dtype),
                             vm_g)
        fs, fw = query_encoder(params["query_encoder"], qf, query_mask,
                               cfg.lstm_hidden_size)
        f = jnp.take(fv_g, vidx, axis=0) * fs[:, None, :]

    if cfg.packed:
        from video_moment_localization_tpu.ops.packing import packed_valid_mask
        from video_moment_localization_tpu.ops.proposal import (
            proposal_features_packed_auto,
        )

        vmask = packed_valid_mask(length_mask.astype(jnp.float32)).astype(dtype)
        if cfg.fused_smi_train and not cfg.compat_head:
            from video_moment_localization_tpu.ops import smin_train_pallas
            from video_moment_localization_tpu.ops.proposal import _on_tpu

            if (_on_tpu() and cfg.use_pallas
                    and smin_train_pallas.supports_train(cfg)):
                # Differentiable fused SMI stack: per-layer Pallas kernels
                # with in-VMEM jax.vjp backward (ops/smin_train_pallas.py).
                # The proposal kernel emits fc directly in the stack's
                # c-major rows layout — no (B, N, C, D) detour (the
                # transpose/convert glue cost ~17 ms/step at B=1024,
                # ops/proposal_pallas.proposal_features_rows).
                from video_moment_localization_tpu.ops.proposal_pallas import (
                    proposal_features_rows,
                )

                fc_rows, fm, fb = proposal_features_rows(
                    f, length_mask, cfg.L, cfg.C)
                fm, fb = smin_train_pallas.smin_smi_stack_train_rows(
                    params, cfg, fc_rows, fm, fb, fw, fs, query_mask,
                    length_mask, vmask)
                return localization_packed(params["localization"], fm, fb,
                                           length_mask, vmask, cfg.L,
                                           dense_out=cfg.compat_head)
        fc, fm, fb = proposal_features_packed_auto(f, length_mask, cfg.L, cfg.C,
                                                   cfg.use_pallas)
        if cfg.fused_smi_train and not cfg.compat_head:
            from video_moment_localization_tpu.ops import smin_train_pallas
            from video_moment_localization_tpu.ops.proposal import _on_tpu
            from video_moment_localization_tpu.ops import (
                content_train_pallas,
            )

            if (_on_tpu() and not cfg.use_pallas
                    and smin_train_pallas.supports_train(cfg)):
                # use_pallas=False keeps the XLA prefix-sum proposal but
                # the stack flag is independent: route through the
                # (B, N, C, D) interface as before.
                fm, fb = smin_train_pallas.smin_smi_stack_train(
                    params, cfg, fc, fm, fb, fw, fs, query_mask,
                    length_mask, vmask)
                return localization_packed(params["localization"], fm, fb,
                                           length_mask, vmask, cfg.L,
                                           dense_out=cfg.compat_head)
            if _on_tpu() and content_train_pallas.supports(cfg):
                # Maps too large for the whole-layer train kernel
                # (ActivityNet NC=8320): fuse the content unit per
                # (element, pair-block) cell, boundary/moment on XLA
                # (ops/content_train_pallas.py).
                fm, fb = content_train_pallas.smi_stack_content_train(
                    params, cfg, fc, fm, fb, fw, fs, query_mask,
                    length_mask, vmask)
                return localization_packed(params["localization"], fm, fb,
                                           length_mask, vmask, cfg.L,
                                           dense_out=cfg.compat_head)
        fused_content = False
        if cfg.fused_content:
            from video_moment_localization_tpu.ops import content_pallas
            from video_moment_localization_tpu.ops.proposal import _on_tpu

            fused_content = _on_tpu() and content_pallas.supports(cfg.L, cfg.C)
        block = smi_block_packed
        if cfg.remat_smi:
            block = jax.checkpoint(smi_block_packed, static_argnums=(9, 10))
        for p_layer in params["smi"]:
            fc, fm, fb = block(p_layer, fc, fm, fb, fw, fs,
                               query_mask, length_mask, vmask, cfg.L,
                               fused_content)
        return localization_packed(params["localization"], fm, fb,
                                   length_mask, vmask, cfg.L,
                                   dense_out=cfg.compat_head)

    fc, fm, fb = proposal_features_auto(f, moment_mask, cfg.L, cfg.C, cfg.use_pallas)
    block = smi_block
    if cfg.remat_smi:
        block = jax.checkpoint(smi_block, static_argnums=())
    for p_layer in params["smi"]:
        fc, fm, fb = block(p_layer, fc, fm, fb, fw, fs,
                           query_mask, length_mask, moment_mask)

    return localization(params["localization"], fm, fb, length_mask, moment_mask)


def smin_forward_inference(
    params: Params,
    cfg: ModelConfig,
    video_features: jnp.ndarray,
    video_mask: jnp.ndarray,
    query_features: jnp.ndarray,
    query_mask: jnp.ndarray,
    length_mask: jnp.ndarray,
    moment_mask: jnp.ndarray,
    video_group: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Grad-free forward for eval/serving: same contract as `smin_forward`,
    but routes the SMIN interior through the fused VMEM-resident SMI-stack
    kernel (ops/smin_pallas.py) when supported — measured 1.34x end-to-end
    over the packed XLA path at the flagship serving batch (and 1.25x at
    ActivityNet L=64, B=512). Falls back to `smin_forward` off-TPU, at
    unsupported scales, or in compat/dense modes. Not differentiable
    through the kernel path — use `smin_forward` for training.

    ``video_group``: see `smin_forward` — encode G unique videos once and
    gather to B pairs (grouped serving, `MomentLocalizer` dedup path)."""
    # fp32 activations run the kernel's HIGHEST-precision MXU mode (full
    # fp32 passes — ops/smin_pallas.py `prec`), so the parity-exact fp32
    # mode gets the kernel too; verified on chip vs the fp32 XLA path in
    # scripts/verify_kernels.py.
    if cfg.packed and not cfg.compat_head and cfg.fused_smi:
        from video_moment_localization_tpu.ops import smin_pallas
        from video_moment_localization_tpu.ops.proposal import _on_tpu

        if _on_tpu() and smin_pallas.supports(cfg):
            from video_moment_localization_tpu.ops.packing import (
                packed_valid_mask,
            )

            dtype = jnp.dtype(cfg.compute_dtype)
            qf = query_features.astype(dtype)
            if video_group is None:
                vf = video_features.astype(dtype)
                f, fs, fw = backbone(params, cfg, vf, video_mask, qf,
                                     query_mask, fused_lstm=cfg.fused_lstm)
            else:
                vf_g, vm_g, vidx = video_group
                fv_g = video_encoder(params["video_encoder"],
                                     vf_g.astype(dtype), vm_g)
                fs, fw = query_encoder(params["query_encoder"], qf,
                                       query_mask, cfg.lstm_hidden_size,
                                       fused=cfg.fused_lstm)
                f = jnp.take(fv_g, vidx, axis=0) * fs[:, None, :]
            vmask = packed_valid_mask(
                length_mask.astype(jnp.float32)).astype(dtype)
            return smin_pallas.smin_stack_fused(
                params, cfg, f, fw, fs, query_mask, length_mask, vmask)
    return smin_forward(params, cfg, video_features, video_mask,
                        query_features, query_mask, length_mask, moment_mask,
                        video_group=video_group)
