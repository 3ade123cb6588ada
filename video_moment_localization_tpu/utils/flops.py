"""Analytic FLOP counts for the SMIN forward/train step.

Used by bench.py to turn measured device step times into MFU estimates
(VERDICT r1 item 2: "make the perf claim an on-chip claim"). Counts matmul
FLOPs (2*M*N*K per GEMM) for every projection/attention contraction in the
model, in whichever (packed/dense) layout the config selects; elementwise
work (masks, gates, softmax normalization) is excluded — it is VPU-bound
and contributes no MXU utilization.

Component inventory mirrors models/smin.py; reference modules cited there.
"""

from __future__ import annotations

from video_moment_localization_tpu.config import ModelConfig


def _bilstm_flops(cfg: ModelConfig) -> int:
    """2-layer biLSTM over Nq steps (models/lstm.py)."""
    H = cfg.lstm_hidden_size
    Nq = cfg.max_query_length
    total = 0
    for in_dim in (cfg.word_dim, 2 * H):  # layer 0 input, layer 1 input
        per_step = 2 * in_dim * 4 * H + 2 * H * 4 * H  # w_ih + w_hh
        total += 2 * Nq * per_step                     # 2 directions
    return total


def smin_forward_flops(cfg: ModelConfig, batch_size: int) -> int:
    """Matmul FLOPs of one forward pass at the given batch size."""
    T, L, C, D, dl = cfg.T, cfg.L, cfg.C, cfg.D, cfg.dl
    Nq = cfg.max_query_length
    n_pairs = L * (L + 1) // 2 if cfg.packed else L * L
    NC = n_pairs * C

    per_sample = 0
    # VideoEncoder projection (reference models.py:7-36)
    per_sample += 2 * T * cfg.input_video_dim * D
    # QueryEncoder biLSTM (models.py:38-64)
    per_sample += _bilstm_flops(cfg)
    # Proposal-map generation: the fused kernel's row-block matmul
    # (ops/proposal_pallas.py); the XLA prefix-sum path does ~no matmul
    # FLOPs but the same HBM writes — count the kernel (upper bound).
    per_sample += 2 * NC * T * D

    per_layer = 0
    # ContentUnit (models.py:228-276)
    per_layer += 2 * NC * D * dl          # c_hat
    per_layer += 2 * Nq * D * dl          # w_hat
    per_layer += 2 * D * dl               # s_hat
    per_layer += 2 * NC * dl * dl         # attn W_q
    per_layer += 2 * Nq * dl * dl         # attn W_k
    per_layer += 2 * NC * Nq * dl * 2     # word-attention logits + apply
    per_layer += 2 * NC * C * dl * 2      # intra-moment C x C sim + apply
    per_layer += 2 * NC * dl * D          # c_out
    # BoundaryUnit (models.py:156-196)
    per_layer += 2 * L * D * D            # attn W_q on f_b
    per_layer += 2 * Nq * D * D           # attn W_k on f_w
    per_layer += 2 * L * Nq * D * 2       # word-attention logits + apply
    per_layer += 2 * L * L * D * 2        # boundary self-attn logits + f_bb
    per_layer += 2 * L * n_pairs * D      # moment->boundary row aggregation
    # MomentUnit (models.py:278-303)
    per_layer += 2 * n_pairs * D * D * 2  # conv_fb + conv_fc

    per_sample += cfg.num_smi_layers * per_layer
    # Localization heads (models.py:324-344)
    per_sample += 2 * n_pairs * D + 3 * 2 * L * D
    return batch_size * per_sample


def smin_train_step_flops(cfg: ModelConfig, batch_size: int) -> int:
    """Matmul FLOPs of one fused train step (forward + backward + Adam).

    Backward of a GEMM costs 2x its forward (dX and dW); Adam is
    elementwise. Standard 3x-forward estimate, exact for the matmul-
    dominated SMIN stack (remat adds one extra forward when enabled).
    """
    mult = 4 if cfg.remat_smi else 3
    return mult * smin_forward_flops(cfg, batch_size)
