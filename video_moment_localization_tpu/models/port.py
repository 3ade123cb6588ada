"""Port PyTorch SMIN weights into this framework's parameter pytree.

Used by the parity harness (SURVEY.md §7 step 8): load a reference
checkpoint's `state_dict` (names from reference models.py module tree), remap
into our pytree, and assert forward-pass agreement within fp tolerance.

Layout conversions:
* torch Linear weight (out, in)      -> w (in, out) via transpose
* torch Conv2d/Conv1d 1x1 (out,in,1[,1]) -> w (in, out)
* torch LSTM  weight_ih_l{k}[_reverse]  -> query_encoder[k][fwd|bwd].w_ih (as-is)
* nn.Embedding pe.weight (T, d)      -> pe (as-is)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from video_moment_localization_tpu.config import ModelConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def _conv1x1(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"])            # (out, in, 1[, 1])
    w = w.reshape(w.shape[0], w.shape[1]).T    # (in, out)
    return {"w": w, "b": _np(sd[f"{prefix}.bias"])}


def params_from_torch_state_dict(sd: Mapping[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """Reference SMIN state_dict -> this framework's parameter pytree."""
    query_encoder = []
    for layer in range(2):
        directions = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            pre = f"backbone.queryencoder.lstm"
            directions[direction] = {
                "w_ih": _np(sd[f"{pre}.weight_ih_l{layer}{suffix}"]),
                "w_hh": _np(sd[f"{pre}.weight_hh_l{layer}{suffix}"]),
                "b_ih": _np(sd[f"{pre}.bias_ih_l{layer}{suffix}"]),
                "b_hh": _np(sd[f"{pre}.bias_hh_l{layer}{suffix}"]),
            }
        query_encoder.append(directions)

    smi = []
    for i in range(cfg.num_smi_layers):
        pre = f"smis.{i}"
        smi.append(
            {
                "content": {
                    "c_hat": _linear(sd, f"{pre}.content_unit.linear_c_hat"),
                    "w_hat": _linear(sd, f"{pre}.content_unit.linear_w_hat"),
                    "s_hat": _linear(sd, f"{pre}.content_unit.linear_s_hat"),
                    "c_out": _linear(sd, f"{pre}.content_unit.linear_c"),
                    "attn_q": _linear(sd, f"{pre}.content_unit.attn_layer.W_q"),
                    "attn_k": _linear(sd, f"{pre}.content_unit.attn_layer.W_k"),
                },
                "boundary": {
                    "attn_q": _linear(sd, f"{pre}.boundary_unit.attn_layer.W_q"),
                    "attn_k": _linear(sd, f"{pre}.boundary_unit.attn_layer.W_k"),
                },
                "moment": {
                    "conv_fb": _conv1x1(sd, f"{pre}.moment_unit.conv_layer_fb"),
                    "conv_fc": _conv1x1(sd, f"{pre}.moment_unit.conv_layer_fc"),
                },
            }
        )

    return {
        "video_encoder": {
            "ve": _linear(sd, "backbone.videoencoder.ve"),
            "pe": _np(sd["backbone.videoencoder.pe.weight"]),
        },
        "query_encoder": query_encoder,
        "smi": smi,
        "localization": {
            "pm": _conv1x1(sd, "localization.conv_layer_pm"),
            "ps": _conv1x1(sd, "localization.conv_layer_ps"),
            "pe": _conv1x1(sd, "localization.conv_layer_pe"),
            "pa": _conv1x1(sd, "localization.conv_layer_pa"),
        },
    }


# ------------------------------------------------------------------------- #
# Reverse direction: this framework's params -> reference state_dict
# ------------------------------------------------------------------------- #
def _linear_out(sd, prefix: str, p) -> None:
    sd[f"{prefix}.weight"] = _np(p["w"]).T
    sd[f"{prefix}.bias"] = _np(p["b"])


def _conv1x1_out(sd, prefix: str, p, conv2d: bool) -> None:
    w = _np(p["w"]).T  # (out, in)
    sd[f"{prefix}.weight"] = w[..., None, None] if conv2d else w[..., None]
    sd[f"{prefix}.bias"] = _np(p["b"])


def torch_state_dict_from_params(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """This framework's parameter pytree -> reference-layout state_dict.

    Values are numpy arrays keyed by the reference module names
    (models.py module tree), loadable into the reference SMIN after
    `torch.from_numpy` conversion — the migration path back to torch.
    Inverse of `params_from_torch_state_dict` (round-trip tested).
    """
    sd: Dict[str, np.ndarray] = {}
    _linear_out(sd, "backbone.videoencoder.ve", params["video_encoder"]["ve"])
    sd["backbone.videoencoder.pe.weight"] = _np(params["video_encoder"]["pe"])

    for layer, directions in enumerate(params["query_encoder"]):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
                torch_key = key.replace("w_", "weight_").replace("b_", "bias_")
                sd[f"backbone.queryencoder.lstm.{torch_key}_l{layer}{suffix}"] = _np(
                    directions[direction][key]
                )

    for i, layer in enumerate(params["smi"]):
        pre = f"smis.{i}"
        c = layer["content"]
        _linear_out(sd, f"{pre}.content_unit.linear_c_hat", c["c_hat"])
        _linear_out(sd, f"{pre}.content_unit.linear_w_hat", c["w_hat"])
        _linear_out(sd, f"{pre}.content_unit.linear_s_hat", c["s_hat"])
        _linear_out(sd, f"{pre}.content_unit.linear_c", c["c_out"])
        _linear_out(sd, f"{pre}.content_unit.attn_layer.W_q", c["attn_q"])
        _linear_out(sd, f"{pre}.content_unit.attn_layer.W_k", c["attn_k"])
        _linear_out(sd, f"{pre}.boundary_unit.attn_layer.W_q",
                    layer["boundary"]["attn_q"])
        _linear_out(sd, f"{pre}.boundary_unit.attn_layer.W_k",
                    layer["boundary"]["attn_k"])
        _conv1x1_out(sd, f"{pre}.moment_unit.conv_layer_fb",
                     layer["moment"]["conv_fb"], conv2d=True)
        _conv1x1_out(sd, f"{pre}.moment_unit.conv_layer_fc",
                     layer["moment"]["conv_fc"], conv2d=True)

    _conv1x1_out(sd, "localization.conv_layer_pm", params["localization"]["pm"],
                 conv2d=True)
    for head in ("ps", "pe", "pa"):
        _conv1x1_out(sd, f"localization.conv_layer_{head}",
                     params["localization"][head], conv2d=False)
    return sd
