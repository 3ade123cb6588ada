"""Config loading, overrides, validation, and trainer heuristics."""

import dataclasses
import os

import pytest

from video_moment_localization_tpu.config import (
    REQUIRED_KEYS,
    ModelConfig,
    config_from_dict,
    load_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_schema_configs_load():
    for name, T, L, dv in (("charadessta", 64, 16, 1024),
                           ("activitynet", 128, 64, 500),
                           ("tacos", 128, 32, 4096)):
        cfg = load_config(os.path.join(REPO, f"config/{name}.yml"))
        assert cfg.experiment == name and cfg.dataset == name
        assert (cfg.model.T, cfg.model.L, cfg.model.input_video_dim) == (T, L, dv)
        assert set(cfg.raw) == set(REQUIRED_KEYS)


def test_num_epochs_override_semantics():
    path = os.path.join(REPO, "config/charadessta.yml")
    assert load_config(path).num_epochs == 100
    assert load_config(path, num_epochs_override=7).num_epochs == 7
    assert load_config(path, num_epochs_override=0).num_epochs == 100  # 0 = keep


def test_missing_key_rejected():
    cfg = load_config(os.path.join(REPO, "config/charadessta.yml")).raw
    cfg.pop("lstm_hidden_size")
    with pytest.raises(KeyError, match="lstm_hidden_size"):
        config_from_dict(cfg)


def test_unknown_model_rejected():
    """Reference main.py:68-75 raises on any model name but SMIN."""
    cfg = load_config(os.path.join(REPO, "config/charadessta.yml")).raw
    cfg["model"] = "FOO"
    with pytest.raises(ValueError, match="Model FOO is not a valid model!"):
        config_from_dict(cfg)


def test_shape_constraints_validated():
    with pytest.raises(ValueError, match="multiple of L"):
        ModelConfig(T=60, L=16)
    with pytest.raises(ValueError, match="2\\*lstm_hidden_size"):
        ModelConfig(D=512, lstm_hidden_size=128)


def test_trainer_auto_remat_heuristic():
    """Large per-chip activation estimates flip remat on; small ones don't."""
    from video_moment_localization_tpu.train.trainer import Trainer

    small = load_config(os.path.join(REPO, "config/charadessta.yml"))
    small.model = dataclasses.replace(
        small.model, T=16, L=8, D=32, dl=8, lstm_hidden_size=16,
        input_video_dim=12, max_query_length=6)
    small.batch_size = 8
    t = Trainer(small)
    assert not t.cfg.model.remat_smi

    big = load_config(os.path.join(REPO, "config/activitynet.yml"))
    big.num_devices = 1
    big.model = dataclasses.replace(big.model, compute_dtype="bfloat16")
    t2 = Trainer(big)  # B=64, L=64: residual estimate >> 6 GB/chip
    assert t2.cfg.model.remat_smi
