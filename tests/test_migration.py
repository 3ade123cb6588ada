"""Migration-path test: reference torch checkpoint -> ported checkpoint ->
this framework's --test CLI. Requires the reference implementation and torch
(skipped elsewhere)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
model:              "SMIN"
checkpoint_path:    "{ckpt}"
resume_training:    False
T:                  16
L:                  8
C:                  4
d:                  32
input_video_dim:    32
dl:                 8
max_query_length:   6
lstm_hidden_size:   16
num_smi_layers:     2
dataset:            "charadessta"
data_dir:           "{data}"
batch_size:         4
num_workers:        2
seed:               43
optimizer:          "Adam"
lr:                 0.001
num_epochs:         1
"""


@pytest.mark.skipif(
    not os.path.exists("/root/reference/models.py"),
    reason="reference implementation not available",
)
def test_port_torch_checkpoint_then_test_cli(tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        ref_models = importlib.import_module("models")
    finally:
        sys.path.remove("/root/reference")

    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    data = write_charades_style_dir(str(tmp_path / "data"), num_videos=4)
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(TINY_CFG.format(ckpt=str(tmp_path / "ckpt"), data=data))

    torch.manual_seed(3)
    ref = ref_models.SMIN(T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                          input_video_dim=32, max_query_length=6,
                          lstm_hidden_size=16, device="cpu")
    torch_ckpt = tmp_path / "tiny_model.pt"
    torch.save({"epoch": 5, "model": ref.state_dict(), "optimizer": {}}, torch_ckpt)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GLOVE_PATH"] = os.path.join(data, "glove/glove.6B.300d.txt")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/port_checkpoint.py"),
         "--torch_ckpt", str(torch_ckpt), "--config_path", str(cfg_path)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "ckpt/tiny_model.ckpt")

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "--config_path", str(cfg_path), "--test"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "R@5, IoU=0.7 - " in r2.stdout
