"""CLI training on a 2-D (data x seq) mesh via --seq_devices."""

import json
import os
import subprocess
import sys

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
num_smi_layers:     1
dataset:            "charadessta"
data_dir:           "{data}"
batch_size:         4
num_workers:        2
seed:               43
optimizer:          "Adam"
lr:                 0.001
num_epochs:         1
"""


def _run(workdir, data, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["GLOVE_PATH"] = os.path.join(data, "glove/glove.6B.300d.txt")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), *args],
        capture_output=True, text=True, env=env, cwd=str(workdir), timeout=600,
    )


def test_cli_seq_devices_matches_single_device(tmp_path):
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    data = write_charades_style_dir(str(tmp_path / "data"), num_videos=4)
    losses = {}
    for name, extra in (("base", []), ("seq", ["--seq_devices", "2"])):
        cfg = tmp_path / f"{name}.yml"
        cfg.write_text(TINY_CFG.format(ckpt=str(tmp_path / f"ckpt_{name}"), data=data))
        r = _run(tmp_path, data, "--config_path", str(cfg), *extra)
        assert r.returncode == 0, r.stderr[-3000:]
        stats = json.loads((tmp_path / f"ckpt_{name}/{name}_stats.json").read_text())
        losses[name] = (stats["train_loss"][0], stats["eval_loss"][0])
    assert losses["seq"][0] == pytest.approx(losses["base"][0], rel=1e-3)
    assert losses["seq"][1] == pytest.approx(losses["base"][1], rel=1e-3)


def test_cli_seq_devices_invalid_width(tmp_path):
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    data = write_charades_style_dir(str(tmp_path / "data"), num_videos=2)
    cfg = tmp_path / "bad.yml"
    cfg.write_text(TINY_CFG.format(ckpt=str(tmp_path / "ckpt"), data=data))
    r = _run(tmp_path, data, "--config_path", str(cfg), "--seq_devices", "3")
    assert r.returncode != 0
    assert "divisible by seq_devices" in (r.stderr + r.stdout)
