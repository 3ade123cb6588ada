"""End-to-end CLI tests: train -> stats/checkpoint -> resume -> test mode.

Runs `main.py` as a subprocess against a synthetic on-disk Charades-style
data dir (full file-reading path, no downloads)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
model:              "SMIN"
checkpoint_path:    "{ckpt}"
resume_training:    {resume}
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
num_epochs:         2
"""


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    write_charades_style_dir(str(root / "data"), num_videos=4, queries_per_video=2)
    return root


def _write_cfg(workdir, resume=False):
    cfg_path = workdir / "tiny.yml"
    cfg_path.write_text(
        TINY_CFG.format(ckpt=str(workdir / "ckpt"), data=str(workdir / "data"),
                        resume=str(resume))
    )
    return str(cfg_path)


def _run(workdir, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GLOVE_PATH"] = str(workdir / "data/glove/glove.6B.300d.txt")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), *args],
        capture_output=True, text=True, env=env, cwd=str(workdir), timeout=600,
    )


def test_train_then_resume_then_test(workdir):
    cfg = _write_cfg(workdir)
    r = _run(workdir, "--config_path", cfg, "--num_epochs", "2")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Training Epoch - 1" in r.stdout and "Training Epoch - 2" in r.stdout
    assert "Training Loss -" in r.stdout
    assert "train_R@1, IoU=0.5 -" in r.stdout and "eval_R@5, IoU=0.7 -" in r.stdout

    stats_path = workdir / "ckpt/tiny_stats.json"
    stats = json.loads(stats_path.read_text())
    assert stats["epoch"] == [1, 2]
    assert len(stats["train_loss"]) == 2 and len(stats["eval_R@1, IoU=0.3"]) == 2
    assert os.path.exists(workdir / "ckpt/tiny_model.ckpt")

    # resume: continue to epoch 3, stats truncated/extended correctly
    cfg_resume = _write_cfg(workdir, resume=True)
    r2 = _run(workdir, "--config_path", cfg_resume, "--num_epochs", "3")
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Training Epoch - 3" in r2.stdout
    assert "Training Epoch - 2" not in r2.stdout  # starts after the checkpoint
    stats = json.loads(stats_path.read_text())
    assert stats["epoch"] == [1, 2, 3]

    # test mode loads the checkpoint and prints the 8 metrics
    r3 = _run(workdir, "--config_path", cfg_resume, "--test")
    assert r3.returncode == 0, r3.stderr[-3000:]
    for name in ("R@1, IoU=0.1", "R@5, IoU=0.7"):
        assert f"{name} - " in r3.stdout
    # soft-NMS eval mode also runs
    r4 = _run(workdir, "--config_path", cfg_resume, "--test", "--nms")
    assert r4.returncode == 0, r4.stderr[-3000:]
    assert "R@5, IoU=0.7 - " in r4.stdout


def test_missing_checkpoint_raises(workdir):
    cfg = _write_cfg(workdir)
    env_ckpt = workdir / "ckpt_missing"
    cfg2 = workdir / "tiny2.yml"
    cfg2.write_text(
        TINY_CFG.format(ckpt=str(env_ckpt), data=str(workdir / "data"), resume="False")
    )
    r = _run(workdir, "--config_path", str(cfg2), "--test")
    assert r.returncode != 0
    assert "No saved model at" in (r.stderr + r.stdout)
