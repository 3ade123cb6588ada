"""ActivityNet / TACoS readers end-to-end on synthetic HDF5 data dirs,
including a full CLI train+test pass for each."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from video_moment_localization_tpu.data.datasets import ActivityNet, TACoS
from video_moment_localization_tpu.data.glove import WordEmbedding
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import (
    write_activitynet_style_dir,
    write_tacos_style_dir,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_TMPL = """
model:              "SMIN"
checkpoint_path:    "{ckpt}"
resume_training:    False
T:                  16
L:                  8
C:                  4
d:                  32
input_video_dim:    24
dl:                 8
max_query_length:   6
lstm_hidden_size:   16
num_smi_layers:     1
dataset:            "{dataset}"
data_dir:           "{data}"
batch_size:         4
num_workers:        2
seed:               43
optimizer:          "Adam"
lr:                 0.001
num_epochs:         1
"""


def _emb(root):
    return WordEmbedding.from_text(os.path.join(root, "glove/glove.6B.300d.txt"))


def test_activitynet_reader(tmp_path):
    root = write_activitynet_style_dir(str(tmp_path / "anet"))
    ds = ActivityNet(root, T=16, L=8, max_query_length=6, split="train",
                     embedding=_emb(root))
    assert len(ds) == 10
    s = ds.sample(0, np.random.default_rng(0))
    assert s["video_features"].shape == (16, 24)
    assert 0 <= s["start_pos"] < s["end_pos"] <= 1.0
    # concurrent loading across worker threads (per-thread h5 handles)
    batches = list(BatchLoader(ds, 4, shuffle=True, num_workers=4, seed=0).epoch(0))
    assert sum(int(b["sample_mask"].sum()) for b in batches) == 10


def test_tacos_reader_frame_times(tmp_path):
    root = write_tacos_style_dir(str(tmp_path / "tacos"))
    ds = TACoS(root, T=16, L=8, max_query_length=6, split="val", embedding=_emb(root))
    assert len(ds) == 10
    with open(os.path.join(root, "val.json")) as f:
        anns = json.load(f)
    # times must be converted from frames to seconds (divided by fps)
    first_vid = ds.annotations[0]["video_id"]
    fps = anns[first_vid]["fps"]
    raw_ts = anns[first_vid]["timestamps"][0]
    np.testing.assert_allclose(ds.annotations[0]["times"],
                               [raw_ts[0] / fps, raw_ts[1] / fps], rtol=1e-6)
    assert ds.annotations[0]["duration"] == pytest.approx(
        anns[first_vid]["num_frames"] / fps)
    s = ds.sample(2, np.random.default_rng(1))
    assert s["video_features"].shape == (16, 24)


@pytest.mark.parametrize("dataset,writer", [
    ("activitynet", write_activitynet_style_dir),
    ("tacos", write_tacos_style_dir),
])
def test_cli_end_to_end(tmp_path, dataset, writer):
    root = writer(str(tmp_path / dataset))
    cfg = tmp_path / f"{dataset}_tiny.yml"
    cfg.write_text(CFG_TMPL.format(ckpt=str(tmp_path / "ckpt"), dataset=dataset,
                                   data=root))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GLOVE_PATH"] = os.path.join(root, "glove/glove.6B.300d.txt")

    r = subprocess.run([sys.executable, os.path.join(REPO, "main.py"),
                        "--config_path", str(cfg)],
                       capture_output=True, text=True, env=env,
                       cwd=str(tmp_path), timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Training Epoch - 1" in r.stdout and "eval_R@5, IoU=0.7 -" in r.stdout

    r2 = subprocess.run([sys.executable, os.path.join(REPO, "main.py"),
                         "--config_path", str(cfg), "--test"],
                        capture_output=True, text=True, env=env,
                        cwd=str(tmp_path), timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "R@1, IoU=0.5 - " in r2.stdout
