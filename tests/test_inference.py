"""Serving API tests: end-to-end localize() from a trained checkpoint."""

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


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train one epoch via the CLI to produce a real checkpoint."""
    root = tmp_path_factory.mktemp("serve")
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    data = write_charades_style_dir(str(root / "data"), num_videos=4)
    cfg = root / "tiny.yml"
    cfg.write_text(TINY_CFG.format(ckpt=str(root / "ckpt"), data=data))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GLOVE_PATH"] = os.path.join(data, "glove/glove.6B.300d.txt")
    r = subprocess.run([sys.executable, os.path.join(REPO, "main.py"),
                        "--config_path", str(cfg)],
                       capture_output=True, text=True, env=env, cwd=str(root),
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return root, str(cfg), env["GLOVE_PATH"]


def test_localize_single_and_batch(trained):
    root, cfg_path, glove = trained
    from video_moment_localization_tpu.inference import MomentLocalizer

    old = os.getcwd()
    os.chdir(str(root))  # config paths are relative to the experiment dir
    try:
        loc = MomentLocalizer.from_checkpoint(cfg_path, glove_path=glove,
                                              serve_batch=4)
    finally:
        os.chdir(old)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((23, 32)).astype(np.float32)
    moments = loc.localize(feats, "person opens the door", duration=12.0, top_k=5)
    assert len(moments) == 5
    for m in moments:
        assert 0.0 <= m.start < m.end <= 12.0 + 1e-6
        assert 0.0 <= m.score <= 1.0
    # descending score order
    scores = [m.score for m in moments]
    assert scores == sorted(scores, reverse=True)

    # batching pads to serve_batch and preserves per-request results
    reqs = [(rng.standard_normal((int(n), 32)).astype(np.float32),
             "person picks up a cup", float(n) * 0.7)
            for n in (9, 30, 50, 14, 21)]  # 5 requests -> 2 chunks (4 + 1)
    out = loc.localize_batch(reqs, top_k=3)
    assert len(out) == 5 and all(len(ms) == 3 for ms in out)
    # single-request result matches the same request inside a batch
    solo = loc.localize(*reqs[0][:2], duration=reqs[0][2], top_k=3)
    assert [(m.start, m.end) for m in solo] == [(m.start, m.end) for m in out[0]]


def test_grouped_video_dedup_matches_plain(trained):
    """Repeated video arrays route through the grouped-video path (the
    encoder runs once per unique video, pairs gathered before the Hadamard
    fusion) and must match per-pair encoding to float tolerance."""
    root, cfg_path, glove = trained
    from video_moment_localization_tpu.inference import MomentLocalizer

    old = os.getcwd()
    os.chdir(str(root))
    try:
        loc = MomentLocalizer.from_checkpoint(cfg_path, glove_path=glove,
                                              serve_batch=8)
    finally:
        os.chdir(old)

    rng = np.random.default_rng(3)
    vids = [rng.standard_normal((int(n), 32)).astype(np.float32)
            for n in (17, 41)]
    queries = ["person opens the door", "someone sits down",
               "a cup is lifted", "person closes a laptop"]
    # 2 unique videos x 4 queries = 8 pairs -> G bucket 2 <= 8/2: grouped.
    reqs = [(v, q, 12.0) for v in vids for q in queries]
    grouped_out = loc.localize_batch(reqs, top_k=4)

    # Force the plain path by making every row's array a distinct object.
    reqs_plain = [(v.copy(), q, 12.0) for v in vids for q in queries]
    plain_out = loc.localize_batch(reqs_plain, top_k=4)

    for g_ms, p_ms in zip(grouped_out, plain_out):
        assert [(m.start, m.end) for m in g_ms] == \
               [(m.start, m.end) for m in p_ms]
        np.testing.assert_allclose([m.score for m in g_ms],
                                   [m.score for m in p_ms],
                                   rtol=1e-5, atol=1e-6)


def test_localize_with_soft_nms(trained):
    root, cfg_path, glove = trained
    from video_moment_localization_tpu.inference import MomentLocalizer

    old = os.getcwd()
    os.chdir(str(root))
    try:
        loc = MomentLocalizer.from_checkpoint(cfg_path, glove_path=glove,
                                              serve_batch=2, use_nms=True)
    finally:
        os.chdir(old)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((40, 32)).astype(np.float32)
    moments = loc.localize(feats, "person closes the window", duration=20.0, top_k=4)
    assert len(moments) == 4
    # soft-NMS suppresses heavy overlap among top selections: the top-2
    # moments must not be near-duplicates
    a, b = moments[0], moments[1]
    inter = max(0.0, min(a.end, b.end) - max(a.start, b.start))
    hull = max(a.end, b.end) - min(a.start, b.start)
    assert inter / hull < 0.99


def test_batch_buckets(trained):
    """Tail chunks pad to the nearest power-of-two bucket, and results are
    identical to the full-serve-batch padding."""
    root, cfg_path, glove = trained
    from video_moment_localization_tpu.inference import MomentLocalizer

    old = os.getcwd()
    os.chdir(str(root))
    try:
        loc = MomentLocalizer.from_checkpoint(cfg_path, glove_path=glove,
                                              serve_batch=8)
    finally:
        os.chdir(old)
    assert loc.bucket_sizes == [1, 2, 4, 8]
    assert loc._bucket_for(1) == 1 and loc._bucket_for(3) == 4
    assert loc._bucket_for(5) == 8 and loc._bucket_for(8) == 8

    rng = np.random.default_rng(2)
    reqs = [(rng.standard_normal((int(n), 32)).astype(np.float32),
             "person opens a door", float(n)) for n in (12, 25, 31)]
    out3 = loc.localize_batch(reqs, top_k=2)          # bucket 4
    out1 = [loc.localize_batch(reqs[i:i + 1], top_k=2)[0]  # bucket 1
            for i in range(3)]
    for a, b in zip(out3, out1):
        assert [(m.start, m.end) for m in a] == [(m.start, m.end) for m in b]


def test_async_localizer(trained):
    root, cfg_path, glove = trained
    from video_moment_localization_tpu.inference import (
        AsyncLocalizer,
        MomentLocalizer,
    )

    old = os.getcwd()
    os.chdir(str(root))
    try:
        loc = MomentLocalizer.from_checkpoint(cfg_path, glove_path=glove,
                                              serve_batch=4)
    finally:
        os.chdir(old)

    rng = np.random.default_rng(3)
    reqs = [(rng.standard_normal((int(n), 32)).astype(np.float32),
             "person sits down", float(n)) for n in (10, 20, 33, 17, 26)]
    sync = loc.localize_batch(reqs, top_k=3)

    with AsyncLocalizer(loc, top_k=3, max_wait_ms=20.0) as server:
        futures = [server.submit(*r) for r in reqs]
        results = [f.result(timeout=120) for f in futures]
    for a, b in zip(results, sync):
        assert [(m.start, m.end) for m in a] == [(m.start, m.end) for m in b]

    # closed server rejects new work
    with pytest.raises(RuntimeError, match="closed"):
        server.submit(*reqs[0])


def test_missing_checkpoint_raises(trained, tmp_path):
    root, cfg_path, glove = trained
    from video_moment_localization_tpu.inference import MomentLocalizer

    bad_cfg = tmp_path / "tiny.yml"
    bad_cfg.write_text(open(cfg_path).read().replace(
        str(root / "ckpt"), str(tmp_path / "missing")))
    with pytest.raises(FileNotFoundError, match="No saved model"):
        MomentLocalizer.from_checkpoint(str(bad_cfg), glove_path=glove)


def test_meshed_localizer_matches_single_device(trained):
    """Multi-chip serving (data mesh): identical moments to the
    single-device localizer — params replicated, batches sharded, the
    SPMD scorer needs no collectives (top-k is along the proposal axis)."""
    root, cfg_path, glove = trained
    import jax

    from video_moment_localization_tpu.inference import MomentLocalizer

    old = os.getcwd()
    os.chdir(str(root))
    try:
        solo = MomentLocalizer.from_checkpoint(cfg_path, glove_path=glove,
                                               serve_batch=8)
        meshed = MomentLocalizer.from_checkpoint(
            cfg_path, glove_path=glove, serve_batch=8,
            num_devices=jax.device_count())
    finally:
        os.chdir(old)
    assert meshed.mesh is not None and meshed.mesh.size == 8
    # buckets never drop below the device count (even shards per bucket)
    assert meshed.bucket_sizes == [8]

    rng = np.random.default_rng(7)
    reqs = [(rng.standard_normal((int(n), 32)).astype(np.float32),
             "person opens the door", float(n) * 0.5)
            for n in (9, 30, 50, 14, 21, 8, 40, 17, 26, 33)]  # 2 chunks: 8+2
    a = solo.localize_batch(reqs, top_k=4)
    b = meshed.localize_batch(reqs, top_k=4)
    assert len(a) == len(b) == len(reqs)
    for ms_a, ms_b in zip(a, b):
        assert [(m.start, m.end) for m in ms_a] == [(m.start, m.end) for m in ms_b]
        np.testing.assert_allclose([m.score for m in ms_a],
                                   [m.score for m in ms_b], atol=1e-6)


def test_meshed_localizer_validates_serve_batch(trained):
    root, cfg_path, glove = trained
    import jax

    from video_moment_localization_tpu.inference import MomentLocalizer

    old = os.getcwd()
    os.chdir(str(root))
    try:
        with pytest.raises(ValueError, match="multiple of the mesh size"):
            MomentLocalizer.from_checkpoint(
                cfg_path, glove_path=glove, serve_batch=6,
                num_devices=jax.device_count())
    finally:
        os.chdir(old)
