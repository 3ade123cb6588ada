"""Partial feature reads (only sampled rows) must produce samples identical
to full-video loads, for every reader."""

import numpy as np
import pytest

from video_moment_localization_tpu.data.datasets import (
    ActivityNet,
    CharadesSTA,
    MomentDataset,
    TACoS,
)
from video_moment_localization_tpu.data.glove import WordEmbedding
from video_moment_localization_tpu.data.synthetic import (
    write_activitynet_style_dir,
    write_charades_style_dir,
    write_tacos_style_dir,
)


def _compare_partial_vs_full(ds, n=6):
    for index in range(min(n, len(ds))):
        rng1 = np.random.default_rng(index)
        rng2 = np.random.default_rng(index)
        partial = ds.sample(index, rng1)
        # Force the base-class full-load path for the same sample.
        full_src = lambda vid: MomentDataset._video_source(ds, vid)  # noqa: E731
        orig = ds._video_source
        ds._video_source = full_src
        try:
            full = ds.sample(index, rng2)
        finally:
            ds._video_source = orig
        np.testing.assert_array_equal(partial["video_features"],
                                      full["video_features"])
        np.testing.assert_array_equal(partial["video_mask"], full["video_mask"])


def test_charades_partial_io_matches_full(tmp_path):
    root = write_charades_style_dir(str(tmp_path / "c"), num_videos=4)
    emb = WordEmbedding.from_text(str(tmp_path / "c/glove/glove.6B.300d.txt"))
    ds = CharadesSTA(root, T=16, L=8, max_query_length=6, split="train",
                     embedding=emb)
    _compare_partial_vs_full(ds)


def test_activitynet_partial_io_matches_full(tmp_path):
    pytest.importorskip("h5py")
    root = write_activitynet_style_dir(str(tmp_path / "a"), num_videos=4)
    emb = WordEmbedding.from_text(str(tmp_path / "a/glove/glove.6B.300d.txt"))
    ds = ActivityNet(root, T=16, L=8, max_query_length=6, split="train",
                     embedding=emb)
    _compare_partial_vs_full(ds)


def test_tacos_partial_io_matches_full(tmp_path):
    pytest.importorskip("h5py")
    root = write_tacos_style_dir(str(tmp_path / "t"), num_videos=4)
    emb = WordEmbedding.from_text(str(tmp_path / "t/glove/glove.6B.300d.txt"))
    ds = TACoS(root, T=16, L=8, max_query_length=6, split="val", embedding=emb)
    _compare_partial_vs_full(ds)
