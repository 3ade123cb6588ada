"""Data-layer unit tests: tokenizer, embeddings, sampler, labels, datasets,
pipeline. All hermetic (synthetic fixtures, no downloads)."""

import math

import numpy as np
import pytest

from video_moment_localization_tpu.data import (
    BatchLoader,
    CharadesSTA,
    WordEmbedding,
    boundary_penalties,
    build_masks,
    get_tokens,
    iou_target_map,
    sample_fixed_length_features,
    snippet_labels,
)
from video_moment_localization_tpu.data.synthetic import (
    SyntheticDataset,
    synthetic_embedding,
    write_charades_style_dir,
)


# --------------------------------------------------------------------- #
# Tokenizer
# --------------------------------------------------------------------- #
def test_tokenizer_lowercase_punct_split():
    assert get_tokens("A person, opens the DOOR!") == [
        "a", "person", "opens", "the", "door",
    ]
    assert get_tokens("  spaced   out  ") == ["spaced", "out"]
    assert get_tokens("don't-stop") == ["dontstop"]


# --------------------------------------------------------------------- #
# Word embedding
# --------------------------------------------------------------------- #
def test_embedding_unk_pad_semantics():
    emb = synthetic_embedding(dim=8)
    ids, feats = emb.encode(["person", "zzz_oov", "door"], max_length=5)
    assert ids.shape == (5,) and feats.shape == (5, 8)
    assert ids[1] == emb.unk_id
    assert ids[3] == emb.pad_id and ids[4] == emb.pad_id
    # unk and pad both embed to zero vectors
    assert np.all(feats[1] == 0) and np.all(feats[3] == 0)
    # mask: real words AND unk are valid; pad is not
    mask = emb.query_mask(ids)
    np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0])


def test_embedding_text_roundtrip(tmp_path):
    path = str(tmp_path / "glove.txt")
    with open(path, "w") as f:
        f.write("hello 1.0 2.0 3.0\nworld -1.0 0.5 0.25\n")
    emb = WordEmbedding.from_text(path)
    ids, feats = emb.encode(["world", "hello"], max_length=3)
    np.testing.assert_allclose(feats[0], [-1.0, 0.5, 0.25])
    np.testing.assert_allclose(feats[1], [1.0, 2.0, 3.0])
    # npz cache created and loads identically
    emb2 = WordEmbedding.load(path + ".npz")
    np.testing.assert_array_equal(emb2.vectors, emb.vectors)


# --------------------------------------------------------------------- #
# Sampler
# --------------------------------------------------------------------- #
def test_sampler_eval_long_video():
    feat = np.arange(10, dtype=np.float32)[:, None]  # identify frames by value
    out, nfeats, si, ei = sample_fixed_length_features(
        feat, T=4, start_pos_n=0.5, end_pos_n=0.9, train=False
    )
    # stride 2.5 -> indices round(arange(0, 9.5, 2.5)) = [0, 2, 5, 8]
    np.testing.assert_array_equal(out[:, 0], [0, 2, 5, 8])
    assert nfeats == 4
    assert si == 1  # start 4.5 falls in [2, 5)
    assert ei == 3  # end 8.1 beyond last gap -> default T-1


def test_sampler_short_video_pads():
    feat = np.arange(3, dtype=np.float32)[:, None]
    out, nfeats, si, ei = sample_fixed_length_features(
        feat, T=8, start_pos_n=0.0, end_pos_n=1.0, train=False
    )
    assert nfeats == 3
    np.testing.assert_array_equal(out[:3, 0], [0, 1, 2])
    np.testing.assert_array_equal(out[3:, 0], 0)


def test_sampler_train_jitter_bounded_and_reproducible():
    feat = np.random.default_rng(0).standard_normal((25, 4)).astype(np.float32)
    # stride 25/4 = 6.25 -> random_end 5.75 -> spos in [0, 5]
    seen = set()
    for k in range(50):
        rng = np.random.default_rng(k)
        out, nfeats, _, _ = sample_fixed_length_features(
            feat, T=4, start_pos_n=0.1, end_pos_n=0.9, train=True, rng=rng
        )
        assert nfeats == 4
        first = np.where((feat == out[0]).all(axis=1))[0][0]
        seen.add(int(first))
    assert seen <= set(range(6)) and len(seen) > 1
    # same rng seed -> identical sample
    a, *_ = sample_fixed_length_features(feat, 4, 0.1, 0.9, True, np.random.default_rng(7))
    b, *_ = sample_fixed_length_features(feat, 4, 0.1, 0.9, True, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)


def test_sampler_integral_random_end_shrinks():
    # stride 2.5 -> random_end 2.0 is integral -> shrinks to 1.0 -> spos in {0, 1}
    feat = np.arange(10, dtype=np.float32)[:, None]
    seen = set()
    for k in range(40):
        out, *_ = sample_fixed_length_features(
            feat, 4, 0.0, 1.0, True, np.random.default_rng(k)
        )
        seen.add(int(out[0, 0]))
    assert seen <= {0, 1}


# --------------------------------------------------------------------- #
# Labels
# --------------------------------------------------------------------- #
def test_iou_map_hand_case():
    # L=4, duration 4, GT [1, 3]
    ious = iou_target_map(1.0, 3.0, 4.0, L=4)
    assert ious.shape == (4, 4)
    assert ious[1, 2] == pytest.approx(1.0)          # exact match [1,3]
    assert ious[0, 3] == pytest.approx(0.5)          # [0,4]: inter 2, hull 4
    assert ious[0, 0] == pytest.approx(0.0)          # [0,1] touches at 1
    assert ious[2, 1] == pytest.approx(0.0)          # inverted span
    # hull-union (not true union): [2,4] vs [1,3]: inter 1, hull 3
    assert ious[2, 3] == pytest.approx(1.0 / 3.0)


def test_boundary_gaussians_hand_case():
    s_s, s_e = boundary_penalties(1.0, 3.0, 4.0, L=4)
    sigma = 2.0 / 5.0
    assert s_s[1] == pytest.approx(1.0)              # s_times[1] == tau_s
    assert s_e[2] == pytest.approx(1.0)              # e_times[2] == tau_e
    assert s_s[0] == pytest.approx(math.exp(-1.0 / (2 * sigma**2)))
    assert np.all(s_s <= 1.0) and np.all(s_e <= 1.0)


def test_snippet_labels_hand_case():
    ya = snippet_labels(1.0, 3.0, 4.0, L=4)
    np.testing.assert_array_equal(ya, [0, 1, 1, 0])


def test_masks():
    video_mask, length_mask, moment_mask = build_masks(nfeats=10, T=16, L=8)
    assert video_mask.shape == (16, 1) and video_mask.sum() == 10
    # ceil(10 / (16/8)) = 5 valid snippets
    np.testing.assert_array_equal(length_mask, [1, 1, 1, 1, 1, 0, 0, 0])
    assert moment_mask.shape == (8, 8)
    assert moment_mask[0, 4] == 1 and moment_mask[4, 4] == 1
    assert moment_mask[4, 0] == 0          # lower triangle
    assert moment_mask[0, 5] == 0          # beyond valid length
    assert moment_mask.sum() == 15         # upper triangle of 5x5


# --------------------------------------------------------------------- #
# Datasets + pipeline
# --------------------------------------------------------------------- #
def test_synthetic_dataset_sample_shapes():
    ds = SyntheticDataset(num_videos=3, T=16, L=8, max_query_length=6, input_video_dim=12)
    s = ds.sample(0, np.random.default_rng(0))
    assert s["video_features"].shape == (16, 12)
    assert s["query_features"].shape == (6, 300)
    assert s["query_mask"].shape == (6, 1)
    assert s["sm"].shape == (8, 8) and s["moment_mask"].shape == (8, 8)
    for k in ("ss", "ys", "se", "ye", "ya", "length_mask"):
        assert s[k].shape == (8,)
    # labels consistent: ym = sm > 0.5
    np.testing.assert_array_equal(s["ym"], (s["sm"] > 0.5).astype(np.float32))


def test_charades_reader_on_disk(tmp_path):
    root = write_charades_style_dir(str(tmp_path / "charades"), num_videos=4)
    emb = WordEmbedding.from_text(str(tmp_path / "charades/glove/glove.6B.300d.txt"))
    ds = CharadesSTA(root, T=16, L=8, max_query_length=6, split="train", embedding=emb)
    assert len(ds) == 8
    s = ds.sample(0, np.random.default_rng(0))
    assert s["video_features"].shape == (16, 32)
    assert 0 <= s["start_pos"] < s["end_pos"] <= 1.0


def test_batch_loader_fixed_shapes_and_padding():
    ds = SyntheticDataset(num_videos=5, queries_per_video=1, T=16, L=8,
                          max_query_length=6, input_video_dim=12)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=3)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["video_features"].shape == (2, 16, 12)
        assert b["moment_mask"].shape == (2, 8, 8)
    # last batch padded: one real sample
    np.testing.assert_array_equal(batches[-1]["sample_mask"], [1, 0])
    assert np.all(batches[-1]["video_features"][1] == 0)


def test_batch_loader_deterministic_across_runs():
    ds = SyntheticDataset(num_videos=6, T=16, L=8, max_query_length=6, input_video_dim=12)
    l1 = BatchLoader(ds, 4, shuffle=True, num_workers=3, seed=9)
    l2 = BatchLoader(ds, 4, shuffle=True, num_workers=1, seed=9)
    for b1, b2 in zip(l1.epoch(2), l2.epoch(2)):
        np.testing.assert_array_equal(b1["video_features"], b2["video_features"])
        assert b1["video_id"] == b2["video_id"]
    # different epoch -> different order (with overwhelming probability)
    first1 = next(iter(l1.epoch(0)))
    first2 = next(iter(l1.epoch(1)))
    assert first1["video_id"] != first2["video_id"]
