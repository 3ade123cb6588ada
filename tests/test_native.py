"""Native (C++) host-pipeline kernels: bit-parity with the NumPy path."""

import numpy as np
import pytest

from video_moment_localization_tpu.data import labels as np_labels
from video_moment_localization_tpu.data import native
from video_moment_localization_tpu.data.sampler import sample_fixed_length_features

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_generate_labels_matches_numpy():
    rng = np.random.default_rng(0)
    for L in (8, 16, 64):
        for _ in range(25):
            duration = float(rng.uniform(2, 300))
            spos = float(rng.uniform(0, duration * 0.8))
            epos = float(rng.uniform(spos + duration * 0.01, duration))
            sm, ym, ss, ys, se, ye, ya = native.generate_labels(spos, epos, duration, L)
            sm_r = np_labels.iou_target_map(spos, epos, duration, L)
            ss_r, se_r = np_labels.boundary_penalties(spos, epos, duration, L)
            ya_r = np_labels.snippet_labels(spos, epos, duration, L)
            np.testing.assert_allclose(sm, sm_r, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(ss, ss_r, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(se, se_r, rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(ya, ya_r)
            np.testing.assert_array_equal(ym, (sm_r > 0.5).astype(np.float32))
            np.testing.assert_array_equal(ys, (ss_r > 0.5).astype(np.float32))
            np.testing.assert_array_equal(ye, (se_r > 0.5).astype(np.float32))


def test_build_masks_matches_numpy():
    for T, L in ((64, 16), (128, 64), (16, 8)):
        for nfeats in (1, 3, T // 2, T - 1, T):
            vm, lm, mm = native.build_masks(nfeats, T, L)
            vm_r, lm_r, mm_r = np_labels.build_masks(nfeats, T, L)
            np.testing.assert_array_equal(vm, vm_r)
            np.testing.assert_array_equal(lm, lm_r)
            np.testing.assert_array_equal(mm, mm_r)


def test_sample_indices_matches_python_sampler():
    rng = np.random.default_rng(1)
    for _ in range(50):
        nfeats = int(rng.integers(2, 400))
        T = int(rng.choice([16, 64, 128]))
        s_n = float(rng.uniform(0, 0.7))
        e_n = float(rng.uniform(s_n + 0.05, 1.0))
        feat = np.arange(nfeats, dtype=np.float32)[:, None]
        out, nf, si, ei = sample_fixed_length_features(feat, T, s_n, e_n, train=False)
        got = native.sample_indices(nfeats, T, 0, s_n, e_n)
        assert got is not None
        idx, si_n, ei_n = got
        np.testing.assert_array_equal(idx, out[:nf, 0].astype(np.int32))
        assert (si_n, ei_n) == (si, ei), (nfeats, T, s_n, e_n)


def test_dataset_uses_native_labels_transparently():
    """End-to-end sample() content is identical with native on vs off."""
    import importlib

    from video_moment_localization_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(num_videos=3, T=16, L=8, max_query_length=6,
                          input_video_dim=12, split="test")
    s_native = ds.sample(1)
    # force fallback
    old = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        s_np = ds.sample(1)
    finally:
        native._lib, native._tried = old
    for k in ("sm", "ym", "ss", "ys", "se", "ye", "ya",
              "video_mask", "length_mask", "moment_mask"):
        np.testing.assert_allclose(s_native[k], s_np[k], rtol=1e-6, atol=1e-6), k
