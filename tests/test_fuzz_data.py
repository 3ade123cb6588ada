"""Fuzz the host data layer over extreme inputs: outputs must always be
finite, in-range, and shape-correct (no NaN/Inf, no crashes)."""

import numpy as np

from video_moment_localization_tpu.data import labels, native
from video_moment_localization_tpu.data.sampler import sample_fixed_length_features


def test_sampler_fuzz_extremes():
    rng = np.random.default_rng(0)
    cases = [(1, 16), (2, 16), (3, 128), (16, 16), (17, 16), (1000, 64),
             (129, 128), (4096, 128)]
    for nfeats, T in cases:
        feat = rng.standard_normal((nfeats, 3)).astype(np.float32)
        for train in (False, True):
            for _ in range(5):
                s = float(rng.uniform(0, 0.95))
                e = float(rng.uniform(s + 1e-4, 1.0))
                out, nc, si, ei = sample_fixed_length_features(
                    feat, T, s, e, train, np.random.default_rng(1))
                assert out.shape == (T, 3) and np.isfinite(out).all()
                assert 1 <= nc <= min(nfeats, T)
                assert 0 <= si < T and 0 <= ei < T


def test_labels_fuzz_extremes():
    rng = np.random.default_rng(1)
    for L in (8, 16, 64):
        for _ in range(40):
            duration = float(rng.uniform(0.2, 10_000))
            spos = float(rng.uniform(0, duration * 0.999))
            # include near-degenerate spans (tiny sigma in the Gaussians)
            epos = min(duration, spos + float(rng.uniform(1e-3, duration)))
            if spos >= epos:
                continue
            sm = labels.iou_target_map(spos, epos, duration, L)
            ss, se = labels.boundary_penalties(spos, epos, duration, L)
            ya = labels.snippet_labels(spos, epos, duration, L)
            for arr, hi in ((sm, 1.0), (ss, 1.0), (se, 1.0), (ya, 1.0)):
                assert np.isfinite(arr).all()
                assert (arr >= 0).all() and (arr <= hi + 1e-6).all()
            # Native path agreement. Tolerance note: at extreme magnitudes
            # (duration ~1e4) the fp32 Gaussian exponent goes through
            # different libm exp implementations (C vs numpy SIMD); observed
            # worst case ~1.5e-4 relative — pure ULP noise, not semantics.
            if native.available():
                n_sm, _, n_ss, _, n_se, _, n_ya = native.generate_labels(
                    spos, epos, duration, L)
                np.testing.assert_allclose(n_sm, sm, rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(n_ss, ss, rtol=5e-4, atol=1e-5)
                np.testing.assert_allclose(n_se, se, rtol=5e-4, atol=1e-5)
                np.testing.assert_array_equal(n_ya, ya)


def test_masks_fuzz_extremes():
    for T, L in ((16, 8), (128, 64), (64, 16)):
        for nfeats in (1, 2, T // 3, T - 1, T):
            vm, lm, mm = labels.build_masks(nfeats, T, L)
            assert vm.sum() == nfeats
            assert lm.sum() >= 1
            assert (np.tril(mm, -1) == 0).all()
