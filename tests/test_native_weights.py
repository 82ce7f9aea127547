"""Native ISG/IST weight kernels (csrc/weights.cpp) vs the numpy math."""

import numpy as np
import pytest

from cednerf_tpu.datasets import native
from cednerf_tpu.datasets.dynerf import isg_weights, ist_weights

pytestmark = pytest.mark.skipif(
    not native._load_weights_library(), reason="no native toolchain")

RNG = np.random.default_rng(0)
N_CAMS, N_FRAMES, H, W = 3, 6, 12, 17
IMGS = RNG.integers(0, 256, (N_CAMS * N_FRAMES, H, W, 3), np.uint8)


def test_median_images_matches_numpy():
    ref = np.median(
        IMGS.reshape(N_CAMS, N_FRAMES, H, W, 3), axis=1).astype(np.uint8)
    got = native.native_median_images(IMGS, N_CAMS)
    np.testing.assert_array_equal(got, ref)


def test_median_images_odd_frames():
    imgs = IMGS[:N_CAMS * 5]
    ref = np.median(
        imgs.reshape(N_CAMS, 5, H, W, 3), axis=1).astype(np.uint8)
    got = native.native_median_images(imgs, N_CAMS)
    np.testing.assert_array_equal(got, ref)


def test_isg_weights_match():
    med = np.median(
        IMGS.reshape(N_CAMS, N_FRAMES, H, W, 3), axis=1).astype(np.uint8)
    ref = isg_weights(IMGS, med, gamma=2e-2)
    got = native.native_isg_weights(IMGS, med, gamma=2e-2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_ist_weights_match():
    for shift in (2, 25):  # 25 > n_frames-1 exercises the clamp
        ref = ist_weights(IMGS, N_CAMS, alpha=0.1, frame_shift=shift)
        got = native.native_ist_weights(IMGS, N_CAMS, alpha=0.1,
                                        frame_shift=shift)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
