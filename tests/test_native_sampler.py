"""Native (C++) ray-sampler tests: compiles, matches the numpy ray math,
respects importance weights, and is deterministic per seed."""

import numpy as np
import pytest

from cednerf_tpu.datasets import native
from cednerf_tpu.datasets.rays import pinhole_rays


def make_stack(n=4, wh=32, channels=4, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (n, wh, wh, channels), dtype=np.uint8)
    c2w = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        c2w[i, :3, :3] = np.eye(3)
        c2w[i, :, 3] = [0.1 * i, 0, -3]
    K = np.array([[wh * 1.2, 0, wh / 2], [0, wh * 1.2, wh / 2], [0, 0, 1]],
                 np.float32)
    t = np.linspace(0, 1, n).astype(np.float32)
    return images, c2w, K, t


def test_native_library_compiles():
    assert native.available(), "g++ build of csrc/raysampler.cpp failed"


def test_build_cdf():
    w = np.asarray([1.0, 3.0, 0.0, 4.0], np.float32)
    cdf = native.build_cdf(w)
    np.testing.assert_allclose(cdf, [0.125, 0.5, 0.5, 1.0], atol=1e-9)


def test_ray_math_matches_numpy():
    images, c2w, K, t = make_stack()
    s = native.NativeRaySampler(images, c2w, K, t, opengl_camera=True, seed=7)
    origins, viewdirs, pixels, ts = s.sample(256, bkgd=np.ones(3, np.float32))
    assert origins.shape == (256, 3)
    np.testing.assert_allclose(np.linalg.norm(viewdirs, axis=-1), 1.0, atol=1e-5)
    # recover (img, x, y) from origins and re-derive rays with the host path
    img_id = np.round(origins[:, 0] / 0.1).astype(int)
    assert ((img_id >= 0) & (img_id < 4)).all()
    # cross-check: viewdirs must match SOME pixel of that camera; verify by
    # projecting the dir back through the camera model
    # (dir_cam = R^T d since R is identity here)
    z = viewdirs[:, 2]
    assert (z < 0).all()  # OpenGL forward is -z
    x_ndc = viewdirs[:, 0] / -z
    y_ndc = viewdirs[:, 1] / z  # y sign flip
    px = x_ndc * K[0, 0] + K[0, 2] - 0.5
    py = y_ndc * K[1, 1] + K[1, 2] - 0.5
    np.testing.assert_allclose(px, np.round(px), atol=1e-3)
    np.testing.assert_allclose(py, np.round(py), atol=1e-3)
    x = np.round(px).astype(int)
    y = np.round(py).astype(int)
    rgba = images[img_id, y, x].astype(np.float32) / 255.0
    want = rgba[:, :3] * rgba[:, 3:] + 1.0 * (1 - rgba[:, 3:])
    np.testing.assert_allclose(pixels, want, atol=1e-5)
    np.testing.assert_allclose(ts, t[img_id], atol=1e-7)
    # matches the reference pinhole generator exactly
    o2, d2, _ = pinhole_rays(x.astype(np.float32), y.astype(np.float32), K,
                             c2w[img_id], True)
    np.testing.assert_allclose(origins, o2, atol=1e-6)
    np.testing.assert_allclose(viewdirs, d2, atol=1e-5)


def test_importance_sampling_concentrates():
    images, c2w, K, t = make_stack(wh=16)
    w = np.full((4, 16, 16), 1e-9, np.float32)
    w[2, 4:8, 4:8] = 1.0
    s = native.NativeRaySampler(images, c2w, K, t, opengl_camera=True,
                                weights=w, subsample=1, seed=3)
    origins, viewdirs, pixels, ts = s.sample(512)
    img_id = np.round(origins[:, 0] / 0.1).astype(int)
    assert (img_id == 2).mean() > 0.99
    np.testing.assert_allclose(ts, t[2], atol=1e-6)


def test_subsample_block_expansion():
    images, c2w, K, t = make_stack(wh=16)
    # weights at 2x coarser resolution, all mass at coarse pixel (1, 1)
    w = np.full((4, 8, 8), 1e-12, np.float32)
    w[1, 1, 1] = 1.0
    s = native.NativeRaySampler(images, c2w, K, t, opengl_camera=True,
                                weights=w, subsample=2, seed=4)
    origins, viewdirs, pixels, ts = s.sample(64)
    img_id = np.round(origins[:, 0] / 0.1).astype(int)
    assert (img_id == 1).all()


def test_deterministic_per_seed():
    images, c2w, K, t = make_stack()
    s1 = native.NativeRaySampler(images, c2w, K, t, True, seed=5)
    s2 = native.NativeRaySampler(images, c2w, K, t, True, seed=5)
    a = s1.sample(64)
    b = s2.sample(64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
