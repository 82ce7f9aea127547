"""ctypes bindings for the native host-side ray sampler (csrc/raysampler.cpp).

Auto-compiles the shared library on first use (g++ -O3 -shared); every entry
point has a numpy fallback, so the framework works without a toolchain — the
native path is a performance feature for large host-resident datasets
(DyNeRF ISG/IST sampling over multi-million-entry weight maps).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "raysampler.cpp")


def _load_library():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.abspath(_SRC)
        so = os.path.join(os.path.dirname(src), "libraysampler.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _LIB = False
            return False

        lib.cednerf_build_cdf.restype = ctypes.c_double
        lib.cednerf_build_cdf.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.cednerf_sample_rays.restype = None
        lib.cednerf_sample_rays.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,  # images, n, h, w, c
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # c2w, K, t
            ctypes.c_void_p, ctypes.c_int64,  # cdf, subsample
            ctypes.c_void_p, ctypes.c_int,  # bkgd, opengl
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int,  # n_rays, seed, threads
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
        return lib


def available() -> bool:
    return bool(_load_library())


_WLIB = None
_WSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                     "weights.cpp")


def _load_weights_library():
    """csrc/weights.cpp — native ISG/IST weight precompute (same
    auto-compile + numpy-fallback contract as the ray sampler)."""
    global _WLIB
    with _LIB_LOCK:
        if _WLIB is not None:
            return _WLIB
        src = os.path.abspath(_WSRC)
        so = os.path.join(os.path.dirname(src), "libweights.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _WLIB = False
            return False
        i64, f32, i32 = ctypes.c_int64, ctypes.c_float, ctypes.c_int
        vp = ctypes.c_void_p
        lib.cednerf_median_images.restype = None
        lib.cednerf_median_images.argtypes = [vp, i64, i64, i64, i32, vp]
        lib.cednerf_isg_weights.restype = None
        lib.cednerf_isg_weights.argtypes = [vp, vp, i64, i64, i64, f32,
                                            i32, vp]
        lib.cednerf_ist_weights.restype = None
        lib.cednerf_ist_weights.argtypes = [vp, i64, i64, i64, f32, i64,
                                            i32, vp]
        _WLIB = lib
        return lib


def native_median_images(imgs, n_cams: int, n_threads: int = 8):
    """[n_cams*n_frames, h, w, 3] uint8 -> [n_cams, h, w, 3] uint8 temporal
    medians (numpy .astype(uint8) semantics), or None without a toolchain."""
    lib = _load_weights_library()
    n, h, w, _ = imgs.shape
    n_frames = n // n_cams
    if not lib or n_frames > 4096:
        return None
    imgs = np.ascontiguousarray(imgs, np.uint8)
    out = np.empty((n_cams, h, w, 3), np.uint8)
    lib.cednerf_median_images(
        imgs.ctypes.data_as(ctypes.c_void_p), n_cams, n_frames, h * w,
        n_threads, out.ctypes.data_as(ctypes.c_void_p))
    return out


def native_isg_weights(imgs, median_imgs, gamma: float, n_threads: int = 8):
    """Native ISG weights [n_cams, n_frames, h, w] f32, or None."""
    lib = _load_weights_library()
    if not lib:
        return None
    n, h, w, _ = imgs.shape
    n_cams = median_imgs.shape[0]
    imgs = np.ascontiguousarray(imgs, np.uint8)
    median_imgs = np.ascontiguousarray(median_imgs, np.uint8)
    out = np.empty((n_cams, n // n_cams, h, w), np.float32)
    lib.cednerf_isg_weights(
        imgs.ctypes.data_as(ctypes.c_void_p),
        median_imgs.ctypes.data_as(ctypes.c_void_p),
        n_cams, n // n_cams, h * w, gamma, n_threads,
        out.ctypes.data_as(ctypes.c_void_p))
    return out


def native_ist_weights(imgs, n_cams: int, alpha: float, frame_shift: int,
                       n_threads: int = 8):
    """Native IST weights [n_cams, n_frames, h, w] f32, or None."""
    lib = _load_weights_library()
    if not lib:
        return None
    n, h, w, _ = imgs.shape
    imgs = np.ascontiguousarray(imgs, np.uint8)
    out = np.empty((n_cams, n // n_cams, h, w), np.float32)
    lib.cednerf_ist_weights(
        imgs.ctypes.data_as(ctypes.c_void_p), n_cams, n // n_cams, h * w,
        alpha, frame_shift, n_threads,
        out.ctypes.data_as(ctypes.c_void_p))
    return out


def build_cdf(weights: np.ndarray) -> np.ndarray:
    """Inclusive prefix-sum CDF of a weight map (normalized)."""
    weights = np.ascontiguousarray(weights.reshape(-1), np.float32)
    lib = _load_library()
    if not lib:
        cdf = np.cumsum(weights, dtype=np.float64)
        return cdf / cdf[-1]
    cdf = np.empty(weights.shape[0], np.float64)
    lib.cednerf_build_cdf(
        weights.ctypes.data_as(ctypes.c_void_p), weights.shape[0],
        cdf.ctypes.data_as(ctypes.c_void_p),
    )
    return cdf


class NativeRaySampler:
    """Multithreaded pinhole ray-batch sampler over a host image stack.

    images: [N, H, W, 3|4] uint8; c2w: [N, 3, 4]; K: [3, 3];
    timestamps: [N]. Optional `weights` (possibly `subsample`x coarser than
    the images) switch from uniform pixel draws to inverse-CDF importance
    sampling with block expansion (the ISG/IST scheme).
    """

    def __init__(self, images, c2w, K, timestamps, opengl_camera: bool,
                 weights=None, subsample: int = 1, n_threads: int = 8,
                 seed: int = 0):
        self.images = np.ascontiguousarray(images, np.uint8)
        self.c2w = np.ascontiguousarray(
            np.asarray(c2w, np.float32).reshape(len(images), 12))
        self.K = np.ascontiguousarray(np.asarray(K, np.float32).reshape(9))
        self.timestamps = np.ascontiguousarray(
            np.asarray(timestamps, np.float32).reshape(-1))
        self.opengl = opengl_camera
        self.subsample = subsample if weights is not None else 1
        self.cdf = build_cdf(weights) if weights is not None else None
        self.n_threads = n_threads
        self._seed = seed
        self._lib = _load_library()

    def sample(self, n_rays: int, bkgd=None):
        """Returns (origins, viewdirs, pixels, timestamps) numpy arrays."""
        self._seed += 1
        n, h, w, c = self.images.shape
        if not self._lib:
            return self._sample_numpy(n_rays, bkgd)
        origins = np.empty((n_rays, 3), np.float32)
        viewdirs = np.empty((n_rays, 3), np.float32)
        pixels = np.empty((n_rays, 3), np.float32)
        ts = np.empty((n_rays,), np.float32)
        bkgd_arr = (np.ascontiguousarray(bkgd, np.float32)
                    if bkgd is not None else None)
        self._lib.cednerf_sample_rays(
            self.images.ctypes.data_as(ctypes.c_void_p), n, h, w, c,
            self.c2w.ctypes.data_as(ctypes.c_void_p),
            self.K.ctypes.data_as(ctypes.c_void_p),
            self.timestamps.ctypes.data_as(ctypes.c_void_p),
            self.cdf.ctypes.data_as(ctypes.c_void_p) if self.cdf is not None else None,
            self.subsample,
            bkgd_arr.ctypes.data_as(ctypes.c_void_p) if bkgd_arr is not None else None,
            int(self.opengl), n_rays, self._seed, self.n_threads,
            origins.ctypes.data_as(ctypes.c_void_p),
            viewdirs.ctypes.data_as(ctypes.c_void_p),
            pixels.ctypes.data_as(ctypes.c_void_p),
            ts.ctypes.data_as(ctypes.c_void_p),
        )
        return origins, viewdirs, pixels, ts

    # ------------------------- numpy fallback ------------------------- #

    def _sample_numpy(self, n_rays, bkgd):
        from .rays import pinhole_rays

        rng = np.random.default_rng(self._seed)
        n, h, w, c = self.images.shape
        if self.cdf is not None:
            sub = self.subsample
            draws = n_rays // (sub * sub)
            u = rng.random(draws)
            idx = np.searchsorted(self.cdf, u, side="right")
            idx = np.minimum(idx, len(self.cdf) - 1)
            hsub, wsub = h // sub, w // sub
            im = idx // (hsub * wsub)
            ys = (idx % (hsub * wsub)) // wsub
            xs = (idx % (hsub * wsub)) % wsub
            img_id = np.tile(im, sub * sub)
            x = np.concatenate([xs * sub + aw for ah in range(sub) for aw in range(sub)])
            y = np.concatenate([ys * sub + ah for ah in range(sub) for aw in range(sub)])
        else:
            img_id = rng.integers(0, n, n_rays)
            x = rng.integers(0, w, n_rays)
            y = rng.integers(0, h, n_rays)
        rgba = self.images[img_id, y, x].astype(np.float32) / 255.0
        c2w = self.c2w.reshape(-1, 3, 4)[img_id]
        origins, viewdirs, _ = pinhole_rays(
            x.astype(np.float32), y.astype(np.float32), self.K.reshape(3, 3),
            c2w, self.opengl)
        if c == 4 and bkgd is not None:
            pixels = rgba[:, :3] * rgba[:, 3:] + np.asarray(bkgd) * (1 - rgba[:, 3:])
        else:
            pixels = rgba[:, :3]
        return origins, viewdirs, pixels.astype(np.float32), self.timestamps[img_id]
