"""Device-side ray-batch samplers.

The reference samples rays on the host every step (dnerf_synthetic.py
fetch_data). TPU-natively, datasets that fit HBM live there as uint8 image
stacks + pose tensors, and batch sampling happens *inside* the jitted train
program — which enables scanning multiple train steps per dispatch
(engine/train.py make_train_loop) so host round-trip latency amortizes.

A device sampler is `sample_fn(data, key, n_rays) -> batch dict` where `data`
is a pytree of device arrays and batch has origins/viewdirs/pixels/
timestamps/color_bkgd.
"""

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def pinhole_rays_device(x, y, K, c2w, opengl_camera: bool):
    """Device version of datasets.rays.pinhole_rays (x, y float [N])."""
    sign = -1.0 if opengl_camera else 1.0
    camera_dirs = jnp.stack(
        [
            (x - K[0, 2] + 0.5) / K[0, 0],
            (y - K[1, 2] + 0.5) / K[1, 1] * sign,
            jnp.full_like(x, sign),
        ],
        axis=-1,
    )
    directions = (camera_dirs[:, None, :] * c2w[:, :3, :3]).sum(-1)
    origins = jnp.broadcast_to(c2w[:, :3, -1], directions.shape)
    viewdirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    return origins, viewdirs


def _bkgd_device(key, aug: str):
    if aug == "random":
        return jax.random.uniform(key, (3,))
    if aug == "black":
        return jnp.zeros(3)
    return jnp.ones(3)


def make_image_stack_sampler(opengl_camera: bool, bkgd_aug: str,
                             has_alpha: bool) -> Callable:
    """Sampler over data = {images [N,H,W,C] uint8, camtoworlds [N,3,4],
    K [3,3], timestamps [N]} (pinhole cameras).

    Reproduces the DNeRF loader's (image, x, y)-independent sampling +
    background compositing (dnerf_synthetic.py:169-242) on device.
    """

    def sample(data, key, n_rays: int, i=None):
        images = data["images"]
        n, h, w = images.shape[:3]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img_id = jax.random.randint(k1, (n_rays,), 0, n)
        x = jax.random.randint(k2, (n_rays,), 0, w)
        y = jax.random.randint(k3, (n_rays,), 0, h)
        rgba = images[img_id, y, x].astype(jnp.float32) / 255.0
        origins, viewdirs = pinhole_rays_device(
            x.astype(jnp.float32), y.astype(jnp.float32),
            data["K"], data["camtoworlds"][img_id], opengl_camera,
        )
        bkgd = _bkgd_device(k4, bkgd_aug)
        if has_alpha:
            pixels = rgba[:, :3] * rgba[:, 3:] + bkgd * (1.0 - rgba[:, 3:])
        else:
            pixels = rgba[:, :3]
        return {
            "origins": origins,
            "viewdirs": viewdirs,
            "pixels": pixels,
            "timestamps": data["timestamps"][img_id].reshape(-1, 1),
            "color_bkgd": bkgd,
        }

    return sample


def make_stacked_sampler() -> Callable:
    """Sampler over HOST-assembled stacked batches.

    `data` is a batch dict whose leaves carry a leading steps-per-call dim
    ([K, n_rays, ...] rays, [K, 3] backgrounds); scan step `i` slices row i.
    Used for datasets whose sampling must stay on the host (DyNeRF's
    multinomial over multi-GB weight maps) — the Trainer assembles the next
    chunk's K batches while the device runs the current chunk, so host
    sampling overlaps device compute instead of serializing with it
    (reference equivalent: dnerf_3d_video_IS fetch_data each step).
    """

    def sample(data, key, n_rays: int, i):
        del key, n_rays
        return jax.tree_util.tree_map(lambda v: v[i], data)

    return sample


def make_hyper_sampler(bkgd_aug: str) -> Callable:
    """Sampler over data = {images [N,H,W,3] u8, local_dirs [C,H,W,3] f32,
    orientations [N,3,3], positions [N,3], timestamps [N], cam_group [N] i32}.

    Reproduces the HyperNeRF host sampler (hypernerf.py:456-461 semantics:
    ONE random image per batch, num_rays random pixels from it) with the
    distortion camera's pixel->local-ray map precomputed per *physical*
    camera (the Newton undistortion hoists to load time; world dirs are
    local @ orientation, camera.py pixels_to_rays).
    """

    def sample(data, key, n_rays: int, i=None):
        images = data["images"]
        n, h, w = images.shape[:3]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img = jax.random.randint(k1, (), 0, n)
        x = jax.random.randint(k2, (n_rays,), 0, w)
        y = jax.random.randint(k3, (n_rays,), 0, h)
        g = data["cam_group"][img]
        local = data["local_dirs"][g, y, x]
        world = local @ data["orientations"][img]
        viewdirs = world / jnp.linalg.norm(world, axis=-1, keepdims=True)
        origins = jnp.broadcast_to(data["positions"][img], viewdirs.shape)
        pixels = images[img, y, x].astype(jnp.float32) / 255.0
        return {
            "origins": origins,
            "viewdirs": viewdirs,
            "pixels": pixels,
            "timestamps": jnp.full((n_rays, 1), data["timestamps"][img]),
            "color_bkgd": _bkgd_device(k4, bkgd_aug),
        }

    return sample


def hypernerf_device_data(dataset) -> Optional[Tuple[dict, Callable]]:
    """Put a HyperNeRFDataset in HBM + build its sampler.

    Cameras are grouped by intrinsics signature; each group shares one
    precomputed [H, W, 3] local-ray map (vrig scenes have 2 rig cameras,
    others 1). Returns None when calibration is per-image (no grouping
    win -> the local-dir stack would not fit HBM; host path instead).
    """
    groups = {}
    cam_group = []
    for cam in dataset.cameras:
        sig = (
            round(float(cam.focal_length), 6),
            tuple(np.round(cam.principal_point, 6).tolist()),
            round(float(cam.skew), 9),
            round(float(cam.pixel_aspect_ratio), 9),
            tuple(np.round(cam.radial_distortion, 9).tolist()),
            tuple(np.round(cam.tangential_distortion, 9).tolist()),
            tuple(int(v) for v in cam.image_size),
        )
        if sig not in groups:
            groups[sig] = (len(groups), cam)
        cam_group.append(groups[sig][0])
    if len(groups) > 16:
        return None
    cams = sorted(groups.values(), key=lambda gc: gc[0])
    local_dirs = np.stack(
        [cam.pixel_to_local_rays(cam.get_pixel_centers()) for _, cam in cams]
    ).astype(np.float32)
    data = {
        "images": jnp.asarray(dataset.images),
        "local_dirs": jnp.asarray(local_dirs),
        "orientations": jnp.asarray(
            np.stack([c.orientation for c in dataset.cameras]), jnp.float32),
        "positions": jnp.asarray(
            np.stack([c.position for c in dataset.cameras]), jnp.float32),
        "timestamps": jnp.asarray(dataset.timestamps, jnp.float32),
        "cam_group": jnp.asarray(np.asarray(cam_group, np.int32)),
    }
    return data, make_hyper_sampler(dataset.color_bkgd_aug)


def dnerf_device_data(dataset) -> Tuple[dict, Callable]:
    """Put a DNeRFSyntheticDataset's arrays in HBM + build its sampler."""
    data = {
        "images": jnp.asarray(dataset.images),
        "camtoworlds": jnp.asarray(dataset.camtoworlds),
        "K": jnp.asarray(dataset.K),
        "timestamps": jnp.asarray(dataset.timestamps),
    }
    sampler = make_image_stack_sampler(
        opengl_camera=True, bkgd_aug=dataset.color_bkgd_aug, has_alpha=True
    )
    return data, sampler
