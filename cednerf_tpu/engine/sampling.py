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

from typing import Callable, Tuple

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
