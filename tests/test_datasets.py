"""Dataset loader tests against tiny generated fixture scenes (the reference
ships no tests; fixtures mirror each dataset family's on-disk schema)."""

import json
import os

import numpy as np
import pytest

from cednerf_tpu.datasets.camera import Camera, radial_and_tangential_undistort
from cednerf_tpu.datasets.llff import correct_poses_bounds
from cednerf_tpu.datasets.rays import generate_spiral_path, pinhole_rays


# ---------------------------------------------------------------- fixtures

def _ring_c2w(i, n, radius=4.0, z=1.0):
    """OpenGL c2w (4x4) on a ring, looking at the origin."""
    from cednerf_tpu.datasets.rays import viewmatrix

    th = 2 * np.pi * i / n
    pos = np.array([radius * np.cos(th), radius * np.sin(th), z], np.float32)
    c2w = np.eye(4)
    c2w[:3, :4] = viewmatrix(pos, np.array([0.0, 0, 1]), pos)
    return c2w


def make_dnerf_fixture(root, scene="lego", n_frames=3, wh=16, ring=False):
    import imageio.v2 as imageio

    d = os.path.join(root, scene)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for split in ["train", "test"]:
        frames = []
        for i in range(n_frames):
            rel = f"./{split}_{i:03d}"
            img = rng.integers(0, 255, (wh, wh, 4), dtype=np.uint8)
            imageio.imwrite(os.path.join(d, f"{split}_{i:03d}.png"), img)
            if ring:
                c2w = _ring_c2w(i + (0.5 if split == "test" else 0), n_frames)
            else:
                c2w = np.eye(4)
                c2w[2, 3] = 4.0
            frames.append({
                "file_path": rel,
                "time": i / max(n_frames - 1, 1),
                "transform_matrix": c2w.tolist(),
            })
        meta = {"camera_angle_x": 0.69, "frames": frames}
        with open(os.path.join(d, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return root


def _lookat_orientation(pos, target=(0.0, 0.0, 0.0)):
    """google-Camera world-to-camera rotation (rows = right, down, forward)
    for a camera at `pos` looking at `target` (+z optical axis)."""
    f = np.asarray(target, np.float64) - np.asarray(pos, np.float64)
    f = f / np.linalg.norm(f)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(f, up)) > 0.98:
        up = np.array([0.0, 1.0, 0.0])
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)
    return np.stack([r, d, f])


def make_hypernerf_fixture(root, scene="vrig_test", n_imgs=8, wh=16,
                           ring=False):
    import imageio.v2 as imageio

    inner = os.path.join(root, scene, scene.split("vrig_")[-1])
    os.makedirs(os.path.join(inner, "camera"), exist_ok=True)
    os.makedirs(os.path.join(inner, "rgb", "2x"), exist_ok=True)
    ids = [f"{i:06d}" for i in range(n_imgs)]
    rng = np.random.default_rng(1)
    with open(os.path.join(inner, "scene.json"), "w") as f:
        json.dump({"near": 0.1, "far": 10.0, "scale": 0.5,
                   "center": [0.1, 0.2, 0.3]}, f)
    with open(os.path.join(inner, "metadata.json"), "w") as f:
        json.dump({i: {"time_id": k, "camera_id": k % 2, "warp_id": k,
                       "appearance_id": k} for k, i in enumerate(ids)}, f)
    with open(os.path.join(inner, "dataset.json"), "w") as f:
        json.dump({"ids": ids,
                   "train_ids": ids[::2],
                   "val_ids": ids[1::2]}, f)
    for k, i in enumerate(ids):
        if ring:
            th = 2 * np.pi * k / n_imgs
            pos = [4.0 * np.cos(th), 4.0 * np.sin(th), 1.0]
            orient = _lookat_orientation(pos).tolist()
        else:
            pos = [0.0, 0.0, -4.0 - 0.1 * k]
            orient = np.eye(3).tolist()
        cam = {
            "orientation": orient,
            "position": pos,
            "focal_length": 2 * wh,
            "principal_point": [wh, wh],  # full-res (2x) principal point
            "skew": 0.0,
            "pixel_aspect_ratio": 1.0,
            "radial_distortion": [0.01, 0.001, 0.0],
            "tangential_distortion": [0.001, 0.0],
            "image_size": [2 * wh, 2 * wh],
        }
        with open(os.path.join(inner, "camera", f"{i}.json"), "w") as f:
            json.dump(cam, f)
        img = rng.integers(0, 255, (wh, wh, 3), dtype=np.uint8)
        imageio.imwrite(os.path.join(inner, "rgb", "2x", f"{i}.png"), img)
    return root


def make_dynerf_fixture(root, scene="cook_spinach", n_cams=3, n_frames=4,
                        wh=16, ring=False):
    import imageio.v2 as imageio

    d = os.path.join(root, scene)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(2)
    # poses_bounds.npy: [n_cams, 17] = 3x5 pose + 2 bounds
    poses = []
    for c in range(n_cams):
        if ring:
            # LLFF raw convention: columns [down, right, back]; a shallow
            # arc of cameras converging on the origin (multi-camera rig)
            th = 0.9 * np.pi * (c / max(n_cams - 1, 1) - 0.5)
            p = np.array([3.0 * np.sin(th), 0.6, 3.0 * np.cos(th)])
            back = p / np.linalg.norm(p)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, back)
            right = right / np.linalg.norm(right)
            down = -np.cross(back, right)
            pose = np.stack([down, right, back, p], axis=1)  # 3x4
        else:
            pose = np.concatenate(
                [np.eye(3), np.array([[0.2 * c], [0.0], [4.0]])], axis=1
            )  # 3x4
        hwf = np.array([[wh * 4], [wh * 4], [wh * 8.0]])  # full-res h, w, focal
        poses.append(np.concatenate([pose, hwf], axis=1).reshape(-1))
    arr = np.stack([np.concatenate([p, [1.0, 10.0]]) for p in poses])
    np.save(os.path.join(d, "poses_bounds.npy"), arr)

    manifest = {"scene": scene, "videos": []}
    os.makedirs(os.path.join(d, "frames"), exist_ok=True)
    for c in range(n_cams):
        entries = []
        for i in range(n_frames):
            rel = os.path.join("frames", f"c{c}_f{i}.png")
            img = rng.integers(0, 255, (wh, wh, 3), dtype=np.uint8)
            imageio.imwrite(os.path.join(d, rel), img)
            entries.append({"path": rel, "idx": i, "weight": wh, "height": wh})
        manifest["videos"].append({"video_name": f"cam{c:02d}", "images": entries})
    with open(os.path.join(d, "images_x4_list.json"), "w") as f:
        json.dump(manifest, f)
    return root


# ---------------------------------------------------------------- tests

def test_dnerf_loader(tmp_path):
    from cednerf_tpu.datasets.dnerf_synthetic import DNeRFSyntheticDataset

    root = make_dnerf_fixture(str(tmp_path))
    ds = DNeRFSyntheticDataset("lego", root, "train", num_rays=64)
    assert len(ds) == 3
    batch = ds.sample(64)
    assert batch["origins"].shape == (64, 3)
    assert batch["pixels"].shape == (64, 3)
    assert batch["timestamps"].shape == (64, 1)
    np.testing.assert_allclose(np.linalg.norm(batch["viewdirs"], axis=-1), 1.0,
                               atol=1e-5)
    data = ds.image_rays(0)
    assert data["origins"].shape == (16, 16, 3)
    assert 0.0 <= data["timestamp"] <= 1.0
    assert ds.timestamps_pool.shape == (3, 1)


def test_hypernerf_loader(tmp_path):
    from cednerf_tpu.datasets.hypernerf import HyperNeRFDataset

    root = make_hypernerf_fixture(str(tmp_path))
    train = HyperNeRFDataset("vrig_test", root, "train", num_rays=32, factor=2,
                             add_cam=True)
    test = HyperNeRFDataset("vrig_test", root, "test", factor=2, add_cam=True)
    assert len(train) == 4 and len(test) == 4
    batch = train.sample(32)
    assert batch["origins"].shape == (32, 3)
    # one image per batch: all origins identical (hypernerf.py:456-461)
    assert np.allclose(batch["origins"], batch["origins"][0])
    assert np.allclose(batch["timestamps"], batch["timestamps"][0])
    np.testing.assert_allclose(np.linalg.norm(batch["viewdirs"], axis=-1), 1.0,
                               atol=1e-5)
    # cameras recentered+scaled into scene coords
    cam = train.cameras[0]
    np.testing.assert_allclose(cam.position, ([0, 0, -4.0] - np.array([0.1, 0.2, 0.3])) * 0.5,
                               atol=1e-5)


def test_hypernerf_nonvrig_split(tmp_path):
    from cednerf_tpu.datasets.hypernerf import HyperNeRFDataset

    root = make_hypernerf_fixture(str(tmp_path), scene="vrig_test")
    # rewrite dataset.json with empty val_ids -> every-4th split
    inner = os.path.join(root, "vrig_test", "test")
    with open(os.path.join(inner, "dataset.json")) as f:
        dj = json.load(f)
    dj["val_ids"] = []
    dj.pop("train_ids", None)
    with open(os.path.join(inner, "dataset.json"), "w") as f:
        json.dump(dj, f)
    train = HyperNeRFDataset("vrig_test", root, "train", num_rays=8, factor=2,
                             add_cam=False)
    # 8 images -> train ids {0, 4}, test = train+2 minus last -> {2}
    assert len(train) == 2


def test_camera_undistort_roundtrip():
    k1, k2, k3, p1, p2 = 0.05, 0.01, 0.001, 0.002, 0.001
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.4, 0.4, 128)
    y = rng.uniform(-0.4, 0.4, 128)
    from cednerf_tpu.datasets.camera import _distort

    xd, yd = _distort(x, y, k1, k2, k3, p1, p2)
    xu, yu = radial_and_tangential_undistort(xd, yd, k1, k2, k3, p1, p2)
    np.testing.assert_allclose(xu, x, atol=1e-5)
    np.testing.assert_allclose(yu, y, atol=1e-5)


def test_camera_project_ray_consistency():
    """pixels_to_rays and project are inverse up to depth."""
    cam = Camera(
        orientation=np.eye(3), position=np.zeros(3), focal_length=100.0,
        principal_point=np.array([32.0, 32.0]), image_size=np.array([64, 64]),
        radial_distortion=np.array([0.02, 0.001, 0.0]),
        tangential_distortion=np.array([0.001, 0.0005]),
    )
    pixels = np.array([[10.5, 20.5], [32.5, 32.5], [50.0, 40.0]], np.float32)
    dirs = cam.pixels_to_rays(pixels)
    pts = cam.position + dirs * 3.0
    back = cam.project(pts)
    np.testing.assert_allclose(back, pixels, atol=1e-3)


def test_camera_pixels_to_points_roundtrip():
    """pixels -> points at known z-depth -> project returns the pixels, and
    the points sit at that depth along the optical axis
    (hyper_cam.py:254-260)."""
    cam = Camera(
        orientation=np.eye(3), position=np.array([0.5, -0.25, 1.0]),
        focal_length=120.0, principal_point=np.array([32.0, 32.0]),
        image_size=np.array([64, 64]),
        radial_distortion=np.array([0.02, 0.001, 0.0]),
        tangential_distortion=np.array([0.001, 0.0005]),
    )
    pixels = np.array([[8.5, 12.0], [32.5, 32.5], [55.0, 48.0]], np.float32)
    depth = np.array([2.0, 3.5, 1.25], np.float32)
    pts = cam.pixels_to_points(pixels, depth)
    np.testing.assert_allclose(cam.project(pts), pixels, atol=1e-3)
    z = (pts - cam.position) @ cam.optical_axis
    np.testing.assert_allclose(z, depth, rtol=1e-5)


def test_camera_look_at():
    """look_at produces a right-handed world->cam frame whose forward axis
    points at the target and whose image-y aligns with -up
    (hyper_cam.py:327-370)."""
    cam = Camera(
        orientation=np.eye(3), position=np.zeros(3), focal_length=100.0,
        principal_point=np.array([32.0, 32.0]), image_size=np.array([64, 64]),
    )
    pos = np.array([1.0, 2.0, -3.0])
    target = np.array([0.0, 0.0, 1.0])
    up = np.array([0.0, 1.0, 0.0])
    c2 = cam.look_at(pos, target, up)
    fwd = (target - pos) / np.linalg.norm(target - pos)
    np.testing.assert_allclose(c2.optical_axis, fwd, atol=1e-6)
    # orthonormal, right-handed, det +1
    np.testing.assert_allclose(c2.orientation @ c2.orientation.T, np.eye(3),
                               atol=1e-6)
    assert np.linalg.det(c2.orientation) > 0.99
    # the target projects to the principal point; intrinsics preserved
    np.testing.assert_allclose(c2.project(target[None]),
                               [[32.0, 32.0]], atol=1e-3)
    assert c2.focal_length == cam.focal_length
    # moving along +up in the world moves UP in the image (y decreases:
    # image y is down)
    p_up = cam.position * 0 + target + 0.1 * up
    assert c2.project(p_up[None])[0, 1] < 32.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cam.look_at(pos, pos, up)
    with _pytest.raises(ValueError):
        cam.look_at(pos, target, fwd)


def test_camera_crop_image_domain():
    """Cropping shifts the principal point so rays through surviving pixels
    are unchanged (hyper_cam.py:372-400)."""
    cam = Camera(
        orientation=np.eye(3), position=np.zeros(3), focal_length=90.0,
        principal_point=np.array([30.0, 34.0]), image_size=np.array([64, 60]),
        radial_distortion=np.array([0.01, 0.0, 0.0]),
    )
    cr = cam.crop_image_domain(left=5, right=3, top=7, bottom=2)
    assert cr.image_size.tolist() == [64 - 8, 60 - 9]
    # same world ray through the shifted pixel coordinates
    pix = np.array([[20.0, 25.0]], np.float32)
    np.testing.assert_allclose(
        cam.pixels_to_rays(pix), cr.pixels_to_rays(pix - [5, 7]), atol=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cam.crop_image_domain(left=64)


def test_dynerf_loader(tmp_path):
    from cednerf_tpu.datasets.dynerf import DyNeRFDataset

    root = make_dynerf_fixture(str(tmp_path))
    train = DyNeRFDataset("cook_spinach", root, "train", num_rays=32, factor=4,
                          sampling="uniform")
    test = DyNeRFDataset("cook_spinach", root, "test", factor=4)
    # train drops camera 0; test keeps only camera 0 at every 10th frame
    assert train.num_cameras == 2 and len(train) == 8
    assert test.num_cameras == 1 and len(test) == 1
    batch = train.sample(32)
    assert batch["origins"].shape == (32, 3)
    assert batch["timestamps"].min() >= 0 and batch["timestamps"].max() <= 1
    poses = train.render_poses()
    assert poses["c2w"].shape == (300, 3, 4)
    pr = train.pose_rays(poses, 0)
    assert pr["origins"].shape == (16, 16, 3)


def test_dynerf_isg_ist_sampling(tmp_path):
    from cednerf_tpu.datasets.dynerf import (
        DyNeRFDataset,
        isg_weights,
        ist_weights,
    )

    root = make_dynerf_fixture(str(tmp_path))
    d = os.path.join(root, "cook_spinach")
    # weights concentrated on one image's top-left corner
    w = np.full((8, 16, 16), 1e-9, np.float32)
    w[3, :4, :4] = 1.0
    np.save(os.path.join(d, "isg_weights.npy"), w / w.sum())
    ds = DyNeRFDataset("cook_spinach", root, "train", num_rays=64, factor=4,
                       sampling="isg")
    assert ds.sampling == "isg"
    batch = ds.sample(64)
    t = batch["timestamps"]
    # image 3 = cam 0(after drop), frame 3 -> t = 3/3 = 1.0
    np.testing.assert_allclose(t, 1.0, atol=1e-6)

    # weight-function sanity: static scene -> flat-ish ISG; moving pixel
    # raises IST weight at that pixel
    imgs = np.zeros((8, 16, 16, 3), np.uint8)
    imgs[4:, 2, 2] = 255  # second camera's pixel flickers over time
    med = np.zeros((2, 16, 16, 3), np.uint8)
    isg = isg_weights(imgs, med)
    assert isg.shape == (2, 4, 16, 16)
    assert isg[1, :, 2, 2].max() > isg[1, :, 0, 0].max()
    ist = ist_weights(imgs, 2)
    assert ist.shape == (2, 4, 16, 16)
    assert ist[1, 0, 2, 2] > ist[1, 0, 0, 0]
    np.testing.assert_allclose(ist[0], 0.1)  # static camera clamps to alpha


def test_llff_pose_correction():
    rng = np.random.default_rng(4)
    poses = np.stack([np.concatenate([np.eye(3), [[0], [0], [4.0 + 0.1 * i]]], 1)
                      for i in range(4)])
    bounds = np.array([[2.0, 10.0]] * 4)
    out, ref, b = correct_poses_bounds(poses.copy(), bounds.copy())
    assert out.shape == (4, 3, 4)
    np.testing.assert_allclose(b.min(), 2.0 / (2.0 * 0.75), rtol=1e-6)
    # average centered pose ~ identity position
    np.testing.assert_allclose(out[..., 3].mean(0), 0.0, atol=1e-5)


def test_spiral_path_shapes():
    poses = np.stack([np.concatenate([np.eye(3), [[np.cos(t)], [np.sin(t)], [4.0]]], 1)
                      for t in np.linspace(0, 1, 5)])
    nf = np.array([[1.0, 10.0]] * 5)
    sp = generate_spiral_path(poses, nf, n_frames=30)
    assert sp.shape == (30, 3, 4)
    # rotations orthonormal
    rtr = np.einsum("nij,nik->njk", sp[:, :, :3], sp[:, :, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (30, 3, 3)), atol=1e-5)


def test_procedural_loader_protocol():
    """ProceduralLoader implements the train_real.py dataset protocol."""
    from cednerf_tpu.datasets.procedural import ProceduralLoader

    for subject in ("procedural", "procedural_cloud"):
        ds = ProceduralLoader(subject_id=subject, split="test")
        assert len(ds) == 4
        img = ds.image_rays(0)
        wh = (ds.height, ds.width)
        assert img["origins"].shape == (*wh, 3)
        assert img["pixels"].shape == (*wh, 3)
        assert 0.0 <= img["timestamp"] <= 1.0
        poses = ds.render_poses(n_frames=6)
        assert poses["c2w"].shape[0] == 6
        pr = ds.pose_rays(poses, 3)
        assert pr["origins"].shape == (*wh, 3)
        assert pr["viewdirs"].shape == (*wh, 3)
        batch = ds.sample(64)
        for k in ("origins", "viewdirs", "pixels", "timestamps"):
            assert batch[k].shape[0] == 64, k
        assert ds.timestamps_pool.shape[1] == 1
        data, fn = ds.device_sampler()
        assert callable(fn)


def test_textured_cloud_scene_device_matches_host():
    """TexturedCloudScene device sampler GT == host GT (texture math parity)."""
    import jax

    from synthetic_scene import TexturedCloudScene

    scene = TexturedCloudScene(n_cams=4, wh=32, n_times=4, n_balls=16)
    data, sample = scene.device_sampler()
    batch = jax.jit(sample, static_argnums=2)(data, jax.random.PRNGKey(5), 256)
    # pixels were computed per-ray at each ray's own time; recompute per time.
    # f32 ray-sphere + sin(120*x) math differs slightly between backends
    # (and tangent hits can flip), so assert bulk agreement, not exactness.
    t = np.asarray(batch["timestamps"]).reshape(-1)
    got = np.asarray(batch["pixels"])
    agree = 0
    for tv in np.unique(t):
        m = t == tv
        want = scene._render_gt(np.asarray(batch["origins"])[m],
                                np.asarray(batch["viewdirs"])[m], float(tv))
        agree += int((np.abs(got[m] - want).max(axis=-1) < 0.02).sum())
    assert agree >= 0.95 * len(t), (agree, len(t))
    # texture actually varies across the surface (not a flat-color scene)
    hits = got[np.any(np.abs(got - got[-1]) > 1e-6, axis=-1)]
    assert len(np.unique(np.round(hits, 3), axis=0)) > 8


def test_image_rays_gt_dispatches_to_subclass_scene():
    """image_rays must render GT with the subclass's analytic scene, not the
    base single-ball one (regression: train-view PSNR against wrong GT)."""
    from synthetic_scene import TexturedCloudScene

    scene = TexturedCloudScene(n_cams=4, wh=32, n_times=4, n_balls=16)
    tv = scene.image_rays(0, float(scene.times[1]))
    want = scene._render_gt(tv["origins"].reshape(-1, 3),
                            tv["viewdirs"].reshape(-1, 3),
                            float(scene.times[1]))
    np.testing.assert_allclose(tv["pixels"].reshape(-1, 3), want, atol=1e-6)
    # cam 0 sits at theta=0 on the same ring eval_view uses
    gt, origins, _ = scene.eval_view(theta=0.0, t=float(scene.times[1]))
    np.testing.assert_allclose(tv["pixels"], gt, atol=1e-6)
    np.testing.assert_allclose(tv["origins"], origins, atol=1e-6)


def test_se3_twist_roundtrip_matches_scipy():
    """poses_to_twists/twists_to_poses == scipy logm/expm (the reference's
    implementation, pose_ulils.py:274-356), incl. near-pi rotations."""
    import scipy.linalg

    from cednerf_tpu.datasets.llff import (interpolate_poses, p34_to_44,
                                           poses_to_twists, twists_to_poses)

    rng = np.random.default_rng(3)
    # random rigid poses at assorted rotation magnitudes incl. ~pi
    poses = []
    for ang in (0.0, 1e-7, 0.3, 1.5, 2.9, np.pi - 1e-4):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = rng.normal(size=3)
        poses.append(P)
    poses = np.stack(poses)

    twists = poses_to_twists(poses)
    for P, tw in zip(poses, twists):
        M = np.real(scipy.linalg.logm(P))
        want = np.array([M[2, 1], M[0, 2], M[1, 0],
                         M[0, 3], M[1, 3], M[2, 3]])
        # logm's branch at theta ~ pi can pick the opposite axis; both
        # exponentiate to the same pose, so compare through expm instead
        # when the twists disagree.
        if not np.allclose(tw, want, atol=1e-6):
            np.testing.assert_allclose(
                twists_to_poses(tw[None])[0], P, atol=1e-8)
        np.testing.assert_allclose(twists_to_poses(tw[None])[0], P, atol=1e-8)

    # round-trip through the 3x4 path + interpolation endpoints
    p34 = poses[:, :3, :4]
    dense = interpolate_poses(p34, 4)
    assert dense.shape == (len(p34) * 4, 3, 4)
    np.testing.assert_allclose(dense[::4], p34, atol=1e-5)
    # interpolated poses stay rigid (orthonormal rotations)
    for P in dense:
        np.testing.assert_allclose(P[:3, :3] @ P[:3, :3].T, np.eye(3),
                                   atol=1e-5)


def test_dynerf_isg_bootstrap_without_weight_files(tmp_path):
    """Missing weight maps self-bootstrap from the loaded frames and cache."""
    from cednerf_tpu.datasets.dynerf import DyNeRFDataset

    root = make_dynerf_fixture(str(tmp_path))
    ds = DyNeRFDataset("cook_spinach", root, "train", num_rays=64, factor=4,
                       sampling="isg")
    assert ds.sampling == "isg"            # bootstrapped, not uniform
    assert ds.weights_subsampled == 1      # computed at image resolution
    assert ds.sampling_weights is not None
    cache = os.path.join(root, "cook_spinach", "isg_weights_f4.npy")
    assert os.path.exists(cache)
    batch = ds.sample(64)
    assert batch["origins"].shape == (64, 3)
    # second loader reuses the cache (still isg, same weight count)
    ds2 = DyNeRFDataset("cook_spinach", root, "train", num_rays=64, factor=4,
                        sampling="isg")
    assert ds2.sampling == "isg"
    np.testing.assert_allclose(ds2.sampling_weights, ds.sampling_weights)


def test_switch_to_ist_bootstraps_missing_weights(tmp_path):
    from cednerf_tpu.datasets.dynerf import DyNeRFDataset

    root = make_dynerf_fixture(str(tmp_path))
    ds = DyNeRFDataset("cook_spinach", root, "train", num_rays=64, factor=4,
                       sampling="isg")
    assert ds.sampling == "isg"
    ds.switch_to_ist()          # no ist_weights.npy anywhere -> bootstrap
    assert ds.sampling == "ist"
    assert ds.weights_subsampled == 1
    assert os.path.exists(
        os.path.join(root, "cook_spinach", "ist_weights_f4.npy"))
    batch = ds.sample(64)
    assert batch["origins"].shape == (64, 3)


def test_pose_centering_variants():
    """center_poses_with / rotation-only / reference (pose_ulils.py:62-112)."""
    from cednerf_tpu.datasets.llff import (average_poses_llff,
                                           center_poses,
                                           center_poses_reference,
                                           center_poses_with,
                                           center_poses_with_rotation_only)

    rng = np.random.default_rng(11)
    poses = []
    for _ in range(6):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        poses.append(np.concatenate([R, rng.normal(size=(3, 1))], 1))
    poses = np.stack(poses)

    # with train_poses == poses, center_poses_with == center_poses
    a, inv_a = center_poses(poses)
    b, inv_b = center_poses_with(poses, poses)
    np.testing.assert_allclose(a, b, atol=1e-10)
    np.testing.assert_allclose(inv_a, inv_b, atol=1e-10)
    # a provided avg_pose is applied verbatim
    c, inv_c = center_poses_with(poses, poses[:1], avg_pose=inv_a)
    np.testing.assert_allclose(c, a, atol=1e-10)

    # rotation-only: same rotations as full centering, translations differ
    # by exactly the (rotated) average translation
    d, _ = center_poses_with_rotation_only(poses, poses)
    np.testing.assert_allclose(d[:, :3, :3], a[:, :3, :3], atol=1e-9)
    assert not np.allclose(d[..., 3], a[..., 3])

    # reference centering: the selected camera lands exactly at identity
    e, inv_e = center_poses_reference(poses)
    avg = average_poses_llff(poses)
    k = np.argmin(np.sum(np.square(avg[:3, 3] - poses[:, :3, 3]), -1))
    np.testing.assert_allclose(e[k], np.eye(4)[:3], atol=1e-10)


def test_render_path_generators():
    """create_spiral/rotating_spiral/spherical poses (pose_ulils.py:114-227)."""
    from cednerf_tpu.datasets.llff import (create_rotating_spiral_poses,
                                           create_spherical_poses,
                                           create_spiral_poses,
                                           get_bounding_box,
                                           get_bounding_sphere)

    poses = np.stack(
        [np.concatenate([np.eye(3), [[np.cos(t)], [np.sin(t)], [4.0]]], 1)
         for t in np.linspace(0, 2 * np.pi, 8, endpoint=False)])

    sp = np.stack(create_spiral_poses(poses, [0.5, 0.5, 0.2], focal=4.0,
                                      n_frames=24))
    assert sp.shape == (24, 3, 4)
    rot = np.stack(create_rotating_spiral_poses(
        [0, 0, 0], poses, pose_rad=2.0, spiral_rads=[0.3, 0.3, 0.1],
        focal=4.0, theta_range=(-0.5, 0.5), n_frames=16))
    assert rot.shape == (16, 3, 4)
    sph = create_spherical_poses(radius=3.0, n_poses=12)
    assert sph.shape == (12, 3, 4)
    for arr in (sp, rot, sph):
        RtR = np.einsum("nij,nik->njk", arr[:, :3, :3], arr[:, :3, :3])
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                                   atol=1e-6)
    # spherical centers all sit on the same sphere
    r = np.linalg.norm(sph[..., 3], axis=-1)
    np.testing.assert_allclose(r, r[0], rtol=1e-6)

    box = get_bounding_box(poses)
    assert len(box) == 6 and box[0] <= box[3]
    assert get_bounding_sphere(poses) >= np.abs(poses[:, :3, 3]).max() - 1e-9


def test_monocular_orbit_scene_entangles_cam_and_time():
    """MonocularOrbitScene: every sampled ray's camera is its timestep's
    camera (host and device samplers), matching the vrig capture regime."""
    import jax
    import jax.numpy as jnp

    from synthetic_scene import MonocularOrbitScene

    scene = MonocularOrbitScene(n_frames=8, wh=32, n_balls=8)
    assert scene.monocular and len(scene.c2ws) == len(scene.times)

    batch = scene.sample(128)
    # reconstruct the camera from each ray's origin: monocular means the
    # origin must be the c2w translation of the TIME index
    t = batch["timestamps"].reshape(-1)
    ti = np.argmin(np.abs(t[:, None] - scene.times[None]), axis=1)
    np.testing.assert_allclose(batch["origins"], scene.c2ws[ti][:, :, 3],
                               atol=1e-5)

    data, fn = scene.device_sampler()
    db = jax.jit(fn, static_argnums=2)(data, jax.random.PRNGKey(3), 128)
    t = np.asarray(db["timestamps"]).reshape(-1)
    ti = np.argmin(np.abs(t[:, None] - scene.times[None]), axis=1)
    np.testing.assert_allclose(np.asarray(db["origins"]),
                               scene.c2ws[ti][:, :, 3], atol=1e-5)
    # and a multi-view scene keeps (cam, time) independent: some ray must
    # break the pairing
    from synthetic_scene import BallCloudScene

    mv = BallCloudScene(n_cams=8, wh=32, n_times=8, n_balls=8)
    b2 = mv.sample(256)
    t2 = b2["timestamps"].reshape(-1)
    ti2 = np.argmin(np.abs(t2[:, None] - mv.times[None]), axis=1)
    assert not np.allclose(b2["origins"], mv.c2ws[ti2][:, :, 3])
