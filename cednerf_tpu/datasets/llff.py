"""LLFF pose pipeline (poses_bounds.npy handling) for DyNeRF scenes.

Math parity with the reference's datasets/pose_ulils.py (sic):
  * average_poses / center_poses (pose_ulils.py:14-60) — note this variant
    builds the average rotation with x = normalize(cross(y', z)), y = cross(z, x)
    (different sign convention from datasets/utils.py's average_poses; both are
    kept because DyNeRF centering uses this one and the spiral path the other);
  * correct_poses_bounds (pose_ulils.py:230-255): "down right back" ->
    "right up back" axis flip, scale by 0.75 * min(bounds), recenter by the
    inverse average pose.
"""

import numpy as np


def _normalize(v):
    return v / np.linalg.norm(v)


def average_poses_llff(poses):
    center = poses[..., 3].mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    rot = np.stack([x, y, z], 1)
    return np.concatenate([rot, center[:, None]], 1)  # (3, 4)


def center_poses(poses):
    """Recenter poses about their average (pose_ulils.py:48-60)."""
    pose_avg = average_poses_llff(poses)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    poses_centered = (np.linalg.inv(pose_avg_homo) @ poses_homo)[:, :3]
    return poses_centered, np.linalg.inv(pose_avg_homo)


def correct_poses_bounds(poses, bounds, flip=True, center=True):
    """LLFF pose normalization (pose_ulils.py:230-255)."""
    if flip:
        poses = np.concatenate(
            [poses[..., 1:2], -poses[..., :1], poses[..., 2:4]], -1
        )
    scale_factor = bounds.min() * 0.75
    bounds = bounds / scale_factor
    poses = poses.copy()
    poses[..., :3, 3] /= scale_factor
    if center:
        poses, ref = center_poses(poses)
    else:
        ref = poses[0]
    return poses, ref, bounds
