"""Tri-plane factored encoding, TPU-native.

Re-implements the math of the reference's Taichi tri-plane encoder
(cednerf/taichi_kernel/triplane.py:61-157): three feature planes indexed by
the coordinate pairs (y,z), (x,z), (x,y), a geometric ladder of `n_levels`
query scales that all share ONE high-resolution plane per orientation (level
corners are upsampled into the hi-res plane before lookup), bilinear
interpolation per plane, and a fourth per-level feature group that is the
elementwise product of the three plane features. Output layout per level is
[plane_yz, plane_xz, plane_xy, product] x n_features -> n_levels*4*n_features
dims (64 for the default 8 levels x 2 features).

TPU-first layout: one batched gather of [N, L*3*4] rows into a flat
[3*R*R, F] table (instead of one CUDA thread per (sample, level*feature));
the backward is XLA's deterministic scatter-add over the same index set.

Divergences from the reference kernel (deliberate, documented):
  * upsampled corner indices are clamped to R-1. The reference computes
    int(corner / scale * R) where the +1 corner of the last cell reaches
    exactly R, reading past the plane's rows into the next plane's storage
    (triplane.py:106-120) — a latent OOB that we do not reproduce.
  * parameters are stored [3*R*R, F] row-major rather than a flat 1D buffer
    with feature-major stride; pure layout choice, same math.

This is an alternative encoder in the reference (wired only via the
commented-out swap at cednerf/model.py:253-260); exposed here for parity.
"""

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TriPlaneSpec:
    """Static configuration for the tri-plane encoder.

    Defaults match the reference (triplane.py:58-59, :140): 8 levels,
    2 features, plane resolution 4096, base query scale 16.
    """

    n_levels: int = 8
    n_features: int = 2
    plane_res: int = 4096
    base_res: int = 16

    @property
    def output_dim(self) -> int:
        return self.n_levels * 4 * self.n_features

    @property
    def scales(self) -> np.ndarray:
        """Per-level query scales (triplane.py:150-156)."""
        if self.n_levels == 1:
            return np.asarray([float(self.plane_res)], np.float32)
        log_b = math.log(self.plane_res / self.base_res) / (self.n_levels - 1)
        return np.asarray(
            [
                int(math.ceil(self.base_res * math.exp(l * log_b) - 1.0)) + 1
                for l in range(self.n_levels)
            ],
            np.float32,
        )

    @property
    def total_rows(self) -> int:
        return 3 * self.plane_res * self.plane_res

    def init_planes(self, key, dtype=jnp.float32):
        """Uniform(-1e-4, 1e-4) init (triplane.py:33-36, :167)."""
        import jax

        return jax.random.uniform(
            key, (self.total_rows, self.n_features), dtype=dtype,
            minval=-1e-4, maxval=1e-4,
        )


# Coordinate pairs per plane: indices (a, b) with flat index a + b*R
# (triplane.py:86-120: plane 0 <- (y, z), plane 1 <- (x, z), plane 2 <- (x, y)).
_PLANE_AXES: Tuple[Tuple[int, int], ...] = ((1, 2), (0, 2), (0, 1))


def triplane_encode(x, planes, spec: TriPlaneSpec, compute_dtype=jnp.bfloat16):
    """Encode positions with the tri-plane ladder.

    Args:
      x: [N, 3] positions in [0, 1].
      planes: [3*R*R, F] parameter table (init_planes layout: plane-major).
      spec: static config.

    Returns: [N, n_levels*4*n_features] features, layout per level
      [plane_yz F, plane_xz F, plane_xy F, product F].
    """
    n = x.shape[0]
    lvls = spec.n_levels
    f = spec.n_features
    r = spec.plane_res
    scales = jnp.asarray(spec.scales)  # [L]

    # Cell coords at each level's query scale (triplane.py:82-84).
    pos = x[:, None, :] * (scales[None, :, None] - 1.0) + 0.5  # [N, L, 3]
    base = jnp.floor(pos)
    frac = pos - base
    base = base.astype(jnp.int32)

    # Per-plane 2D coords + fracs: [N, L, 3(planes), 2(axes)].
    axes = np.asarray(_PLANE_AXES)  # [3, 2]
    c0 = base[:, :, axes]           # [N, L, 3, 2]
    fr = frac[:, :, axes]           # [N, L, 3, 2]

    # 4 bilinear corners: offsets [(0,0),(1,0),(0,1),(1,1)] (triplane.py:97-107
    # iterates idx with bit d selecting axis d's +1 corner).
    offs = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], np.int32)  # [4, 2]
    corner = c0[:, :, :, None, :] + offs[None, None, None]  # [N, L, 3, 4, 2]
    w2 = jnp.where(
        offs[None, None, None].astype(bool),
        fr[:, :, :, None, :],
        1.0 - fr[:, :, :, None, :],
    )
    w = (w2[..., 0] * w2[..., 1]).astype(compute_dtype)  # [N, L, 3, 4]

    # Upsample level-scale corners into the shared hi-res plane, clamped
    # (reference: int(corner / scale * R), triplane.py:110).
    hi = (corner.astype(jnp.float32) / scales[None, :, None, None, None] * r)
    hi = jnp.clip(hi.astype(jnp.int32), 0, r - 1)
    plane_off = (np.arange(3, dtype=np.int64) * r * r)[None, None, :, None]
    idx = hi[..., 0] + hi[..., 1] * r + plane_off  # [N, L, 3, 4]

    rows = jnp.take(
        planes.astype(compute_dtype), idx.reshape(-1), axis=0,
        indices_are_sorted=False, unique_indices=False,
    ).reshape(n, lvls, 3, 4, f)
    feats = jnp.sum(rows * w[..., None], axis=3)  # [N, L, 3, F]

    prod = feats[:, :, 0] * feats[:, :, 1] * feats[:, :, 2]  # [N, L, F]
    out = jnp.concatenate([feats.reshape(n, lvls, 3 * f), prod], axis=-1)
    return out.reshape(n, lvls * 4 * f)
