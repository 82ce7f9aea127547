"""Brick-layout multiresolution hash grid — the TPU-first hot-path encoder.

Why this exists: the straightforward NGP table layout ([rows, F=2], one gather
per corner) forces XLA to read a full (8,128) HBM tile (512B) per 8-byte row —
measured ~0.7 GB/s effective on v5e, with the backward scatter-add per-row
overhead-bound (~10M rows/s). This module restructures the *storage layout*
so that one gathered row is exactly one HBM tile:

  * each table row holds a 4x4x4 "brick" of corner features
    (64 corners x 2 feats = 128 floats = 512 B);
  * a brick covers 3x3x3 cells, so every cell's 8 interpolation corners live
    in a single row -> ONE gather per (sample, level) instead of eight;
  * trilinear interpolation becomes a [64]-wide masked outer-product einsum
    on the VPU (no second gather);
  * the backward pass is a scatter-add of 512-byte rows (measured ~23x faster
    than 8-byte-row scatter).

Semantics vs the reference NGP hash grid (hash_encoder_half.py:37-229):
  * DENSE levels (grid fits the parameter budget): exact. The parameters are
    the canonical corner grid [X, Y, Z, F]; bricks are materialized per step
    as 64 overlapping strided slices (pure bandwidth, fully differentiable),
    so shared corners stay shared.
  * HASHED levels: hashing happens at brick granularity (xor-prime hash of
    the brick coordinate) instead of per corner. Collision structure differs
    from NGP's per-corner hashing — features are C0-discontinuous across
    brick boundaries at these (fine) levels, where cells are sub-pixel. The
    per-level parameter count is brick_rows * 64 with
    brick_rows = 2^log2_hashmap_size / 16, i.e. 4x the corner count of the
    reference at the same setting (still ~1/27 of the dense grid).

Resolution schedule matches the reference (base * exp(l * log_b)).
"""

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .hash_grid import _PRIMES, level_resolution, level_scale

BRICK_CELLS = 3          # cells per brick edge
BRICK_CORNERS = 4        # corners per brick edge
CORNERS_PER_BRICK = 64   # 4^3


@dataclasses.dataclass(frozen=True)
class BrickGridSpec:
    """Static config for the brick-layout grid (3D, or 4D with keyframes)."""

    n_levels: int = 16
    n_features: int = 2
    base_res: int = 16
    max_res: int = 4096
    log2_hashmap_size: int = 19
    time_keyframes: int = 0

    @property
    def log_b(self) -> float:
        if self.n_levels == 1:
            return 0.0
        return math.log(self.max_res / self.base_res) / (self.n_levels - 1)

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def row_width(self) -> int:
        """Floats per brick row (per keyframe slice)."""
        return CORNERS_PER_BRICK * self.n_features

    @property
    def keyframes(self) -> int:
        return max(self.time_keyframes, 1)

    def level_layout(self) -> List[dict]:
        """Per-level static layout descriptors."""
        hashed_rows = max(2 ** self.log2_hashmap_size // 16, 1)
        out = []
        for lvl in range(self.n_levels):
            res = level_resolution(level_scale(lvl, self.log_b, self.base_res))
            # corner lattice spans [0, res]; bricks of 3 cells cover it
            n_bricks_axis = max((res + BRICK_CELLS - 1) // BRICK_CELLS, 1)
            dense_rows = n_bricks_axis ** 3
            hashed = dense_rows > hashed_rows
            out.append({
                "res": res,
                "n_bricks_axis": n_bricks_axis,
                "rows": hashed_rows if hashed else dense_rows,
                "hashed": hashed,
            })
        return out

    def param_shapes(self) -> List[Tuple[str, Tuple[int, ...]]]:
        """Parameter tensors per level: dense corner grids or brick tables."""
        shapes = []
        k = self.keyframes
        for lvl, lay in enumerate(self.level_layout()):
            if lay["hashed"]:
                shapes.append(
                    (f"bricks_{lvl}", (lay["rows"], k * self.row_width))
                )
            else:
                n = lay["n_bricks_axis"] * BRICK_CELLS + 1  # canonical corners
                shapes.append((f"grid_{lvl}", (n, n, n, k * self.n_features)))
        return shapes

    def init_params(self, key):
        params = {}
        for (name, shape), k in zip(
            self.param_shapes(), jax.random.split(key, self.n_levels)
        ):
            params[name] = jax.random.uniform(k, shape, jnp.float32, -1e-4, 1e-4)
        return params


def _materialize_dense_bricks(grid, n_bricks_axis: int):
    """Overlapping 4^3 windows of the canonical corner grid, stride 3.

    grid: [N, N, N, F] with N = 3*n_bricks_axis + 1.
    Returns [n_bricks_axis^3, 64 * F]; pure strided slices (bandwidth-speed,
    differentiable, keeps corner sharing exact).
    """
    nb = n_bricks_axis
    f = grid.shape[-1]
    parts = []
    for dx in range(BRICK_CORNERS):
        for dy in range(BRICK_CORNERS):
            for dz in range(BRICK_CORNERS):
                sl = jax.lax.slice(
                    grid,
                    (dx, dy, dz, 0),
                    (dx + 3 * (nb - 1) + 1, dy + 3 * (nb - 1) + 1,
                     dz + 3 * (nb - 1) + 1, f),
                    (3, 3, 3, 1),
                )  # [nb, nb, nb, F]
                parts.append(sl.reshape(nb ** 3, f))
    # corner-major: [brick, corner(dx*16+dy*4+dz), F]
    return jnp.stack(parts, axis=1).reshape(nb ** 3, CORNERS_PER_BRICK * f)


def _corner_weights(intra, frac, dtype):
    """[N, 64] trilinear weights scattered into brick-corner slots.

    intra: [N, 3] int cell position within the brick (0..2);
    frac:  [N, 3] fractional position within the cell.
    Per-dim 4-vector w[k] = (k==i)*(1-f) + (k==i+1)*f; the 64-weight tensor
    is their outer product (corner index = dx*16 + dy*4 + dz).
    """
    k = jnp.arange(BRICK_CORNERS, dtype=jnp.int32)
    lo = (k[None, None, :] == intra[:, :, None]).astype(dtype)
    hi = (k[None, None, :] == (intra[:, :, None] + 1)).astype(dtype)
    f = frac[:, :, None].astype(dtype)
    w = lo * (1.0 - f) + hi * f  # [N, 3, 4]
    w64 = (
        w[:, 0, :, None, None] * w[:, 1, None, :, None] * w[:, 2, None, None, :]
    )  # [N, 4, 4, 4]
    return w64.reshape(-1, CORNERS_PER_BRICK)


def _level_rows_and_weights(x, lvl: int, lay: dict, spec: BrickGridSpec):
    """Brick row index + corner weights for one level. x: [N, 3] in [0,1]."""
    scale = level_scale(lvl, spec.log_b, spec.base_res)
    pos = x * jnp.asarray(scale, x.dtype) + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    cell = pos_grid.astype(jnp.int32)
    # clamp into the covered lattice so out-of-box points stay valid
    cell = jnp.clip(cell, 0, lay["n_bricks_axis"] * BRICK_CELLS - 1)
    brick = cell // BRICK_CELLS
    intra = cell - brick * BRICK_CELLS

    if lay["hashed"]:
        b = brick.astype(jnp.uint32)
        h = (
            b[:, 0] * jnp.uint32(_PRIMES[0])
            ^ b[:, 1] * jnp.uint32(_PRIMES[1])
            ^ b[:, 2] * jnp.uint32(_PRIMES[2])
        )
        rows = (h % jnp.uint32(lay["rows"])).astype(jnp.int32)
    else:
        nb = lay["n_bricks_axis"]
        rows = (brick[:, 0] * nb + brick[:, 1]) * nb + brick[:, 2]
    weights = _corner_weights(intra, frac, jnp.float32)
    return rows, weights


def brick_encode(x, params, spec: BrickGridSpec, t: Optional[jnp.ndarray] = None,
                 compute_dtype=jnp.bfloat16):
    """Multiresolution brick-grid encoding.

    Args:
      x: [N, 3] unit-cube positions; t: [N, 1] times (4D specs only).
      params: dict from BrickGridSpec.init_params.
    Returns [N, n_levels * n_features] in compute_dtype.
    """
    n = x.shape[0]
    f = spec.n_features
    k = spec.keyframes
    layouts = spec.level_layout()

    if spec.time_keyframes:
        t_scaled = t.reshape(n) * (k - 1)
        idx_lo = jnp.clip(jnp.floor(t_scaled), 0, k - 2).astype(jnp.int32)
        t_frac = (t_scaled - idx_lo.astype(t_scaled.dtype)).astype(jnp.float32)

    outs = []
    for lvl, lay in enumerate(layouts):
        rows, w = _level_rows_and_weights(x, lvl, lay, spec)
        if lay["hashed"]:
            # stored keyframe-major: [rows, K, 64, F]
            table = params[f"bricks_{lvl}"]
        else:
            table = _materialize_dense_bricks(
                params[f"grid_{lvl}"], lay["n_bricks_axis"]
            )  # [rows, 64, K*F] corner-major
            if k > 1:
                nb3 = table.shape[0]
                table = (
                    table.reshape(nb3, CORNERS_PER_BRICK, k, f)
                    .transpose(0, 2, 1, 3)
                    .reshape(nb3, k * spec.row_width)
                )
        if spec.time_keyframes:
            # gather only the two relevant keyframe slices (512B rows each)
            flat = table.reshape(-1, spec.row_width)  # [(rows*K), 64F]
            lo = jnp.take(flat, rows * k + idx_lo, axis=0)
            hi = jnp.take(flat, rows * k + idx_lo + 1, axis=0)
            feats = lo * (1.0 - t_frac[:, None]) + hi * t_frac[:, None]
        else:
            feats = jnp.take(table, rows, axis=0)  # [N, 64*F]
        feats = feats.reshape(n, CORNERS_PER_BRICK, f)
        out = jnp.einsum(
            "nc,ncf->nf", w, feats.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        outs.append(out.astype(compute_dtype))
    return jnp.concatenate(outs, axis=-1)
