"""Multiresolution hash-grid encodings (Instant-NGP style), TPU-native.

Re-implements the math of the reference's hash encoders:
  * 3D spatial grid    — spec: cednerf/taichi_kernel/hash_encoder_half.py:37-229
    (the in-repo Taichi kernel; also what tcnn's HashGrid computes, which is
    the encoder the reference model actually wires in, cednerf/model.py:242-252)
  * 4D (xyz + t) grid  — spec: cednerf/taichi_kernel/hash_encoder_inter.py
    (each table row holds `time_keyframes` stacked feature slices; the time
    axis is linearly interpolated between adjacent keyframes)

TPU-first layout: instead of one CUDA thread per (sample, level) we build the
corner indices for *all* levels at once and issue a single batched gather of
shape [N, L*8] into the flat parameter table. The backward pass is XLA's
scatter-add of the same index set (the Taichi kernels' atomic `+=` hazard
class disappears — a single deterministic scatter). Resolution schedule,
table sizing (align-to-8, per-level cap at 2^log2_hashmap_size), dense
"under hash" indexing below `begin_fast_hash_level`, and the xor-prime fast
hash all follow the reference math exactly so unit tests can check indices
against a naive implementation.

Known reference quirk not reproduced (documented per SURVEY §7): the 4D
kernel computes the time interpolation fraction *before* clamping the lower
keyframe index (hash_encoder_inter.py:151-157), which makes t == 1.0 resolve
to keyframe 2 instead of keyframe 3. We compute the fraction after clamping,
so t == 1.0 lands on the last keyframe and the encoding is continuous.
"""

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

# XOR primes of the reference fast hash (hash_encoder_half.py:71); the first
# dimension is multiplied by 1 (i.e. used raw).
_PRIMES = (1, 2654435761, 805459861)


def _align_to(x: int, y: int) -> int:
    return int((x + y - 1) // y) * y


def level_scale(level: int, log_b: float, base_res: float) -> float:
    """Grid scale of a level (hash_encoder_half.py:96-99)."""
    return base_res * math.exp(level * log_b) - 1.0


def level_resolution(scale: float) -> int:
    """Grid resolution of a level (hash_encoder_half.py:101-103)."""
    return int(math.ceil(scale)) + 1


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration + derived tables for a multiresolution hash grid.

    `time_keyframes == 0` gives the plain 3D spatial grid; > 0 gives the 4D
    xyz+t grid where each table row stores `time_keyframes` feature slices of
    width `n_features` that are lerped along t.
    """

    n_levels: int = 16
    n_features: int = 2
    base_res: int = 16
    max_res: int = 4096
    log2_hashmap_size: int = 19
    time_keyframes: int = 0
    # brick-impl table-gradient accumulator dtype (see BrickGridSpec)
    grad_accum_dtype: str = "float32"
    # brick-impl table-gradient scatter implementation (see BrickGridSpec)
    scatter_impl: str = "xla"
    interp_impl: str = "xla"
    # brick-impl per-level table-row cap (see BrickGridSpec.max_table_rows)
    max_table_rows: int = 16384
    # brick-impl fine-level row override (see BrickGridSpec.fine_table_rows)
    fine_table_rows: int = 0
    # first level the override applies to (BrickGridSpec.fine_from_level)
    fine_from_level: int = 5
    # brick-impl: re-gather rows in the backward instead of saving [N, 64F]
    # residuals per level (see BrickGridSpec.remat_feats)
    remat_feats: bool = False
    # brick-impl hashed-level hot-row layout (see BrickGridSpec.row_layout)
    row_layout: str = "brick"
    # per-level cell-layout row guard (see BrickGridSpec.cell_rows_cap)
    cell_rows_cap: int = 524288

    @property
    def log_b(self) -> float:
        if self.n_levels == 1:
            return 0.0
        return math.log(self.max_res / self.base_res) / (self.n_levels - 1)

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def row_features(self) -> int:
        return self.n_features * max(self.time_keyframes, 1)

    def _sizing(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
        """Per-level (resolutions, sizes, offsets), fast-hash start, total rows.

        Mirrors HashEncoder.__init__ (hash_encoder_half.py:268-292): dense
        size res^3 aligned to 8, capped at 2^log2_hashmap_size; the first
        level whose dense size exceeds the cap switches to the fast hash.
        """
        max_params = 2 ** self.log2_hashmap_size
        resolutions, sizes, offsets = [], [], []
        offset = 0
        begin_fast = self.n_levels
        for lvl in range(self.n_levels):
            res = level_resolution(level_scale(lvl, self.log_b, self.base_res))
            full = res ** 3
            size = min(max_params, _align_to(full, 8))
            resolutions.append(res)
            sizes.append(size)
            offsets.append(offset)
            if full > size and begin_fast == self.n_levels:
                begin_fast = lvl
            offset += size
        return (
            np.asarray(resolutions, np.int64),
            np.asarray(sizes, np.int64),
            np.asarray(offsets, np.int64),
            begin_fast,
            offset,
        )

    @property
    def resolutions(self) -> np.ndarray:
        return self._sizing()[0]

    @property
    def sizes(self) -> np.ndarray:
        return self._sizing()[1]

    @property
    def offsets(self) -> np.ndarray:
        return self._sizing()[2]

    @property
    def begin_fast_hash_level(self) -> int:
        return self._sizing()[3]

    @property
    def total_rows(self) -> int:
        return self._sizing()[4]

    def init_table(self, key, dtype=jnp.float32):
        """Uniform(-1e-4, 1e-4) init (hash_encoder_half.py:305-313; same as tcnn)."""
        import jax

        return jax.random.uniform(
            key, (self.total_rows, self.row_features), dtype=dtype, minval=-1e-4, maxval=1e-4
        )


def _corner_indices_and_weights(x, spec: HashGridSpec):
    """Corner table rows + trilinear weights for all levels at once.

    Args:
      x: [N, 3] positions, normalized to the unit cube (values outside [0,1]
         produce valid-but-meaningless rows, matching the reference where the
         in-AABB selector downstream zeroes their contribution).
    Returns:
      rows:    [N, L, 8] int32 global row indices into the flat table.
      weights: [N, L, 8] trilinear interpolation weights (x.dtype).
    """
    scales = jnp.asarray(
        [level_scale(l, spec.log_b, spec.base_res) for l in range(spec.n_levels)],
        dtype=x.dtype,
    )
    res = jnp.asarray(spec.resolutions, jnp.uint32)  # [L]
    sizes = jnp.asarray(spec.sizes, jnp.uint32)  # [L]
    offsets = jnp.asarray(spec.offsets, jnp.int32)  # [L]

    pos = x[:, None, :] * scales[None, :, None] + 0.5  # [N, L, 3]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    base = pos_grid.astype(jnp.int32).astype(jnp.uint32)  # wrap like the CUDA cast

    # The 8 cube corners: bit d of the corner id selects the +1 in dim d
    # (hash_encoder_half.py:137-147).
    corners = np.asarray(
        [[(c >> d) & 1 for d in range(3)] for c in range(8)], np.int64
    )  # [8, 3]
    corners_u = jnp.asarray(corners, jnp.uint32)
    cpos = base[:, :, None, :] + corners_u[None, None, :, :]  # [N, L, 8, 3]

    corners_f = jnp.asarray(corners, x.dtype)
    w = jnp.prod(
        jnp.where(corners_f[None, None, :, :] > 0, frac[:, :, None, :], 1.0 - frac[:, :, None, :]),
        axis=-1,
    )  # [N, L, 8]

    # Dense "under hash": x + y*res + z*res^2, x fastest (hash_encoder_half.py:76-83).
    r = res[None, :, None]
    dense = cpos[..., 0] + cpos[..., 1] * r + cpos[..., 2] * r * r
    # Fast hash: xor of dims scaled by primes (hash_encoder_half.py:66-74).
    fast = (
        cpos[..., 0] * jnp.uint32(_PRIMES[0])
        ^ cpos[..., 1] * jnp.uint32(_PRIMES[1])
        ^ cpos[..., 2] * jnp.uint32(_PRIMES[2])
    )
    level_ids = jnp.arange(spec.n_levels, dtype=jnp.int32)[None, :, None]
    idx = jnp.where(level_ids < spec.begin_fast_hash_level, dense, fast)
    idx = idx % sizes[None, :, None]
    rows = idx.astype(jnp.int32) + offsets[None, :, None]
    return rows, w


def hash_encode(x, table, spec: HashGridSpec, compute_dtype=jnp.bfloat16):
    """3D multiresolution hash encoding.

    Args:
      x:     [N, 3] unit-cube positions.
      table: [total_rows, n_features] parameter table (fp32).
    Returns:
      [N, n_levels * n_features] features in `compute_dtype`.
    """
    assert spec.time_keyframes == 0
    n = x.shape[0]
    rows, w = _corner_indices_and_weights(x, spec)
    feats = jnp.take(table, rows.reshape(n, -1), axis=0)  # [N, L*8, F]
    feats = feats.astype(compute_dtype) * w.reshape(n, -1, 1).astype(compute_dtype)
    feats = feats.reshape(n, spec.n_levels, 8, spec.n_features).sum(axis=2)
    return feats.reshape(n, spec.output_dim)


def hash_encode_4d(x, t, table, spec: HashGridSpec, compute_dtype=jnp.bfloat16):
    """4D (xyz + t) hash encoding with keyframe time interpolation.

    Each table row stores `time_keyframes` feature slices; t in [0, 1] is
    scaled to the keyframe axis and the two adjacent slices are lerped
    (hash_encoder_inter.py:146-199).

    Args:
      x: [N, 3] unit-cube positions.  t: [N, 1] times in [0, 1].
      table: [total_rows, n_features * time_keyframes] (fp32).
    Returns:
      [N, n_levels * n_features] features in `compute_dtype`.
    """
    k = spec.time_keyframes
    assert k >= 2
    n = x.shape[0]
    rows, w = _corner_indices_and_weights(x, spec)
    feats = jnp.take(table, rows.reshape(n, -1), axis=0)  # [N, L*8, F*K]
    feats = feats.reshape(n, spec.n_levels, 8, k, spec.n_features)

    t_scaled = t.reshape(n) * (k - 1)
    idx_lo = jnp.clip(jnp.floor(t_scaled), 0, k - 2).astype(jnp.int32)
    # Fraction computed after clamping (continuity fix over the reference,
    # see module docstring).
    t_frac = (t_scaled - idx_lo.astype(t_scaled.dtype)).astype(compute_dtype)

    lo = jnp.take_along_axis(feats, idx_lo[:, None, None, None, None], axis=3)[..., 0, :]
    hi = jnp.take_along_axis(feats, (idx_lo + 1)[:, None, None, None, None], axis=3)[..., 0, :]
    tf = t_frac[:, None, None, None]
    slice_feats = lo.astype(compute_dtype) * (1 - tf) + hi.astype(compute_dtype) * tf

    out = (slice_feats * w[..., None].astype(compute_dtype)).sum(axis=2)  # [N, L, F]
    return out.reshape(n, spec.output_dim)
