"""Dynamic NGP radiance field (TPU-native rebuild of the reference model).

Re-implements the behavior of the reference's `DNGPradianceField`
(cednerf/model.py:97-488) and `NGPDensityField` (cednerf/model.py:28-94) with
flax.linen modules over the jnp hash-grid ops:

  * motion net: frequency-encoded (x, y, z, t) -> MLP -> offset(s); warped
    position x + move feeds the spatial hash grid (model.py:201-222, :354-365)
  * optional `hash4motion` variant: hash-grid(xyz) + frequency(t) -> MLP
    (model.py:165-199)
  * time embeddings with motion-magnitude attenuation, injected before or
    after the density MLP (model.py:265-278, :386-404)
  * auxiliary feature-/weight-prediction heads used as regularizers
    (model.py:312-344, :435-441)
  * density = trunc_exp(x - 1) * in-AABB selector (model.py:105, :411-417)

All MLPs are 64-wide ReLU nets like the reference's FullyFusedMLPs; compute
runs in bf16 (params fp32) — the TPU replacement for the reference's fp16
autocast. Known reference bug NOT reproduced (SURVEY §7): NGPDensityField's
`np.exp` NameError at model.py:54.
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.encoders import (
    sh_encode_deg2,
    sinusoidal_encode,
    sinusoidal_encode_with_exp,
    sinusoidal_latent_dim,
)
from ..ops.hash_grid import HashGridSpec, hash_encode, hash_encode_4d
from ..ops.triplane import TriPlaneSpec, triplane_encode
from ..utils.math import trunc_exp

DEFAULT_MOVING_STEP = 1.0 / 4096.0  # model.py:26


def huber(pred, target, delta: float = 1.0):
    """Elementwise Huber loss (torch F.huber_loss, reduction='none')."""
    d = pred - target
    abs_d = jnp.abs(d)
    return jnp.where(abs_d < delta, 0.5 * d * d, delta * (abs_d - 0.5 * delta))


def contract_to_unisphere(x, aabb_min, aabb_max, eps: float = 1e-7):
    """nerfacc's unbounded-scene contraction (used by proposal density fields).

    Maps aabb to [0.25, 0.75] and all of space into [0, 1].
    """
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2.0 - 1.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    safe_mag = jnp.maximum(mag, eps)
    contracted = (2.0 - 1.0 / safe_mag) * (x / safe_mag)
    x = jnp.where(mag > 1.0, contracted, x)
    return x / 4.0 + 0.5


class MLP(nn.Module):
    """Small ReLU MLP mirroring tcnn's FullyFusedMLP configs (64-wide)."""

    out_dim: int
    hidden_layers: int = 1
    width: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.hidden_layers):
            x = nn.Dense(self.width, dtype=self.dtype, name=f"hidden_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(x)


class HashGridEncoder(nn.Module):
    """Parameterized multires hash grid (3D or 4D-with-time-keyframes).

    impl='brick' (default) uses the TPU-first brick storage layout
    (ops/brick_grid.py: one 512-byte row gather per sample-level);
    impl='gather' is the exact-NGP per-corner layout (ops/hash_grid.py),
    kept for parity/unit tests and small side networks.
    """

    spec: HashGridSpec
    dtype: jnp.dtype = jnp.bfloat16
    impl: str = "brick"

    @nn.compact
    def __call__(self, x, t: Optional[jnp.ndarray] = None):
        if self.impl == "brick":
            from ..ops.brick_grid import BrickGridSpec, brick_encode

            bspec = BrickGridSpec(
                n_levels=self.spec.n_levels,
                n_features=self.spec.n_features,
                base_res=self.spec.base_res,
                max_res=self.spec.max_res,
                log2_hashmap_size=self.spec.log2_hashmap_size,
                time_keyframes=self.spec.time_keyframes,
                grad_accum_dtype=self.spec.grad_accum_dtype,
                scatter_impl=self.spec.scatter_impl,
                interp_impl=self.spec.interp_impl,
                max_table_rows=self.spec.max_table_rows,
                fine_table_rows=self.spec.fine_table_rows,
                fine_from_level=self.spec.fine_from_level,
                remat_feats=self.spec.remat_feats,
                row_layout=self.spec.row_layout,
                cell_rows_cap=self.spec.cell_rows_cap,
            )
            params = {
                name: self.param(
                    name,
                    lambda key, s=shape: jax.random.uniform(
                        key, s, jnp.float32, -1e-4, 1e-4
                    ),
                )
                for name, shape in bspec.param_shapes()
            }
            return brick_encode(x, params, bspec, t=t, compute_dtype=self.dtype)
        table = self.param("table", lambda key: self.spec.init_table(key))
        if self.spec.time_keyframes:
            assert t is not None
            return hash_encode_4d(x, t, table, self.spec, compute_dtype=self.dtype)
        return hash_encode(x, table, self.spec, compute_dtype=self.dtype)


class TriPlaneEncoderModule(nn.Module):
    """Tri-plane factored spatial encoder (alternative to the hash grid).

    Parity with the reference's TriPlaneEncoder swap option
    (cednerf/taichi_kernel/triplane.py:136-249; swap site model.py:253-260).
    """

    spec: TriPlaneSpec
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t: Optional[jnp.ndarray] = None):
        planes = self.param("planes", lambda key: self.spec.init_planes(key))
        return triplane_encode(x, planes, self.spec, compute_dtype=self.dtype)


class NGPDensityField(nn.Module):
    """Instant-NGP density field used for proposal-network resampling.

    Reference: cednerf/model.py:28-94 (intent spec for the proposal sampler in
    train_prop_real.py:120-127, :194-207).
    """

    aabb: Tuple[float, ...]
    unbounded: bool = False
    base_resolution: int = 16
    max_resolution: int = 128
    n_levels: int = 5
    log2_hashmap_size: int = 17
    encoder_impl: str = "brick"
    density_clamp: float = 0.0  # see DNGPRadianceField.density_clamp

    def setup(self):
        self.grid = HashGridEncoder(
            HashGridSpec(
                n_levels=self.n_levels,
                n_features=2,
                base_res=self.base_resolution,
                max_res=self.max_resolution,
                log2_hashmap_size=self.log2_hashmap_size,
            ),
            impl=self.encoder_impl,
        )
        self.mlp = MLP(out_dim=1, hidden_layers=1)

    def __call__(self, positions):
        aabb = np.asarray(self.aabb, np.float32)
        aabb_min, aabb_max = aabb[:3], aabb[3:]
        if self.unbounded:
            x = contract_to_unisphere(positions, aabb_min, aabb_max)
            selector = jnp.ones(x.shape[:-1], bool)
        else:
            x = (positions - aabb_min) / (aabb_max - aabb_min)
            selector = jnp.all((x > 0.0) & (x < 1.0), axis=-1)
        h = self.grid(x.reshape(-1, 3))
        raw = self.mlp(h).astype(jnp.float32) - 1.0
        if self.density_clamp > 0:
            raw = jnp.minimum(raw, self.density_clamp)
        density = trunc_exp(raw) * selector[..., None]
        return density


class DNGPRadianceField(nn.Module):
    """Time-conditioned Instant-NGP radiance field with a motion-warp MLP."""

    aabb: Tuple[float, ...]
    geo_feat_dim: int = 15
    base_resolution: int = 16
    n_levels: int = 16
    n_features_per_level: int = 2
    dst_resolution: int = 4096
    log2_hashmap_size: int = 19
    use_feat_predict: bool = False
    use_weight_predict: bool = False
    moving_step: float = DEFAULT_MOVING_STEP
    use_div_offsets: bool = False
    use_time_embedding: bool = False
    use_time_attenuation: bool = False
    time_inject_before_sigma: bool = True
    hash4motion: bool = False
    use_viewdirs: bool = True
    grid_type: str = "hash3d"  # "hash3d" (motion-warped), "hash4d" (time
    # keyframes), or "triplane" (factored planes, reference swap option)
    time_keyframes: int = 4  # only for grid_type == "hash4d"
    encoder_impl: str = "brick"  # hot-path layout: "brick" (TPU-first) or "gather"
    grad_accum_dtype: str = "float32"  # encoder table-grad accumulator
    scatter_impl: str = "xla"  # encoder table-grad scatter (see BrickGridSpec)
    interp_impl: str = "xla"  # encoder interpolation impl (see BrickGridSpec)
    max_table_rows: int = 16384  # brick-impl per-level table cap (rows)
    fine_table_rows: int = 0  # brick-impl fine-level row override
    fine_from_level: int = 5  # first level the override applies to
    remat_feats: bool = False  # brick-impl: re-gather rows in the backward
    row_layout: str = "brick"  # brick-impl hashed-level hot-row layout
    cell_rows_cap: int = 524288  # per-level cell-layout row guard
    # pre-activation clamp on the density exp (0 = off, reference parity).
    # exp overflows f32 at ~88.7; an overflowed inf density turns into NaN
    # downstream (inf*0 in interp / inf-inf in warped positions). A clamp
    # of e.g. 20 (sigma <= 4.8e8) is semantically invisible — opacity
    # saturates orders of magnitude earlier — and closes the overflow
    # route (prop-path divergence diagnosis, r4s28).
    density_clamp: float = 0.0

    @property
    def hash_spec(self) -> HashGridSpec:
        return HashGridSpec(
            n_levels=self.n_levels,
            n_features=self.n_features_per_level,
            base_res=self.base_resolution,
            max_res=self.dst_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            time_keyframes=self.time_keyframes if self.grid_type == "hash4d" else 0,
            grad_accum_dtype=self.grad_accum_dtype,
            scatter_impl=self.scatter_impl,
            interp_impl=self.interp_impl,
            max_table_rows=self.max_table_rows,
            fine_table_rows=self.fine_table_rows,
            fine_from_level=self.fine_from_level,
            remat_feats=self.remat_feats,
            row_layout=self.row_layout,
            cell_rows_cap=self.cell_rows_cap,
        )

    @property
    def triplane_spec(self) -> TriPlaneSpec:
        return TriPlaneSpec(plane_res=self.dst_resolution,
                            n_features=self.n_features_per_level)

    @property
    def encoder_output_dim(self) -> int:
        if self.grid_type == "triplane":
            return self.triplane_spec.output_dim
        return self.hash_spec.output_dim

    def setup(self):
        assert self.grid_type in ("hash3d", "hash4d", "triplane")
        motion_out = 6 if self.use_div_offsets else 3
        if self.hash4motion:
            # HashGrid(xyz, 8 levels, 16->2048) + Frequency(t) -> 1-hidden MLP
            # (model.py:165-199).
            self.motion_grid = HashGridEncoder(
                HashGridSpec(n_levels=8, n_features=2, base_res=16, max_res=2048,
                             log2_hashmap_size=19),
                impl=self.encoder_impl,
            )
            self.motion_mlp = MLP(out_dim=motion_out, hidden_layers=1)
        else:
            # Frequency(xyzt, 4 octaves) -> 3-hidden MLP (model.py:201-222).
            self.motion_mlp = MLP(out_dim=motion_out, hidden_layers=3)

        if self.grid_type == "triplane":
            self.hash_encoder = TriPlaneEncoderModule(self.triplane_spec)
        else:
            self.hash_encoder = HashGridEncoder(self.hash_spec, impl=self.encoder_impl)

        self.mlp_base = MLP(out_dim=1 + self.geo_feat_dim, hidden_layers=1)
        self.mlp_head = MLP(out_dim=3, hidden_layers=2)
        if self.use_feat_predict:
            self.mlp_feat_prediction = MLP(out_dim=self.encoder_output_dim, hidden_layers=1)
        if self.use_weight_predict:
            self.mlp_weight_prediction = MLP(out_dim=1, hidden_layers=1)

    # ------------------------------------------------------------------ #

    def _aabb(self):
        aabb = np.asarray(self.aabb, np.float32)
        return aabb[:3], aabb[3:]

    def query_move(self, x, t):
        """Motion warp: (x, t) -> (x + move, move). Reference model.py:354-365."""
        if self.hash4motion:
            aabb_min, aabb_max = self._aabb()
            xn = (x - aabb_min) / (aabb_max - aabb_min)
            h = jnp.concatenate(
                [self.motion_grid(xn), sinusoidal_encode(t, 0, 4).astype(jnp.bfloat16)],
                axis=-1,
            )
        else:
            h = sinusoidal_encode(jnp.concatenate([x, t], axis=-1), 0, 4)
        offsets = self.motion_mlp(h).astype(jnp.float32)
        if self.use_div_offsets:
            grid_move = offsets[:, 0:3] * self.moving_step
            fine_move = jnp.tanh(offsets[:, 3:]) * self.moving_step
            move = grid_move + fine_move
        else:
            move = offsets * self.moving_step
        return x + move, move

    def query_density(self, x, t, return_feat: bool = False,
                      return_internal: bool = False, skip_move: bool = False):
        """Density (+ geometry features / aux-loss internals) at (x, t).

        Reference: model.py:367-445 (`loose_move` maps to `skip_move`).
        Shapes: x [N, 3], t [N, 1].
        """
        x = x.reshape(-1, 3)
        t = t.reshape(-1, 1)
        if skip_move:
            x_move = x
            move = jnp.zeros_like(x[:, :1])
        else:
            x_move, move = self.query_move(x, t)

        aabb_min, aabb_max = self._aabb()
        xn = (x_move - aabb_min) / (aabb_max - aabb_min)
        selector = jnp.all((xn > 0.0) & (xn < 1.0), axis=-1)

        if self.grid_type == "hash4d":
            hash_feat = self.hash_encoder(xn, t)
        else:
            hash_feat = self.hash_encoder(xn)

        time_encode = None
        if self.use_time_embedding:
            # Computed under no_grad in the reference (model.py:387) — a
            # constant input to the MLPs.
            if self.use_time_attenuation:
                move_norm = jnp.linalg.norm(jax.lax.stop_gradient(move), axis=-1, keepdims=True)
                time_encode = sinusoidal_encode_with_exp(t, move_norm, 0, 4)
            else:
                time_encode = sinusoidal_encode(t, 0, 4)
            time_encode = jax.lax.stop_gradient(time_encode).astype(hash_feat.dtype)

        if time_encode is not None and self.time_inject_before_sigma:
            cat_feat = jnp.concatenate([hash_feat, time_encode], axis=-1)
        else:
            cat_feat = hash_feat

        base_out = self.mlp_base(cat_feat)
        density_before = base_out[:, :1].astype(jnp.float32)
        geo_feat = base_out[:, 1:]
        raw_act = density_before - 1.0
        if self.density_clamp > 0:
            raw_act = jnp.minimum(raw_act, self.density_clamp)
        density = trunc_exp(raw_act) * selector[:, None]

        results = {"density": density}
        if return_feat:
            if time_encode is not None and not self.time_inject_before_sigma:
                results["base_mlp_out"] = jnp.concatenate([geo_feat, time_encode], axis=-1)
            else:
                results["base_mlp_out"] = geo_feat
        if return_internal:
            internal = {"move": move, "selector": selector}
            if self.use_feat_predict or self.use_weight_predict:
                temp_feat = sinusoidal_encode(jnp.concatenate([x_move, t], axis=-1), 0, 4)
                if self.use_feat_predict:
                    predict_feat = self.mlp_feat_prediction(temp_feat).astype(jnp.float32)
                    loss_feat = huber(predict_feat, hash_feat.astype(jnp.float32))
                    internal["latent_losses"] = loss_feat * selector[:, None]
                if self.use_weight_predict:
                    internal["weight_losses"] = (
                        self.mlp_weight_prediction(temp_feat).astype(jnp.float32)
                    )
            results["internal"] = internal
        return results

    def query_rgb(self, directions, embedding):
        """View-dependent color head. Reference model.py:447-466."""
        if self.use_viewdirs:
            d = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
            d_enc = sh_encode_deg2(d).astype(embedding.dtype)
            h = jnp.concatenate([d_enc, embedding], axis=-1)
        else:
            h = embedding
        rgb = self.mlp_head(h).astype(jnp.float32)
        return jax.nn.sigmoid(rgb)

    def __call__(self, positions, t, directions=None, return_internal: bool = False,
                 skip_move: bool = False):
        """Full field query: (rgb, sigma_results). Reference model.py:468-488."""
        sigma_results = self.query_density(
            positions, t, return_feat=True, return_internal=return_internal,
            skip_move=skip_move,
        )
        rgb = self.query_rgb(directions, sigma_results["base_mlp_out"])
        return rgb, sigma_results
