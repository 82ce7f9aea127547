"""Parameter-free input encodings: sinusoidal (NeRF PE) and spherical
harmonics.

Math parity targets in the reference:
  * SinusoidalEncoder            — cednerf/encoder.py:6-44
  * SinusoidalEncoderWithExp     — cednerf/encoder.py:46-91 (motion-adaptive
    time attenuation: frequency i is damped by exp(-x_var * i * 2^i))
  * tcnn SphericalHarmonics deg2 — cednerf/model.py:226-239 (we use the
    standard real-SH basis up to l=1; the exact constants differ from tcnn's
    polynomial but span the same function space, which is what training needs)

These are pure jnp functions (no parameters), usable inside Pallas kernels or
plain XLA programs.
"""

import numpy as np
import jax.numpy as jnp


def sinusoidal_latent_dim(x_dim: int, min_deg: int, max_deg: int, use_identity: bool = True) -> int:
    return (int(use_identity) + (max_deg - min_deg) * 2) * x_dim


def sinusoidal_encode(x, min_deg: int, max_deg: int, use_identity: bool = True):
    """Classic NeRF positional encoding.

    Args:
      x: [..., D] input.
    Returns:
      [..., (use_identity + 2*(max_deg-min_deg)) * D] encoding laid out as
      [x?, sin(x*2^i) for all (i, d), cos(x*2^i) for all (i, d)] — the same
      layout as the reference (sin of [xb, xb + pi/2] concatenated).
    """
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)], dtype=x.dtype)
    # [..., n_deg, D] -> [..., n_deg * D]
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * np.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


def sinusoidal_encode_with_exp(x, x_var, min_deg: int, max_deg: int, use_identity: bool = True):
    """Sinusoidal encoding with per-frequency exponential damping.

    Frequency band i (scale 2^i) is multiplied by exp(-x_var * i * 2^i); with
    x_var = ||motion|| this attenuates high-frequency time features in fast-
    moving regions (reference: cednerf/encoder.py:59-61, :86).

    Args:
      x:     [..., D]
      x_var: [..., 1] non-negative damping magnitude (detached upstream).
    """
    if max_deg == min_deg:
        return x
    degs = list(range(min_deg, max_deg))
    scales = jnp.asarray([2.0 ** i for i in degs], dtype=x.dtype)
    scales_move = jnp.asarray([i * 2.0 ** i for i in degs], dtype=x.dtype)
    n_deg = len(degs)
    d = x.shape[-1]
    xb = (x[..., None, :] * scales[:, None])  # [..., n_deg, D]
    damp = jnp.exp(-(x_var[..., None, :] * scales_move[:, None])[..., 0])  # [..., n_deg]
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * np.pi], axis=-1))  # [..., n_deg, 2D]
    latent = latent * damp[..., None]
    latent = latent.reshape(*x.shape[:-1], n_deg * d * 2)
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


# Real spherical harmonics constants (l = 0, 1).
_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199


def sh_encode_deg2(dirs):
    """Degree-2 spherical-harmonics basis (4 coefficients) of unit directions.

    Equivalent role to tcnn's SphericalHarmonics(degree=2) view-direction
    encoding (reference: cednerf/model.py:226-239). Takes *unit* directions in
    [-1, 1] (the reference remaps to [0, 1] purely as a tcnn input convention
    and tcnn maps back internally; we skip the round trip).

    Returns: [..., 4]
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack(
        [
            jnp.full_like(x, _SH_C0),
            -_SH_C1 * y,
            _SH_C1 * z,
            -_SH_C1 * x,
        ],
        axis=-1,
    )
