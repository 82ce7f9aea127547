"""Small math utilities shared across the framework."""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """Exponential with a clamped-gradient backward pass.

    Matches the reference's truncated exp used as the density activation
    (reference: cednerf/utils.py:27-43): forward is exp(x) in fp32, backward
    multiplies the cotangent by exp(clamp(x, max=15)) so huge pre-activations
    cannot blow up gradients.
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def exclusive_cumsum(x, axis=-1):
    """Cumulative sum shifted right by one (first element is zero)."""
    cs = jnp.cumsum(x, axis=axis)
    return cs - x


def psnr(pred, target):
    """PSNR in dB for images/batches in [0, 1]."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
