"""Diffusion backbones: crossformer-diffusion and unet-diffusion.

Conditioned denoisers (reference: credit/models/wxformer/
crossformer_diffusion.py and credit/models/unet_diffusion.py wrapped by
credit/diffusion.py): input = concat(condition state, noisy target) along
channels + a sinusoidal diffusion-time embedding injected FiLM-style after
the first encoder stage.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.crossformer import CrossFormer
from credit_tpu.models.unet import UNet


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """t in [0, 1], shape (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / max(half - 1, 1))
    ang = t[:, None] * 1000.0 * freqs[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeFiLM(nn.Module):
    """scale/shift features by a time embedding."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, t_frac):
        c = feat.shape[-1]
        emb = sinusoidal_embedding(t_frac, 128).astype(self.dtype)
        emb = nn.Dense(256, dtype=self.dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        sb = nn.Dense(2 * c, dtype=self.dtype, name="fc2")(emb)
        scale, shift = jnp.split(sb, 2, axis=-1)
        shape = (feat.shape[0],) + (1,) * (feat.ndim - 2) + (c,)
        return feat * (1 + scale.reshape(shape)) + shift.reshape(shape)


@registry.register("model", "crossformer-diffusion")
class CrossFormerDiffusion(CrossFormer):
    """CrossFormer denoiser: __call__(x_cond, y_noisy, t_frac).

    Channel arithmetic mirrors the reference's `diffusion` kwarg
    (crossformer.py:563: input_channels += output_channels).
    """

    @nn.compact
    def __call__(self, x, y_noisy=None, t_frac=None, train: bool = False):
        if y_noisy is None:  # plain forward for shape checks
            y_noisy = jnp.zeros(
                (*x.shape[:-1], self.base_output_channels), x.dtype)
            t_frac = jnp.zeros((x.shape[0],), x.dtype)
        x_in = jnp.concatenate([x, y_noisy], axis=-1)
        # time conditioning on the raw channel stack before the encoder
        x_in = TimeFiLM(dtype=self.compute_dtype, name="time_film")(x_in, t_frac)
        return CrossFormer.__call__(self, x_in, train)

    @property
    def base_input_channels(self) -> int:
        base = (self.channels * self.levels + self.surface_channels
                + self.input_only_channels)
        return base  # condition channels only; y_noisy concat is internal


@registry.register("model", "unet-diffusion")
class UNetDiffusion(UNet):
    @nn.compact
    def __call__(self, x, y_noisy=None, t_frac=None, train: bool = False):
        if y_noisy is None:
            y_noisy = jnp.zeros(
                (*x.shape[:-1], self.base_output_channels), x.dtype)
            t_frac = jnp.zeros((x.shape[0],), x.dtype)
        x_in = jnp.concatenate([x, y_noisy], axis=-1)
        x_in = TimeFiLM(dtype=self.compute_dtype, name="time_film")(x_in, t_frac)
        return UNet.__call__(self, x_in, train)
