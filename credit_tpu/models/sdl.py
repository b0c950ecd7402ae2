"""Stochastic decomposition layer + noise-injection CrossFormer ensemble.

Re-design of the reference's StyleGAN-style noise injection (reference:
credit/models/wxformer/stochastic_decomposition_layer.py:5 SDL — per-pixel
noise modulated by a style vector; crossformer_ensemble.py:9
CrossFormerWithNoise — SDL injection after each decoder up-block and on
encoder skip connections). Noise comes from the flax 'noise' RNG stream, so
ensembles are reproducible by key.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import channels_to_frames, frames_to_channels
from credit_tpu.models.crossformer import CrossFormer, _tup
from credit_tpu.models.layers import (
    CrossEmbedLayer, SNConvTranspose, Transformer, UpBlock)
from credit_tpu.ops.padding import TensorPadding
from credit_tpu.ops.upsample import bilinear_resize


class StochasticDecompositionLayer(nn.Module):
    """feature + pixel_noise * style(latent) * modulation.

    noise_factor is a PARAMETER (reference: stochastic_decomposition_layer
    keeps layer.noise_factor as tensor state the SDLWrapper rewrites), so
    the SDL inference wrapper can retune it per layer without retracing.
    Latent control: the raw pixel noise can be captured (sown into the
    'captured' collection) and replayed/interpolated by passing a 'latents'
    collection — exact-reproduction + smooth ensemble exploration
    (reference: sdl_inference_wrapper.py:162-324)."""

    noise_dim: int
    noise_factor: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray, latent: jnp.ndarray) -> jnp.ndarray:
        c = feature.shape[-1]
        style = nn.Dense(c, dtype=self.dtype, name="noise_transform")(latent)
        style = style.reshape(feature.shape[0], *([1] * (feature.ndim - 2)), c)
        modulation = self.param("modulation", nn.initializers.ones_init(), (c,))
        factor = self.param("noise_factor",
                            nn.initializers.constant(self.noise_factor), ())
        if self.has_variable("latents", "pixel"):
            pixel = self.get_variable("latents", "pixel")
        else:
            pixel = jax.random.normal(self.make_rng("noise"), feature.shape,
                                      self.dtype)
        self.sow("captured", "pixel", pixel)
        return feature + factor * pixel * style * modulation


@registry.register("model", "crossformer-ensemble")
@registry.register("model", "crossformer-style")
class CrossFormerWithNoise(CrossFormer):
    """CrossFormer with SDL noise injection on skips and decoder stages."""

    noise_latent_dim: int = 128
    encoder_noise_factor: float = 0.05
    decoder_noise_factor: float = 0.275
    encoder_noise: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dims = _tup(self.dim)
        depths = _tup(self.depth)
        gws = _tup(self.global_window_size)
        lws = _tup(self.local_window_size)
        strides = _tup(self.cross_embed_strides)
        ksizes = tuple(tuple(k) for k in self.cross_embed_kernel_sizes)
        sn = self.use_spectral_norm
        dt = self.compute_dtype
        last = dims[-1]

        latent = jax.random.normal(self.make_rng("noise"),
                                   (x.shape[0], self.noise_latent_dim), dt)

        pconf = self.padding_conf or {"activate": False}
        padder = TensorPadding(**pconf) if pconf.get("activate") else None
        if padder is not None:
            x = padder.pad(x)
        x = frames_to_channels(x)

        encodings = []
        for i in range(4):
            x = CrossEmbedLayer(dims[i], ksizes[i], strides[i], use_sn=sn,
                                dtype=dt, name=f"cel{i}")(x, train)
            x = Transformer(dims[i], depths[i], lws[i], gws[i], self.dim_head,
                            use_sn=sn, dtype=dt, name=f"transformer{i}")(x, train)
            encodings.append(x)

        def inject(name, feat, factor):
            return StochasticDecompositionLayer(
                self.noise_latent_dim, factor, dt, name=name)(feat, latent)

        if self.encoder_noise:
            encodings[2] = inject("encoder_noise0", encodings[2], self.encoder_noise_factor)
            encodings[1] = inject("encoder_noise1", encodings[1], self.encoder_noise_factor)
            encodings[0] = inject("encoder_noise2", encodings[0], self.encoder_noise_factor)

        out_ch = self.base_output_channels * self.output_frames
        ng = dims[0]
        x = UpBlock(last // 2, ng, use_sn=sn, dtype=dt, name="up_block1")(x, train)
        x = inject("noise_inject1", x, self.decoder_noise_factor)
        x = jnp.concatenate([x, encodings[2]], axis=-1)
        x = UpBlock(last // 4, ng, use_sn=sn, dtype=dt, name="up_block2")(x, train)
        x = inject("noise_inject2", x, self.decoder_noise_factor)
        x = jnp.concatenate([x, encodings[1]], axis=-1)
        x = UpBlock(last // 8, ng, use_sn=sn, dtype=dt, name="up_block3")(x, train)
        x = inject("noise_inject3", x, self.decoder_noise_factor)
        x = jnp.concatenate([x, encodings[0]], axis=-1)
        x = SNConvTranspose(out_ch, (4, 4), (2, 2), 1, use_sn=sn, dtype=dt,
                            name="up_block4")(x, train)

        if padder is not None:
            x = padder.unpad(x)
        if self.interp:
            x = bilinear_resize(x, self.image_height, self.image_width)
        return channels_to_frames(x, self.output_frames)
