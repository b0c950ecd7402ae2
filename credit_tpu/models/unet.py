"""Plain U-Net forecast/segmentation model.

The reference wraps segmentation-models-pytorch (reference:
credit/models/unet.py SegmentationModel); this is a self-contained flax
U-Net with the same role: conv encoder/decoder with skip connections for
gridded prediction and downscaling heads (also backs `unet_downscaling`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel, channels_to_frames, frames_to_channels
from credit_tpu.models.layers import GroupNorm, SNConv, SNConvTranspose
from credit_tpu.ops.upsample import bilinear_resize


class ConvBlock(nn.Module):
    features: int
    num_groups: int = 8
    use_sn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = SNConv(self.features, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                       dtype=self.dtype, name=f"conv{i}")(x, train)
            x = GroupNorm(min(self.num_groups, self.features), dtype=self.dtype,
                          name=f"gn{i}")(x)
            x = nn.silu(x)
        return x


@registry.register("model", "unet")
@registry.register("model", "unet_downscaling")
class UNet(BaseModel):
    image_height: int = 181
    image_width: int = 360
    frames: int = 1
    output_frames: int = 1
    channels: int = 4
    surface_channels: int = 4
    input_only_channels: int = 0
    output_only_channels: int = 0
    levels: int = 15
    encoder_dims: Sequence[int] = (64, 128, 256, 512)
    use_spectral_norm: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def base_input_channels(self):
        return self.channels * self.levels + self.surface_channels + self.input_only_channels

    @property
    def base_output_channels(self):
        return self.channels * self.levels + self.surface_channels + self.output_only_channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, hh, ww, c = x.shape
        x = frames_to_channels(x)
        n = len(self.encoder_dims)
        # pad to 2^n multiple
        mult = 2 ** (n - 1)
        ph, pw = (-hh) % mult, (-ww) % mult
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        skips = []
        for i, d in enumerate(self.encoder_dims):
            if i > 0:
                x = nn.max_pool(x, (2, 2), (2, 2))
            x = ConvBlock(d, use_sn=self.use_spectral_norm, dtype=self.compute_dtype,
                          name=f"enc{i}")(x, train)
            skips.append(x)
        for i, d in reversed(list(enumerate(self.encoder_dims[:-1]))):
            x = SNConvTranspose(d, (2, 2), (2, 2), 0, use_sn=self.use_spectral_norm,
                                dtype=self.compute_dtype, name=f"up{i}")(x, train)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ConvBlock(d, use_sn=self.use_spectral_norm, dtype=self.compute_dtype,
                          name=f"dec{i}")(x, train)
        out_c = self.base_output_channels * self.output_frames
        x = SNConv(out_c, (1, 1), use_sn=False, dtype=self.compute_dtype,
                   name="head")(x, train)
        x = x[:, :hh, :ww]
        if (hh, ww) != (self.image_height, self.image_width):
            x = bilinear_resize(x, self.image_height, self.image_width)
        return channels_to_frames(x, self.output_frames)
