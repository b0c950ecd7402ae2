"""Regional models: WRF transformer + downscaling transformer.

From-scratch flax re-designs of the reference's regional architectures
(reference: credit/models/swin_wrf.py:285 WRFTransformer — dual cube
embeddings for the interior domain and the outside/driving-model state,
FiLM conditioning on a time encoding, FuXi-style UTransformer core;
credit/models/dscale_wrf.py:289 DscaleTransformer — separate input/target
channel counts with a FiLM-conditioned core and a patch-recovery head onto
a distinct target grid). Regional semantics: the domain is NOT periodic —
no earth (spherical) padding; boundary information enters through the
outside-state branch instead of wraparound.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel, channels_to_frames
from credit_tpu.models.fuxi import UTransformer
from credit_tpu.models.layers import CubeEmbedding
from credit_tpu.ops.upsample import bilinear_resize


class FiLM(nn.Module):
    """Feature-wise linear modulation from a flat conditioning vector
    (reference: swin_wrf.py:203-207 / dscale_wrf.py:443-448)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        ab = nn.Dense(2 * self.dim, dtype=self.dtype, name="film")(z)
        alpha, beta = jnp.split(ab, 2, axis=-1)
        return alpha[:, None, None, :], beta[:, None, None, :]


def _channels(p: dict, output: bool = False) -> int:
    base = int(p["channels"]) * int(p["levels"]) + int(p["surface_channels"])
    key = "output_only_channels" if output else "input_only_channels"
    return base + int(p.get(key, 0))


@registry.register("model", "wrf")
class WRFTransformer(BaseModel):
    """Regional WRF emulator (reference swin_wrf.py:285).

    __call__(x, x_outside=None, x_extra=None):
      x         (B, frames, H_in, W_in, C_interior)  — interior state
      x_outside (B, frames, H_out, W_out, C_outside) — driving model state
      x_extra   (B, time_encode_dim)                 — time encoding
    Returns (B, 1, H_in, W_in, C_target_interior).
    """

    param_interior: Any = None
    param_outside: Any = None
    time_encode_dim: int = 12
    num_groups: int = 32
    num_heads: int = 8
    depth: int = 4
    window_size: int = 7
    use_spectral_norm: bool = True
    interp: bool = True
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @property
    def base_input_channels(self):
        return _channels(self.param_interior)

    @property
    def base_output_channels(self):
        return _channels(self.param_interior, output=True)

    @nn.compact
    def __call__(self, x, x_outside: Optional[jnp.ndarray] = None,
                 x_extra: Optional[jnp.ndarray] = None, train: bool = False):
        pi, po = self.param_interior, self.param_outside or self.param_interior
        dt = self.compute_dtype
        b, frames, hh, ww, _ = x.shape
        dim = int(pi["dim"])

        # interior embedding (regional grid — zero pad only, never earth pad)
        x = CubeEmbedding(dim, (int(pi.get("frame_patch_size", frames)),
                                int(pi["patch_height"]), int(pi["patch_width"])),
                          dtype=dt, name="cube_embedding_inside")(x, train)
        x = x.reshape(b, x.shape[2], x.shape[3], dim)

        # outside/driving-model embedding, FiLM-modulated by the time encode
        if x_outside is not None:
            zo = CubeEmbedding(dim, (int(po.get("frame_patch_size", frames)),
                                     int(po["patch_height"]), int(po["patch_width"])),
                               dtype=dt, name="cube_embedding_outside")(
                                   x_outside, train)
            zo = zo.reshape(b, zo.shape[2], zo.shape[3], dim)
            if zo.shape[1:3] != x.shape[1:3]:
                zo = bilinear_resize(zo, x.shape[1], x.shape[2])
            if x_extra is not None:
                alpha, beta = FiLM(dim, dtype=dt, name="film")(x_extra)
                zo = alpha * zo + beta
            x = x + zo

        x = UTransformer(dim, self.num_groups, self.num_heads,
                         self.window_size, self.depth,
                         use_sn=self.use_spectral_norm, dtype=dt,
                         remat=self.remat, name="u_transformer")(x, train)

        out_c = self.base_output_channels
        ph, pw = int(pi["patch_height"]), int(pi["patch_width"])
        x = nn.Dense(out_c * ph * pw, dtype=dt, name="fc")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh, gw, ph, pw, out_c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * ph, gw * pw, out_c)
        if self.interp:
            x = bilinear_resize(x, hh, ww)
        return channels_to_frames(x, 1)


@registry.register("model", "dscale")
class DscaleTransformer(BaseModel):
    """Regional downscaling transformer (reference dscale_wrf.py:289):
    coarse input grid -> fine target grid with distinct channel counts.

    __call__(x, x_extra=None):
      x       (B, frames, H_in, W_in, total_input_channels)
      x_extra (B, time_encode_dim)
    Returns (B, 1, out_image_height, out_image_width, total_target_channels).
    """

    image_height: int = 64
    image_width: int = 128
    out_image_height: Any = None       # target grid (defaults to input grid)
    out_image_width: Any = None
    patch_height: int = 4
    patch_width: int = 4
    total_input_channels: int = 50
    total_target_channels: int = 80
    time_encode_dim: int = 4
    frames: int = 2
    frame_patch_size: int = 2
    dim: int = 256
    num_groups: int = 32
    num_heads: int = 8
    depth: int = 4
    window_size: int = 7
    use_spectral_norm: bool = True
    interp: bool = True
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @property
    def base_input_channels(self):
        return self.total_input_channels

    @property
    def base_output_channels(self):
        return self.total_target_channels

    @nn.compact
    def __call__(self, x, x_extra: Optional[jnp.ndarray] = None,
                 train: bool = False):
        dt = self.compute_dtype
        b = x.shape[0]
        x = CubeEmbedding(self.dim, (self.frame_patch_size, self.patch_height,
                                     self.patch_width),
                          dtype=dt, name="cube_embedding")(x, train)
        x = x.reshape(b, x.shape[2], x.shape[3], self.dim)

        if x_extra is not None:  # FiLM time conditioning on the embedding
            alpha, beta = FiLM(self.dim, dtype=dt, name="film")(x_extra)
            x = alpha * x + beta

        x = UTransformer(self.dim, self.num_groups, self.num_heads,
                         self.window_size, self.depth,
                         use_sn=self.use_spectral_norm, dtype=dt,
                         remat=self.remat, name="u_transformer")(x, train)

        out_c = self.total_target_channels
        ph, pw = self.patch_height, self.patch_width
        x = nn.Dense(out_c * ph * pw, dtype=dt, name="fc")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh, gw, ph, pw, out_c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * ph, gw * pw, out_c)
        if self.interp:
            x = bilinear_resize(x, self.out_image_height or self.image_height,
                                self.out_image_width or self.image_width)
        return channels_to_frames(x, 1)
