"""FuXi: cube embedding + U-Transformer (SwinV2 core) + patch recovery.

From-scratch flax re-design of the reference FuXi
(reference: credit/models/fuxi.py:308 — CubeEmbedding:82 Conv3d patch embed,
DownBlock:146, UTransformer:204 (conv down -> SwinTransformerV2Stage ->
conv-transpose up with skip concat), UpBlock:175, window pad helpers
get_pad2d:25, dense patch-recovery head, spherical TensorPadding).
Channels-last; optional noise injection hook mirrors the SDL variant.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel, channels_to_frames
from credit_tpu.models.layers import CubeEmbedding, GroupNorm, SNConv, SNConvTranspose
from credit_tpu.models.swin import SwinStageV2
from credit_tpu.ops.padding import TensorPadding
from credit_tpu.ops.upsample import bilinear_resize


class DownBlock(nn.Module):
    out_chans: int
    num_groups: int
    num_residuals: int = 2
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SNConv(self.out_chans, (3, 3), (2, 2), 1, use_sn=self.use_sn,
                   dtype=self.dtype, name="down")(x, train)
        sc = x
        for i in range(self.num_residuals):
            x = SNConv(self.out_chans, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                       dtype=self.dtype, name=f"res_conv{i}")(x, train)
            x = GroupNorm(self.num_groups, dtype=self.dtype, name=f"res_gn{i}")(x)
            x = nn.silu(x)
        return x + sc


class UpBlock(nn.Module):
    out_chans: int
    num_groups: int
    num_residuals: int = 2
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SNConvTranspose(self.out_chans, (2, 2), (2, 2), 0, use_sn=self.use_sn,
                            dtype=self.dtype, name="up")(x, train)
        sc = x
        for i in range(self.num_residuals):
            x = SNConv(self.out_chans, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                       dtype=self.dtype, name=f"res_conv{i}")(x, train)
            x = GroupNorm(self.num_groups, dtype=self.dtype, name=f"res_gn{i}")(x)
            x = nn.silu(x)
        return x + sc


class UTransformer(nn.Module):
    """DownBlock -> (pad to window multiple) SwinV2 stage (crop) -> skip
    concat -> UpBlock (reference fuxi.py:204)."""

    dim: int
    num_groups: int
    num_heads: int
    window_size: int
    depth: int
    use_sn: bool = True
    dtype: Any = jnp.float32
    remat: bool = False
    scan_blocks: bool = False
    mlp_fuse: str = "never"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DownBlock(self.dim, self.num_groups, use_sn=self.use_sn,
                      dtype=self.dtype, name="down")(x, train)
        shortcut = x
        b, h, w, c = x.shape
        ws = self.window_size
        ph, pw = (-h) % ws, (-w) % ws
        # symmetric zero pad (torch ZeroPad2d(get_pad2d) splits evenly)
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
        x = SwinStageV2(self.dim, self.depth, self.num_heads, ws,
                        self.dtype, self.remat,
                        scan_blocks=self.scan_blocks,
                        mlp_fuse=self.mlp_fuse, name="swin")(x)
        x = x[:, ph // 2:ph // 2 + h, pw // 2:pw // 2 + w]
        x = jnp.concatenate([shortcut, x], axis=-1)
        return UpBlock(self.dim, self.num_groups, use_sn=self.use_sn,
                       dtype=self.dtype, name="up")(x, train)


@registry.register("model", "fuxi")
class Fuxi(BaseModel):
    image_height: int = 640
    patch_height: int = 16
    image_width: int = 1280
    patch_width: int = 16
    levels: int = 15
    frames: int = 2
    frame_patch_size: int = 2
    dim: int = 1536
    num_groups: int = 32
    channels: int = 4
    surface_channels: int = 7
    input_only_channels: int = 0
    output_only_channels: int = 0
    num_heads: int = 8
    depth: int = 48
    window_size: int = 7
    use_spectral_norm: bool = True
    interp: bool = True
    padding_conf: Any = None
    compute_dtype: Any = jnp.float32
    remat: bool = False
    scan_blocks: bool = False  # scan the (unshifted, shifted) block pairs
    # conv-emitter-free graph + fused post-norm MLP kernels, mirroring
    # CrossFormer.pallas_conv/ff_fusion: cube embed becomes a patch GEMM,
    # DownBlock 3x3/s2 a strided im2col, residual 3x3s im2col, the
    # ConvTranspose a d2s GEMM — so the fused SwinV2 MLP kernel can turn
    # on without the slow-emitter tax. Measured at reference arXiv scale
    # (640x1280, one v5e, round 4): 113.1 ms/step vs the 119.4 XLA path,
    # so 'auto' (single-chip TPU inference) is the DEFAULT; 'never' keeps
    # the XLA composition; 'force' for CPU tests (interpreted).
    pallas_conv: str = "auto"
    ff_fusion: str = "auto"

    @property
    def base_input_channels(self):
        return self.channels * self.levels + self.surface_channels + self.input_only_channels

    @property
    def base_output_channels(self):
        return self.channels * self.levels + self.surface_channels + self.output_only_channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T=frames, H, W, C_in) -> (B, 1, H, W, C_out)."""
        from credit_tpu.ops import conv as conv_ops
        from credit_tpu.ops import pallas_ff

        # same gate as CrossFormer: single chip OR explicit-halo mesh, and
        # train included (round 5 — see crossformer.py)
        pallas_on = ((self.pallas_conv == "force"
                      or (self.pallas_conv == "auto"
                          and (pallas_ff.single_chip_tpu()
                               or conv_ops.halo_mesh_active())))
                     and not self.is_initializing())
        with conv_ops.pallas_convs(pallas_on):
            return self._forward(x, train)

    def _forward(self, x, train: bool):
        pconf = self.padding_conf or {"activate": False}
        padder = TensorPadding(**pconf) if pconf.get("activate") else None
        if padder is not None:
            x = padder.pad(x)
        b = x.shape[0]
        sn = self.use_spectral_norm
        dt = self.compute_dtype

        x = CubeEmbedding(self.dim,
                          (self.frame_patch_size, self.patch_height, self.patch_width),
                          dtype=dt, name="cube_embedding")(x, train)
        # (B, T', H', W', dim) with T' = frames // frame_patch_size == 1
        x = x.reshape(b, x.shape[2], x.shape[3], self.dim)

        x = UTransformer(self.dim, self.num_groups, self.num_heads,
                         self.window_size, self.depth, use_sn=sn, dtype=dt,
                         remat=self.remat, scan_blocks=self.scan_blocks,
                         mlp_fuse=self.ff_fusion,
                         name="u_transformer")(x, train)

        out_c = self.base_output_channels
        ph, pw = self.patch_height, self.patch_width
        x = nn.Dense(out_c * ph * pw, dtype=dt, name="fc")(x)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh, ww, ph, pw, out_c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hh * ph, ww * pw, out_c)

        if padder is not None:
            x = padder.unpad(x[:, None])[:, 0]
        if self.interp:
            x = bilinear_resize(x, self.image_height, self.image_width)
        return channels_to_frames(x, 1)
