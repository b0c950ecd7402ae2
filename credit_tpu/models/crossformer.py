"""WXFormer / CrossFormer: the flagship architecture.

TPU-native re-design of the reference CrossFormer U-Net
(reference: credit/models/wxformer/crossformer.py:461): 4-stage encoder of
multi-kernel strided-conv patch embeds (CrossEmbedLayer) + alternating
short-window / long-dilated attention transformers, ConvTranspose or
PixelShuffle decoder with U-Net skip concats, spherical ('earth') boundary
padding, bilinear recovery to the native grid, and optional spectral norm on
every conv/linear.

Differences by design (not omissions):
  - channels-last (NHWC) layout; 1x1 convs are Dense (MXU-friendly).
  - spectral norm is explicit 'spectral' collection state (see layers.py).
  - the in-model gen1 PostBlock is NOT inside the model; conservation fixers
    are composable postblocks applied by the trainer/rollout engine (the
    reference's own gen2 direction, credit/postblock/__init__.py:147).
  - input is (B, T, H, W, C_in) and output (B, T_out, H, W, C_out).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel, channels_to_frames, frames_to_channels
from credit_tpu.models.layers import (
    CrossEmbedLayer,
    CubeEmbedding,
    SNConv,
    SNConvTranspose,
    Transformer,
    UpBlock,
    UpBlockPS,
)
from credit_tpu.ops.padding import TensorPadding
from credit_tpu.ops.upsample import bilinear_resize, icnr_kernel_init, pixel_shuffle


def _tup(v, n=4):
    v = tuple(v) if isinstance(v, (tuple, list)) else (v,) * n
    return v


@registry.register("model", "crossformer")
@registry.register("model", "wxformer")
class CrossFormer(BaseModel):
    """See module docstring. Constructor fields mirror the reference config
    keys (credit_smoke_test_v2.yml model section) one-for-one."""

    image_height: int = 640
    image_width: int = 1280
    patch_height: int = 1
    patch_width: int = 1
    frames: int = 2
    output_frames: int = 1
    channels: int = 4
    surface_channels: int = 7
    input_only_channels: int = 3
    output_only_channels: int = 0
    levels: int = 15
    dim: Sequence[int] = (64, 128, 256, 512)
    depth: Sequence[int] = (2, 2, 8, 2)
    dim_head: int = 32
    global_window_size: Sequence[int] = (5, 5, 2, 1)
    local_window_size: Any = 10
    cross_embed_kernel_sizes: Sequence = ((4, 8, 16, 32), (2, 4), (2, 4), (2, 4))
    cross_embed_strides: Sequence[int] = (4, 2, 2, 2)
    use_spectral_norm: bool = True
    interp: bool = True
    upsample_with_ps: bool = False
    padding_conf: Any = None
    use_interp: bool = True  # alias used by some configs
    compute_dtype: Any = jnp.float32
    # remat: bool, or a per-stage sequence like [1, 1, 0, 0] — recompute
    # only where activations are large (stage 0/1); the late small stages
    # keep their activations and skip the recompute tax (reference
    # analogue: models/__init__.py:193 per-module AC policy table)
    remat: Any = False
    scan_blocks: bool = False  # scan-over-layers: one block graph per stage
    use_pallas_attention: bool = False
    # fused Pallas FF blocks (ops/pallas_ff.py): 'auto' (DEFAULT — on for
    # TPU inference inside a conv-emitter-free graph, see fuse_ok_auto),
    # 'never' (the XLA composition), 'force' (tests). History: the kernel
    # is 2x faster than the XLA FF in isolation, but ANY pallas call
    # reachable from an XLA conv's output flips that conv onto a ~4x
    # slower emitter (29 -> 115 ms/step at stage-0; reproduction in
    # tools/bench_conv_ffk.py) — which is why 'auto' only engages when
    # pallas_conv has removed every conv emitter. Measured at 0.25 deg
    # (round 4, one v5e): XLA 135.8 -> pallas_conv+ff 126.7 ms/step.
    ff_fusion: str = "auto"
    # conv-emitter-free forms for ALL convs: big embeds as blocked Pallas
    # kernels (ops/pallas_conv.py, parity with XLA's fast emitter at the
    # stage-0 shape), small kernels as im2col shift-GEMMs (several small
    # shapes crash Mosaic at runtime — pallas_conv.im2col_conv), 1x1 as
    # plain dots. The prerequisite for ff_fusion (see above).
    # 'auto' (DEFAULT: single-chip TPU inference — the conv kernel is not
    # GSPMD-partitioned yet) | 'never' | 'force' (CPU tests, interpreted).
    pallas_conv: str = "auto"
    # camulator delta: zero-init 3x3 'sharp' residual conv on the decoder
    # output, EXCLUDED from spectral norm (reference camulator.py:22-26
    # apply_spectral_norm skips names containing 'sharp'; :78-94 zero-init)
    sharp_skip: bool = False
    # downscaling delta: output grid may differ from the input grid
    # (reference wxformer/crossformer_downscaling.py) — the final bilinear
    # recovery targets (out_image_height, out_image_width) when set
    out_image_height: Any = None
    out_image_width: Any = None

    @property
    def base_input_channels(self) -> int:
        return self.channels * self.levels + self.surface_channels + self.input_only_channels

    @property
    def base_output_channels(self) -> int:
        return self.channels * self.levels + self.surface_channels + self.output_only_channels

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, T, H, W, C_in_base) -> (B, T_out, H, W, C_out_base)."""
        from credit_tpu.ops import conv as conv_ops
        from credit_tpu.ops import pallas_ff

        # 'auto' engages on a single chip, or under a mesh when the caller
        # provides the explicit-halo context (ops/conv.explicit_halo: conv
        # paths run shard_map halo rings, sharded-parity-tested) — and in
        # TRAIN mode too (round 5: the conv-grad + FF-backward kernels
        # measured 537 -> 440 ms/step on the flagship, docs/PERF.md)
        pallas_on = ((self.pallas_conv == "force"
                      or (self.pallas_conv == "auto"
                          and (pallas_ff.single_chip_tpu()
                               or conv_ops.halo_mesh_active())))
                     and not self.is_initializing())
        with conv_ops.pallas_convs(pallas_on):
            return self._forward(x, train)

    def _forward(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dims = _tup(self.dim)
        depths = _tup(self.depth)
        gws = _tup(self.global_window_size)
        lws = _tup(self.local_window_size)
        strides = _tup(self.cross_embed_strides)
        ksizes = tuple(tuple(k) for k in self.cross_embed_kernel_sizes)
        sn = self.use_spectral_norm
        dt = self.compute_dtype
        last = dims[-1]

        pconf = self.padding_conf or {"activate": False}
        padder = TensorPadding(**pconf) if pconf.get("activate") else None
        if padder is not None:
            x = padder.pad(x)

        if self.patch_height > 1 and self.patch_width > 1:
            x = CubeEmbedding(
                dims[0], (self.frames, self.patch_height, self.patch_width),
                dtype=dt, name="cube_embedding")(x, train)
            # (B, T', H', W', dim0) -> fold remaining frames into channels
            x = frames_to_channels(x)
        else:
            x = frames_to_channels(x)  # (B, H, W, C*T)

        encodings = []
        for i in range(4):
            x = CrossEmbedLayer(dims[i], ksizes[i], strides[i], use_sn=sn,
                                dtype=dt, name=f"cel{i}")(x, train)
            rm = (bool(self.remat) if isinstance(self.remat, (bool, int))
                  else bool(_tup(self.remat)[i]))
            x = Transformer(dims[i], depths[i], lws[i], gws[i], self.dim_head,
                            use_sn=sn, dtype=dt, remat=rm,
                            use_pallas=self.use_pallas_attention,
                            ff_fuse=self.ff_fusion,
                            scan_blocks=self.scan_blocks,
                            name=f"transformer{i}")(x, train)
            encodings.append(x)

        out_ch = self.base_output_channels * self.output_frames
        ng = dims[0]
        if self.upsample_with_ps:
            x = UpBlockPS(last // 2, ng, use_sn=sn, dtype=dt, name="up_block1")(x, train)
            x = jnp.concatenate([x, encodings[2]], axis=-1)
            x = UpBlockPS(last // 4, ng, use_sn=sn, dtype=dt, name="up_block2")(x, train)
            x = jnp.concatenate([x, encodings[1]], axis=-1)
            x = UpBlockPS(last // 8, ng, use_sn=sn, dtype=dt, name="up_block3")(x, train)
            x = jnp.concatenate([x, encodings[0]], axis=-1)
            scale = 2
            x = SNConv(out_ch * scale * scale, (3, 3), (1, 1), 1, use_sn=sn,
                       dtype=dt, kernel_init=icnr_kernel_init(scale),
                       name="up4_ps_conv")(x, train)
            x = pixel_shuffle(x, scale)
            x = SNConv(out_ch, (3, 3), (1, 1), 1, use_sn=sn, dtype=dt,
                       name="up4_refine")(x, train)
        else:
            x = UpBlock(last // 2, ng, use_sn=sn, dtype=dt, name="up_block1")(x, train)
            x = jnp.concatenate([x, encodings[2]], axis=-1)
            x = UpBlock(last // 4, ng, use_sn=sn, dtype=dt, name="up_block2")(x, train)
            x = jnp.concatenate([x, encodings[1]], axis=-1)
            x = UpBlock(last // 8, ng, use_sn=sn, dtype=dt, name="up_block3")(x, train)
            x = jnp.concatenate([x, encodings[0]], axis=-1)
            x = SNConvTranspose(out_ch, (4, 4), (2, 2), 1, use_sn=sn, dtype=dt,
                                name="up_block4")(x, train)

        if self.sharp_skip:
            # plain (non-SN) conv, zero-init: identity at init, learns a
            # sharpening residual free of the spectral-norm Lipschitz cap
            sharp = nn.Conv(out_ch, (3, 3), padding=1,
                            kernel_init=nn.initializers.zeros_init(),
                            bias_init=nn.initializers.zeros_init(),
                            dtype=dt, name="sharp")
            x = x + sharp(x)

        if padder is not None:
            # the reference unpads with the ORIGINAL pad sizes even when the
            # encoder/decoder round-trip changed the grid by floor rounding
            # (crossformer.py:720); the bilinear resize below recovers the
            # native grid. Mirror that exactly.
            x = padder.unpad(x)

        if self.interp:
            x = bilinear_resize(x, self.out_image_height or self.image_height,
                                self.out_image_width or self.image_width)

        return channels_to_frames(x, self.output_frames)
