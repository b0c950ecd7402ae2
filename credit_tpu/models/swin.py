"""Swin Transformer V2 blocks + standalone model.

From-scratch flax implementation of the SwinV2 machinery the reference pulls
from timm (reference: credit/models/fuxi.py:204 UTransformer wraps
timm.SwinTransformerV2Stage; credit/models/swin.py is a standalone SwinV2Cr):
cosine attention with learned per-head logit scale, log-spaced continuous
relative-position bias (CPB MLP), shifted windows with masking, post-norm
residuals. Channels-last throughout; windows partition as pure reshapes.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel, channels_to_frames, frames_to_channels

Dtype = Any


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(xw, ws, h, w):
    b = xw.shape[0] // ((h // ws) * (w // ws))
    x = xw.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_coords_table(ws: int) -> np.ndarray:
    """Log-spaced normalized relative coordinates ((2w-1)^2, 2) — SwinV2 CPB."""
    coords = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)
    table = table / (ws - 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    """(nWin, T, T) additive mask for shifted windows, built from iota ops.

    The previous np version materialized the mask as a module CONSTANT —
    at FuXi scale (345 windows x 49 x 49 f32) that is 3.3 MB serialized
    PER SHIFTED BLOCK, a 107 MB module for the depth-16 rollout. The iota
    form is a few ops that XLA folds on device."""
    def region(n):
        i = jnp.arange(n)
        return jnp.where(i < n - ws, 0, jnp.where(i < n - shift, 1, 2))

    img = region(h)[:, None] * 3 + region(w)[None, :]
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, :, None] != win[:, None, :]
    return jnp.where(diff, -100.0, 0.0).astype(jnp.float32)


class _QKVKernel(nn.Module):
    """Holds the combined qkv projection kernel at the same param path /
    init as `nn.Dense(features, name="qkv")`, but returns the KERNEL so
    the caller can run per-output-slice GEMMs (avoids materializing the
    concatenated qkv activation)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (x.shape[-1], self.features))


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xw, mask=None):
        """xw: (nB, T, C) window tokens; mask: (nWin, T, T) or None."""
        nb, t, c = xw.shape
        h = self.num_heads
        dh = c // h
        # three GEMMs against static column slices of one `qkv` kernel —
        # bit-identical to Dense(3c) + jnp.split but the concatenated qkv
        # never round-trips HBM (see models.layers.SNDense.split_outputs);
        # param path stays `qkv/kernel` for the torch converter
        qkv_kernel = _QKVKernel(3 * c, name="qkv")(xw)
        # SwinV2: separate bias for q and v only
        q_bias = self.param("q_bias", nn.initializers.zeros_init(), (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros_init(), (c,))
        xq = xw.astype(self.dtype)
        kq = qkv_kernel.astype(self.dtype)
        q = xq @ kq[:, :c] + q_bias.astype(self.dtype)
        k = xq @ kq[:, c:2 * c]
        v = xq @ kq[:, 2 * c:] + v_bias.astype(self.dtype)
        q = q.reshape(nb, t, h, dh)
        k = k.reshape(nb, t, h, dh)
        v = v.reshape(nb, t, h, dh)

        # cosine attention with learned temperature
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(math.log(10.0)), (h, 1, 1))
        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        attn = jnp.einsum("bthd,bshd->bhts", qn, kn,
                          preferred_element_type=jnp.float32)
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
        attn = attn * scale

        # continuous relative position bias — params+static-grid only, so
        # loop-invariant across a rollout; same cache protocol as
        # models.layers.WindowAttention (fill under mutable=["dpb_cache"],
        # read back afterwards)
        fill = (self.is_mutable_collection("dpb_cache")
                and not self.is_initializing())
        if self.has_variable("dpb_cache", "bias") and not fill:
            bias_hts = self.get_variable("dpb_cache", "bias")
        else:
            table = jnp.asarray(_relative_coords_table(self.window_size))
            cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table)
            cpb = nn.relu(cpb)
            cpb = nn.Dense(h, use_bias=False, dtype=jnp.float32,
                           name="cpb_fc2")(cpb)
            idx = jnp.asarray(_relative_position_index(self.window_size))
            bias = cpb[idx]                      # (T, T, heads)
            bias_hts = (16.0 * jax.nn.sigmoid(bias)).transpose(2, 0, 1)
            if fill:
                cache = self.variable("dpb_cache", "bias", lambda: bias_hts)
                cache.value = bias_hts
        attn = attn + bias_hts[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nb // nw, nw, h, t, t) + mask[None, :, None]
            attn = attn.reshape(nb, h, t, t)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(nb, t, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlockV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    # fused Pallas MLP: default off — same conv-emitter interplay as
    # CrossFormer.ff_fusion (FuXi's cube embed is a conv too)
    mlp_fuse: str = "never"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0

        y = x
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
        else:
            mask = None
        yw = _window_partition(y, ws)
        yw = WindowAttentionV2(self.dim, self.num_heads, ws, self.dtype,
                               name="attn")(yw, mask)
        y = _window_reverse(yw, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        # SwinV2 post-norm residual
        x = x + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(y)

        hidden = int(c * self.mlp_ratio)
        fc1 = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")
        fc2 = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        from credit_tpu.ops import pallas_ff

        if ((self.mlp_fuse == "force"
             or (self.mlp_fuse == "auto" and pallas_ff.fuse_ok_auto()))
                and not self.is_initializing()
                and pallas_ff.ff_fits_shape(x.shape, hidden,
                                            x.dtype.itemsize)):
            # SwinV2 post-norm MLP as one fused Pallas kernel: x read once,
            # result written once (see ops/pallas_ff.py). Create the params
            # on tiny dummies (DCE'd), then hand them to the kernel.
            _ = fc1(jnp.zeros((1, c), x.dtype))
            _ = fc2(jnp.zeros((1, hidden), x.dtype))
            _ = ln2(jnp.zeros((1, c), x.dtype))
            p1, p2, pl_ = (fc1.variables["params"], fc2.variables["params"],
                           ln2.variables["params"])
            return pallas_ff.fused_ff_diff(
                x, pl_["scale"], pl_["bias"],
                p1["kernel"].astype(self.dtype), p1["bias"],
                p2["kernel"].astype(self.dtype), p2["bias"], True)
        y = fc1(x)
        y = nn.gelu(y, approximate=False)
        y = fc2(y)
        x = x + ln2(y)
        return x


class _SwinBlockPair(nn.Module):
    """(unshifted, shifted) SwinV2 block pair — the scan body for
    SwinStageV2.scan_blocks (carry-only signature for nn.scan; Swin
    alternates the window shift, so the natural repeated unit is the
    pair, not the block)."""

    dim: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32
    mlp_fuse: str = "never"

    @nn.compact
    def __call__(self, x, _=None):
        x = SwinBlockV2(self.dim, self.num_heads, self.window_size, shift=0,
                        dtype=self.dtype, mlp_fuse=self.mlp_fuse,
                        name="b0")(x)
        x = SwinBlockV2(self.dim, self.num_heads, self.window_size,
                        shift=self.window_size // 2, dtype=self.dtype,
                        mlp_fuse=self.mlp_fuse, name="b1")(x)
        return x, None


class SwinStageV2(nn.Module):
    """depth x SwinV2 blocks alternating regular/shifted windows — the
    timm SwinTransformerV2Stage analogue (same-resolution, no downsample)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    scan_blocks: bool = False
    mlp_fuse: str = "never"

    @nn.compact
    def __call__(self, x):
        if self.scan_blocks and self.depth >= 2 and self.depth % 2 == 0:
            # scan-over-layers: depth/2 identical pairs scan over stacked
            # params (one pair graph in the module instead of depth block
            # graphs; the FuXi depth-16 training-module size lever, see
            # models/layers.py Transformer)
            body = _SwinBlockPair
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth // 2,
                metadata_params={nn.meta.PARTITION_NAME: None})
            x, _ = scan(self.dim, self.num_heads, self.window_size,
                        self.dtype, self.mlp_fuse, name="blocks")(x, None)
            return x
        for i in range(self.depth):
            blk = SwinBlockV2(self.dim, self.num_heads, self.window_size,
                              shift=0 if i % 2 == 0 else self.window_size // 2,
                              dtype=self.dtype, mlp_fuse=self.mlp_fuse,
                              name=f"block{i}")
            if self.remat:
                x = nn.remat(lambda m, z: m(z))(blk, x)
            else:
                x = blk(x)
        return x


@registry.register("model", "swin")
class SwinTransformerV2(BaseModel):
    """Standalone SwinV2 forecast model (reference: credit/models/swin.py
    SwinTransformerV2Cr): patch embed -> deep same-resolution SwinV2 stack ->
    patch recovery."""

    image_height: int = 181
    image_width: int = 360
    patch_height: int = 4
    patch_width: int = 4
    frames: int = 1
    output_frames: int = 1
    channels: int = 4
    surface_channels: int = 4
    input_only_channels: int = 0
    output_only_channels: int = 0
    levels: int = 15
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 8
    window_size: int = 7
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @property
    def base_input_channels(self):
        return self.channels * self.levels + self.surface_channels + self.input_only_channels

    @property
    def base_output_channels(self):
        return self.channels * self.levels + self.surface_channels + self.output_only_channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, hh, ww, cin = x.shape
        x = frames_to_channels(x)
        ph, pw = self.patch_height, self.patch_width
        pad_h = (-hh) % ph
        pad_w = (-ww) % pw
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
        h2, w2 = x.shape[1] // ph, x.shape[2] // pw
        x = x.reshape(b, h2, ph, w2, pw, -1).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h2, w2, -1)
        x = nn.Dense(self.embed_dim, dtype=self.compute_dtype, name="embed")(x)
        # pad to window multiple
        ws = self.window_size
        eh = (-h2) % ws
        ew = (-w2) % ws
        x = jnp.pad(x, ((0, 0), (0, eh), (0, ew), (0, 0)))
        x = SwinStageV2(self.embed_dim, self.depth, self.num_heads, ws,
                        self.compute_dtype, self.remat, name="stage")(x)
        x = x[:, :h2, :w2]
        out_c = self.base_output_channels * self.output_frames
        x = nn.Dense(out_c * ph * pw, dtype=self.compute_dtype, name="head")(x)
        x = x.reshape(b, h2, w2, ph, pw, out_c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h2 * ph, w2 * pw, out_c)
        x = x[:, :hh, :ww]
        return channels_to_frames(x, self.output_frames)
