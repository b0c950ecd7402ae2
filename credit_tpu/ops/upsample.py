"""Upsampling ops: pixel shuffle (sub-pixel conv), ICNR init, bilinear resize.

Parity targets: torch nn.PixelShuffle channel ordering and
F.interpolate(mode='bilinear', align_corners=False)
(reference: credit/models/wxformer/crossformer.py:136 UpBlockPS, :69
icnr_init_, :723 interpolate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch's NCHW channel ordering.

    torch: out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w].
    Channels-last input (N, H, W, C*r*r) with channel index c*r*r + i*r + j.
    """
    n, h, w, crr = x.shape
    r = scale
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)            # (..., c, i, j)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # (n, h, i, w, j, c)
    return x.reshape(n, h * r, w * r, c)


def icnr_kernel_init(scale: int, sub_init=None):
    """ICNR initializer for a sub-pixel conv feeding pixel_shuffle (Aitken et
    al. 2017): all r^2 sub-pixel channels start identical, removing the
    checkerboard at init. Kernel shape (kh, kw, cin, cout*r*r) with torch's
    contiguous-(r^2)-block channel convention.
    """
    if sub_init is None:
        sub_init = jax.nn.initializers.he_normal(in_axis=-2, out_axis=-1)

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout_rr = shape
        cout = cout_rr // (scale * scale)
        sub = sub_init(key, (kh, kw, cin, cout), dtype)
        # repeat each output channel r^2 times contiguously: channel index
        # layout (c, i, j) with j fastest — matches pixel_shuffle above.
        k = jnp.repeat(sub, scale * scale, axis=-1)
        return k

    return init


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize on the two spatial axes of NHWC input, half-pixel
    centers (== torch align_corners=False)."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return jax.image.resize(x, (n, out_h, out_w, c), method="bilinear").astype(x.dtype)


def bilinear_resize_nd(x: jnp.ndarray, out_h: int, out_w: int,
                       lat_axis: int = -3, lon_axis: int = -2) -> jnp.ndarray:
    """Resize arbitrary-rank channels-last tensors on (lat, lon) axes."""
    shape = list(x.shape)
    lat_axis %= x.ndim
    lon_axis %= x.ndim
    shape[lat_axis] = out_h
    shape[lon_axis] = out_w
    return jax.image.resize(x, tuple(shape), method="bilinear").astype(x.dtype)
