"""Jet-stream stripe-artifact wind filter.

Re-implements the reference's wind_artifact_filter (reference:
credit/postblock/wind_filter.py:10 _compute_blend_mask / :126 — wind-speed
threshold mask, anisotropic dilation (wider zonally), anisotropic Gaussian
falloff into a 0-1 blend weight, then blending the winds toward an
anisotropically-smoothed field). All convs are depthwise lax convs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from credit_tpu import registry
from credit_tpu.data.channels import ChannelSchema
from credit_tpu.postblock import BasePostblock, _VarView


def _gauss1d(sigma: float, half_mult: float = 2.0) -> np.ndarray:
    size = (int(2 * sigma * half_mult + 1)) | 1
    x = np.arange(size) - size // 2
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _sep_conv2d(f: jnp.ndarray, k_lat: np.ndarray, k_lon: np.ndarray) -> jnp.ndarray:
    """Separable 2-D smoothing of (..., H, W): circular in lon, edge in lat."""
    shape = f.shape
    x = f.reshape(-1, shape[-2], shape[-1])[..., None]  # (N, H, W, 1)
    kl = jnp.asarray(k_lat).reshape(-1, 1, 1, 1)
    ko = jnp.asarray(k_lon).reshape(1, -1, 1, 1)
    ph = len(k_lat) // 2
    pw = len(k_lon) // 2
    if ph:
        x = jnp.concatenate(
            [jnp.repeat(x[:, :1], ph, 1), x, jnp.repeat(x[:, -1:], ph, 1)], axis=1)
    if pw:
        x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
    x = lax.conv_general_dilated(x, kl, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, ko, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x[..., 0].reshape(shape)


def compute_blend_mask(u: jnp.ndarray, v: jnp.ndarray, speed_threshold: float,
                       dilation_zonal: int, dilation_meridional: int,
                       falloff_sigma: float) -> jnp.ndarray:
    """(..., H, W) winds at the mask level -> blend weight in [0, 1]."""
    speed = jnp.sqrt(u**2 + v**2)
    mask = (speed > speed_threshold).astype(u.dtype)
    # anisotropic dilation via box convolution + clamp
    box_lat = np.ones(dilation_meridional, np.float32)
    box_lon = np.ones(dilation_zonal, np.float32)
    dil = _sep_conv2d(mask, box_lat, box_lon)
    dil = jnp.clip(dil, 0.0, 1.0)
    # anisotropic Gaussian falloff (2x wider zonally, reference :52-60)
    blend = _sep_conv2d(dil, _gauss1d(falloff_sigma),
                        _gauss1d(falloff_sigma * 2.0))
    return jnp.clip(blend, 0.0, 1.0)


@registry.register("postblock", "wind_artifact_filter")
class WindArtifactFilter(BasePostblock):
    def __init__(self, schema: ChannelSchema, U_var="U", V_var="V",
                 mask_level: int = -1, speed_threshold: float = 40.0,
                 dilation_zonal: int = 9, dilation_meridional: int = 3,
                 falloff_sigma: float = 2.0,
                 smooth_sigma_zonal: float = 4.0,
                 smooth_sigma_meridional: float = 0.75, **_):
        self.U = _VarView(schema, U_var)
        self.V = _VarView(schema, V_var)
        self.mask_level = mask_level
        self.speed_threshold = speed_threshold
        self.dz, self.dm = dilation_zonal, dilation_meridional
        self.falloff_sigma = falloff_sigma
        self.k_lat = _gauss1d(smooth_sigma_meridional)
        self.k_lon = _gauss1d(smooth_sigma_zonal)

    def __call__(self, y_pred, x):
        u = self.U.get(y_pred)  # (B, T, H, W, L) or (B, T, H, W)
        v = self.V.get(y_pred)
        has_lev = u.ndim == 5
        u_m = u[..., self.mask_level] if has_lev else u
        v_m = v[..., self.mask_level] if has_lev else v
        blend = compute_blend_mask(u_m, v_m, self.speed_threshold,
                                   self.dz, self.dm, self.falloff_sigma)
        if has_lev:
            blend = blend[..., None]
            u_s = jnp.stack([_sep_conv2d(u[..., k], self.k_lat, self.k_lon)
                             for k in range(u.shape[-1])], axis=-1)
            v_s = jnp.stack([_sep_conv2d(v[..., k], self.k_lat, self.k_lon)
                             for k in range(v.shape[-1])], axis=-1)
        else:
            u_s = _sep_conv2d(u, self.k_lat, self.k_lon)
            v_s = _sep_conv2d(v, self.k_lat, self.k_lon)
        y_pred = self.U.set(y_pred, u * (1 - blend) + u_s * blend)
        y_pred = self.V.set(y_pred, v * (1 - blend) + v_s * blend)
        return y_pred
