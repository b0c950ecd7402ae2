"""Spherical boundary padding for global lat-lon grids.

Behavioral parity with the reference's TensorPadding
(reference: credit/boundary_padding.py:5 — 'earth' mode: 180-degree roll +
pole flip in latitude then circular longitude pad; 'mirror' mode: circular
longitude then reflect latitude), re-expressed channels-last and purely
functional so XLA fuses the rolls/flips/concats into the consuming conv.

Layout: x is (..., lat, lon, channel) — lat axis -3, lon axis -2.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

LAT_AXIS = -3
LON_AXIS = -2


def _norm_pads(p) -> Tuple[int, int]:
    if isinstance(p, int):
        return (p, p)
    a, b = p
    return int(a), int(b)


def earth_pad(x: jnp.ndarray, pad_lat=(0, 0), pad_lon=(0, 0)) -> jnp.ndarray:
    """Earth (spherical) padding.

    Latitude: pad across the poles with the 180-degree-rolled, lat-flipped
    field (the antipodal column continues smoothly over the pole).
    Longitude: circular (periodic) pad.
    """
    pn, ps = _norm_pads(pad_lat)
    pw, pe = _norm_pads(pad_lon)

    if pn > 0 or ps > 0:
        # Slice the pole rows FIRST, then 180-degree-roll only those rows.
        # Rolling the whole field (jnp.roll on the full array) materialized
        # a transposed-layout copy of the entire grid on TPU — profiled at
        # 25 ms/step on the 0.25-deg flagship vs <1 ms for this form.
        nlon = x.shape[LON_AXIS]
        keep = nlon - nlon // 2

        def roll180(rows):
            return jnp.concatenate(
                [rows[..., :, keep:, :], rows[..., :, :keep, :]],
                axis=LON_AXIS)

        parts = []
        if pn > 0:
            parts.append(jnp.flip(roll180(x[..., :pn, :, :]), axis=LAT_AXIS))
        parts.append(x)
        if ps > 0:
            parts.append(jnp.flip(roll180(x[..., -ps:, :, :]), axis=LAT_AXIS))
        x = jnp.concatenate(parts, axis=LAT_AXIS)

    if pw > 0 or pe > 0:
        x = circular_pad_lon(x, (pw, pe))
    return x


def circular_pad_lon(x: jnp.ndarray, pad_lon=(0, 0)) -> jnp.ndarray:
    pw, pe = _norm_pads(pad_lon)
    parts = []
    if pw > 0:
        parts.append(x[..., :, -pw:, :])
    parts.append(x)
    if pe > 0:
        parts.append(x[..., :, :pe, :])
    return jnp.concatenate(parts, axis=LON_AXIS) if len(parts) > 1 else x


def mirror_pad(x: jnp.ndarray, pad_lat=(0, 0), pad_lon=(0, 0)) -> jnp.ndarray:
    """Mirror padding: circular in longitude first, then reflect in latitude
    (same op order as the reference's mirror mode)."""
    pw, pe = _norm_pads(pad_lon)
    pn, ps = _norm_pads(pad_lat)
    if pw > 0 or pe > 0:
        x = circular_pad_lon(x, (pw, pe))
    if pn > 0 or ps > 0:
        nlat = x.shape[LAT_AXIS]
        parts = []
        if pn > 0:
            # reflect excludes the edge row (torch 'reflect')
            parts.append(jnp.flip(x[..., 1:pn + 1, :, :], axis=LAT_AXIS))
        parts.append(x)
        if ps > 0:
            parts.append(jnp.flip(x[..., nlat - ps - 1:nlat - 1, :, :],
                                  axis=LAT_AXIS))
        x = jnp.concatenate(parts, axis=LAT_AXIS)
    return x


def unpad(x: jnp.ndarray, pad_lat=(0, 0), pad_lon=(0, 0)) -> jnp.ndarray:
    """Crop padding added by earth_pad / mirror_pad."""
    pn, ps = _norm_pads(pad_lat)
    pw, pe = _norm_pads(pad_lon)
    nlat = x.shape[LAT_AXIS]
    nlon = x.shape[LON_AXIS]
    if pn > 0 or ps > 0:
        x = x[..., pn:nlat - ps, :, :]
    if pw > 0 or pe > 0:
        x = x[..., :, pw:nlon - pe, :]
    return x


class TensorPadding:
    """Config-driven pad/unpad pair (API parity with the reference class)."""

    def __init__(self, mode: str = "earth", pad_lat: Sequence[int] = (40, 40),
                 pad_lon: Sequence[int] = (40, 40), activate: bool = True, **kw):
        if mode not in ("earth", "mirror"):
            raise ValueError(f"padding mode must be earth|mirror, got {mode}")
        self.mode = mode
        self.pad_lat = _norm_pads(pad_lat)
        self.pad_lon = _norm_pads(pad_lon)

    def pad(self, x):
        fn = earth_pad if self.mode == "earth" else mirror_pad
        return fn(x, self.pad_lat, self.pad_lon)

    def unpad(self, x):
        return unpad(x, self.pad_lat, self.pad_lon)
