"""Vertical interpolation & column diagnostics (vectorized XLA).

Replaces the reference's numba @njit column loops (reference:
credit/interp.py — fast_state_interp_loop:224, create_pressure_grid:369,
geopotential_from_model_vars:430, interp_hybrid_to_pressure_levels:482,
mean_sea_level_pressure:731; and the vectorized torch forms in
credit/postblock/geopotential.py:9-86 and credit/postblock/mslp.py) with
fully vectorized jnp ops: the per-column searchsorted/linear-interp loops
become batched gathers the TPU executes in one pass.

Layout: level is the LAST axis; fields (..., lat, lon[, lev]).
Levels are ordered top-of-atmosphere -> surface (pressure increasing).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from credit_tpu.physics.constants import GRAVITY, RDGAS, RVGAS

_GAMMA_VT = RVGAS / RDGAS - 1.0
_LAPSE_RATE = 0.0065
_ALPHA_STD = _LAPSE_RATE * RDGAS / GRAVITY
_T_WARM = 290.5
_T_COLD = 255.0


def pressure_on_interfaces(sp, a_half, b_half, model_top_pressure: float = 0.57):
    """p_half = a + b * SP on interfaces; clamped at model top
    (reference: postblock/geopotential.py:9). sp (..., H, W) ->
    (..., H, W, L+1)."""
    p = a_half + b_half * sp[..., None]
    return jnp.where(p > 0, p, model_top_pressure)


def geopotential_hybrid(surface_geopotential, sp, t, q, a_half, b_half):
    """Geopotential on model levels via hypsometric integration from the
    surface (reference: postblock/geopotential.py:37 geopotential).

    t, q: (..., H, W, L) with level 0 = model top; returns same shape.
    """
    p_half = pressure_on_interfaces(sp, a_half, b_half)  # (..., L+1)
    pi_upper = p_half[..., :-1]
    pi_lower = p_half[..., 1:]
    dlogp = jnp.log(pi_lower / pi_upper)
    alpha = 1.0 - (pi_upper / (pi_lower - pi_upper)) * dlogp
    tv = t * (1.0 + _GAMMA_VT * q)
    # integrate from surface upward: cumsum of R Tv dlogp from the bottom
    contrib = RDGAS * tv * dlogp
    below = jnp.flip(jnp.cumsum(jnp.flip(contrib, axis=-1), axis=-1), axis=-1)
    geo_lower_iface = surface_geopotential[..., None] + below - contrib
    # ECMWF convention: phi_center = phi_lower_interface + alpha R Tv.
    # (The reference uses phi_upper_interface - alpha R Tv after an admitted
    # sign flip, postblock/geopotential.py:83-85; the ECMWF form tracks the
    # analytic isothermal column to <0.5% where the reference's drifts ~2-5%.)
    return geo_lower_iface + RDGAS * tv * alpha


def mslp_trenberth(sp, t, surface_geopotential):
    """Trenberth et al. (1993) mean sea level pressure
    (reference: postblock/mslp.py mslp_from_surface_pressure — including its
    geopotential->height bugfix)."""
    sgp = surface_geopotential
    height = sgp / GRAVITY
    near_flat = jnp.abs(height) < 1e-4
    tto = t + _LAPSE_RATE * height

    mask1 = (t <= _T_WARM) & (tto > _T_WARM)
    mask2 = t > _T_WARM
    mask3 = (t < _T_COLD) & ~mask1 & ~mask2

    alpha = jnp.full_like(t, _ALPHA_STD)
    alpha = jnp.where(mask1, RDGAS * (_T_WARM - t) / jnp.clip(sgp, 1e-6), alpha)
    alpha = jnp.where(mask2, 0.0, alpha)
    t_eff = jnp.where(mask2, 0.5 * (_T_WARM + t), t)
    t_eff = jnp.where(mask3, 0.5 * (_T_COLD + t), t_eff)

    x = sgp / (RDGAS * jnp.clip(t_eff, 1.0))
    mslp = sp * jnp.exp(x * (1.0 - 0.5 * alpha * x + (alpha * x) ** 2 / 3.0))
    return jnp.where(near_flat, sp, mslp)


def _interp_monotonic(xq, x, y, use_log: bool = True):
    """Per-column linear interp of y(x) at xq over the LAST axis, x increasing.

    x: (..., L); y: (..., L); xq: (..., K) -> (..., K). Clamps outside.
    This is the vectorized replacement for the reference's @njit per-column
    loops (interp_hybrid_to_pressure_levels:482).
    """
    if use_log:
        x = jnp.log(x)
        xq = jnp.log(xq)
    idx = jnp.clip(
        jax.vmap(jnp.searchsorted, in_axes=(0, 0))(
            x.reshape(-1, x.shape[-1]), xq.reshape(-1, xq.shape[-1])
        ).reshape(*xq.shape),
        1, x.shape[-1] - 1)
    x0 = jnp.take_along_axis(x, idx - 1, axis=-1)
    x1 = jnp.take_along_axis(x, idx, axis=-1)
    y0 = jnp.take_along_axis(y, idx - 1, axis=-1)
    y1 = jnp.take_along_axis(y, idx, axis=-1)
    w = jnp.clip((xq - x0) / (x1 - x0), 0.0, 1.0)
    return y0 + w * (y1 - y0)


def interp_hybrid_to_pressure(var, model_pressure, pressure_levels,
                              use_log: bool = True):
    """Model-level -> fixed pressure levels (reference
    interp_hybrid_to_pressure_levels:482). var, model_pressure: (..., L);
    pressure_levels: (K,)."""
    pq = jnp.broadcast_to(jnp.asarray(pressure_levels),
                          (*var.shape[:-1], len(pressure_levels)))
    return _interp_monotonic(pq, model_pressure, var, use_log)


def interp_pressure_to_hybrid(var, pressure_levels, model_pressure,
                              use_log: bool = True):
    """Fixed pressure levels -> model levels (reference :517)."""
    x = jnp.broadcast_to(jnp.asarray(pressure_levels),
                         (*model_pressure.shape[:-1], len(pressure_levels)))
    return _interp_monotonic(model_pressure, x, var, use_log)


def interp_hybrid_to_hybrid(var, pressure_in, pressure_out, use_log: bool = True):
    """Arbitrary column-to-column re-leveling (reference :546)."""
    return _interp_monotonic(pressure_out, pressure_in, var, use_log)


def create_pressure_grid(sp, a_half, b_half) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(half_pressure (..., L+1), full_pressure (..., L)) — reference :369
    (full levels as interface means)."""
    half = pressure_on_interfaces(sp, a_half, b_half)
    full = 0.5 * (half[..., :-1] + half[..., 1:])
    return half, full


def interp_temperature_to_pressure(t, model_pressure, pressure_levels, sp, sgp,
                                   use_log: bool = True):
    """T to pressure levels with ECMWF below-ground lapse-rate extrapolation
    (reference interp_temperature_to_pressure_levels:638)."""
    base = interp_hybrid_to_pressure(t, model_pressure, pressure_levels, use_log)
    t_sfc = t[..., -1]
    p_sfc = model_pressure[..., -1]
    pl = jnp.asarray(pressure_levels)
    t_extrap = (t_sfc[..., None]
                * (pl / p_sfc[..., None]) ** _ALPHA_STD)
    below = pl > p_sfc[..., None]
    return jnp.where(below, t_extrap, base)


def interp_geopotential_to_pressure(z, model_pressure, pressure_levels, sp, sgp,
                                    t_sfc, use_log: bool = True):
    """Geopotential to pressure levels with hydrostatic below-ground
    extrapolation (reference interp_geopotential_to_pressure_levels:572)."""
    base = interp_hybrid_to_pressure(z, model_pressure, pressure_levels, use_log)
    pl = jnp.asarray(pressure_levels)
    p_sfc = model_pressure[..., -1]
    # hydrostatic: phi(p) = phi_sfc - R T_sfc ln(p / p_sfc)
    z_extrap = sgp[..., None] - RDGAS * t_sfc[..., None] * jnp.log(pl / p_sfc[..., None])
    below = pl > p_sfc[..., None]
    return jnp.where(below, z_extrap, base)
