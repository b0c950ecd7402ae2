"""Vertical pressure integrals and column thermodynamics.

JAX re-implementation of the reference's physics cores
(reference: credit/physics_core.py — physics_pressure_level:75,
physics_hybrid_sigma_level:300, ModelLevelPressures:36,
total_dry_air_mass:500, total_column_water:510).

Layout: level is the LAST axis — (..., lat, lon, lev) — so vertical
reductions are lane-contiguous on the VPU and broadcasting against flat
channels-last tensors is free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from credit_tpu.physics.constants import (
    CP_DRY, CP_VAPOR, EPSGAS, GRAVITY, LH_WATER, RDGAS)


def virtual_temperature(t, q):
    """T_v from temperature and specific humidity (metpy convention,
    reference physics_core.py:29)."""
    w = q / (1.0 - q)
    return t * (w + EPSGAS) / (EPSGAS * (1.0 + w))


def density(p, t, q):
    return p / (RDGAS * virtual_temperature(t, q))


def model_level_pressures(sp, ak, bk):
    """p_lev = ak + bk * sp; sp (..., lat, lon) -> (..., lat, lon, L)."""
    return ak + bk * sp[..., None]


def half_level_pressures(plevs):
    """Geometric-mean half levels (reference ModelLevelPressures.compute_hlevs)."""
    return jnp.exp(0.5 * (jnp.log(plevs[..., :-1]) + jnp.log(plevs[..., 1:])))


def model_level_thickness(sp, ak, bk):
    """Pressure thickness per model level: diff of half levels padded with
    (0, sp) (reference compute_mlev_thickness)."""
    plevs = model_level_pressures(sp, ak, bk)
    hlevs = half_level_pressures(plevs)
    top = jnp.zeros_like(sp)[..., None]
    bot = sp[..., None]
    full = jnp.concatenate([top, hlevs, bot], axis=-1)
    return jnp.diff(full, axis=-1)


def pressure_integral_midpoint(q_mid, delta_p):
    """sum(q_mid * delta_p) over the last (level) axis."""
    return jnp.sum(q_mid * delta_p, axis=-1)


def pressure_integral_trapz(q, delta_p):
    """Trapezoidal: 0.5 * (q[k] + q[k+1]) * delta_p[k], summed."""
    return jnp.sum(0.5 * (q[..., :-1] + q[..., 1:]) * delta_p, axis=-1)


class PressureLevelPhysics:
    """Fixed pressure-level grid (reference physics_pressure_level)."""

    def __init__(self, grid, pressure_levels, midpoint: bool = False):
        self.grid = grid
        self.p = jnp.asarray(pressure_levels, jnp.float32)
        self.delta_p = jnp.diff(self.p)
        self.area = jnp.asarray(grid.cell_area(), jnp.float32)
        self.midpoint = midpoint

    def integral(self, q):
        if self.midpoint:
            return pressure_integral_midpoint(q, self.delta_p)
        return pressure_integral_trapz(q, self.delta_p)

    def weighted_sum(self, q, axis=(-2, -1), keepdims=False):
        return jnp.sum(q * self.area, axis=axis, keepdims=keepdims)

    def total_dry_air_mass(self, q):
        """Global dry-air mass [kg]; q: (..., lat, lon, lev) specific water."""
        mass_per_area = self.integral(1.0 - q) / GRAVITY
        return self.weighted_sum(mass_per_area)

    def total_column_water(self, q):
        return self.integral(q) / GRAVITY


class HybridSigmaPhysics:
    """Hybrid sigma-pressure grid (reference physics_hybrid_sigma_level)."""

    def __init__(self, grid, ak, bk, midpoint: bool = False):
        self.grid = grid
        self.ak = jnp.asarray(ak, jnp.float32)
        self.bk = jnp.asarray(bk, jnp.float32)
        self.area = jnp.asarray(grid.cell_area(), jnp.float32)
        self.midpoint = midpoint

    def pressure(self, sp):
        return model_level_pressures(sp, self.ak, self.bk)

    def integral(self, q, sp):
        p = self.pressure(sp)
        delta_p = jnp.diff(p, axis=-1)
        if self.midpoint:
            return pressure_integral_midpoint(q, delta_p)
        return pressure_integral_trapz(q, delta_p)

    def weighted_sum(self, q, axis=(-2, -1), keepdims=False):
        return jnp.sum(q * self.area, axis=axis, keepdims=keepdims)

    def total_dry_air_mass(self, q, sp):
        mass_per_area = self.integral(1.0 - q, sp) / GRAVITY
        return self.weighted_sum(mass_per_area)

    def total_column_water(self, q, sp):
        return self.integral(q, sp) / GRAVITY

    def total_energy(self, t, q, u, v, sp, surface_geopotential):
        """Column-integrated moist static + kinetic energy [J/m^2]
        (reference: conservation.py GlobalEnergyFixerUpDown.forward)."""
        cp = (1.0 - q) * CP_DRY + q * CP_VAPOR
        e = cp * t + LH_WATER * q + surface_geopotential[..., None] + 0.5 * (u**2 + v**2)
        return self.integral(e, sp) / GRAVITY
