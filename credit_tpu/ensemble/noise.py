"""IC / model-noise generators for ensembles.

Re-implementations of the reference's noise family (reference:
credit/ensemble/gaussian.py:4 GaussianNoise, spherical.py:9,146
SphericalNoise/SphericalRandomField via SHT power-law covariance,
color.py:5 ColorNoise, temporal.py:8 TemporalNoise) as pure functions of a
PRNG key — no hidden torch RNG state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class GaussianNoise:
    """White Gaussian IC noise, std per channel or scalar."""

    def __init__(self, std: float = 0.01):
        self.std = std

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        return x + self.std * jax.random.normal(key, x.shape, x.dtype)


class SphericalNoise:
    """Spatially correlated noise: random spherical field with power-law
    spectrum C_l ~ (l (l+1))^{-alpha/2}, synthesized by inverse SHT
    (reference: ensemble/spherical.py SphericalRandomField)."""

    def __init__(self, grid, std: float = 0.01, alpha: float = 2.0,
                 lmax: Optional[int] = None):
        from credit_tpu.ops.sht import SHT

        self.sht = SHT(np.asarray(grid.lat), grid.nlon, lmax=lmax,
                       grid="equiangular")
        self.std = std
        ls = np.arange(1, self.sht.lmax + 1, dtype=np.float64)
        power = (ls * (ls + 1.0)) ** (-alpha / 2.0)
        self.amp = jnp.asarray(np.sqrt(power), jnp.float32)[:, None]

    def field(self, key: jax.Array, shape_prefix=()) -> jnp.ndarray:
        kr, ki = jax.random.split(key)
        shape = (*shape_prefix, self.sht.lmax, self.sht.mmax)
        coef = (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape))
        f = self.sht.spec2grid(coef * self.amp)
        # normalize to unit std then scale
        f = f / (jnp.std(f) + 1e-12)
        return self.std * f

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., lat, lon, C): one correlated field per channel."""
        c = x.shape[-1]
        f = self.field(key, shape_prefix=(*x.shape[:-3], c))  # (..., C, lat, lon)
        f = jnp.moveaxis(f, -3, -1)
        return x + f.astype(x.dtype)


class ColorNoise:
    """Channel-correlated (colored) noise: correlation across channels from a
    covariance factor, white in space (reference: ensemble/color.py)."""

    def __init__(self, std: float = 0.01, n_channels: Optional[int] = None,
                 chol: Optional[np.ndarray] = None):
        self.std = std
        self.chol = None if chol is None else jnp.asarray(chol, jnp.float32)

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        eps = jax.random.normal(key, x.shape, x.dtype)
        if self.chol is not None:
            eps = jnp.einsum("...i,ij->...j", eps, self.chol)
        return x + self.std * eps


class TemporalNoise:
    """AR(1)-correlated noise across the time/frame axis
    (reference: ensemble/temporal.py)."""

    def __init__(self, std: float = 0.01, rho: float = 0.8, time_axis: int = 1):
        self.std = std
        self.rho = rho
        self.time_axis = time_axis

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        t = x.shape[self.time_axis]
        xs = jnp.moveaxis(x, self.time_axis, 0)
        keys = jax.random.split(key, t)
        innov = jnp.stack([jax.random.normal(k, xs.shape[1:], x.dtype) for k in keys])

        def body(carry, eps):
            z = self.rho * carry + jnp.sqrt(1 - self.rho**2) * eps
            return z, z

        _, zs = jax.lax.scan(body, jnp.zeros_like(innov[0]), innov)
        return x + self.std * jnp.moveaxis(zs, 0, self.time_axis)


def hemispheric_rescale(noise: jnp.ndarray, lat: np.ndarray,
                        nh_scale: float = 1.0, sh_scale: float = 1.0,
                        tropics_scale: float = 1.0, lat_axis: int = -3) -> jnp.ndarray:
    """Scale noise differently by hemisphere/tropics
    (reference: ensemble/utils.py:45)."""
    w = np.full(lat.shape[0], tropics_scale, np.float32)
    w[lat > 20] = nh_scale
    w[lat < -20] = sh_scale
    shape = [1] * noise.ndim
    shape[lat_axis] = lat.shape[0]
    return noise * jnp.asarray(w).reshape(shape)
