"""Polar filtering + Laplacian hyperdiffusion.

Re-implements the reference's Diffusion_and_Pole_Filter
(reference: credit/pol_lapdiff_filt.py:89 — polfiltT per-row lon lowpass :7,
create_sigmoid_ramp_function:47, polefilt_lap2d_V2:268 for winds,
V1:329 scalars, QV1:358 moisture, diff_lap2d_filt:388) on the JAX SHT.

Layout: fields are (..., lat, lon).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from credit_tpu.ops.sht import SHT


def sigmoid_ramp(nlat: int, ramp: int) -> jnp.ndarray:
    """Ones with sigmoid ramps at both ends (reference :47)."""
    arr = np.ones(nlat, np.float32)
    xs = np.linspace(-6, 6, ramp)
    s = 1.0 / (1.0 + np.exp(-xs))
    arr[:ramp] = s
    arr[-ramp:] = s[::-1]
    return jnp.asarray(arr)


def pole_lowpass_rows(f: jnp.ndarray, n_rows: int, keep_period: float = 100.0) -> jnp.ndarray:
    """Lowpass the n_rows nearest each pole along longitude, zeroing FFT
    coefficients with period < keep_period grid points (reference polfiltT).
    """
    nlon = f.shape[-1]
    freq = np.fft.rfftfreq(nlon)
    perd = 1.0 / freq[1:]
    ind = int(np.argmin(np.abs(perd - keep_period))) + 1
    z = jnp.fft.fft(f, axis=-1)
    mask = np.ones(nlon, np.float32)
    mask[ind:nlon - ind + 1] = 0.0 if 2 * ind <= nlon else 1.0
    z_low = z * mask
    f_low = jnp.fft.ifft(z_low, axis=-1).real.astype(f.dtype)
    nlat = f.shape[-2]
    row = np.zeros(nlat, np.float32)
    # rows 1..n_rows and -n_rows..-1 (pole rows themselves excluded, as the
    # reference iterates [-n, 0) U [1, n])
    row[1:n_rows + 1] = 1.0
    row[nlat - n_rows:] = 1.0
    sel = jnp.asarray(row)[..., :, None]
    return f * (1 - sel) + f_low * sel


class DiffusionPoleFilter:
    def __init__(self, grid, n_pole_rows: int = 10, ramp: int = 10,
                 lmax=None, mmax=None):
        self.sht = SHT(np.asarray(grid.lat), grid.nlon, lmax=lmax, mmax=mmax,
                       grid="equiangular")
        self.sigmoid = sigmoid_ramp(grid.nlat, ramp)
        self.n_pole_rows = n_pole_rows

    def _grad(self, f_spec):
        return self.sht.grad_from_spec(f_spec)

    def _laplacian_of_grid(self, f):
        dx, dy = self._grad(self.sht.grid2spec(f))
        ddx, _ = self._grad(self.sht.grid2spec(dx))
        _, ddy = self._grad(self.sht.grid2spec(dy))
        return ddx + ddy

    def filter_winds(self, u: jnp.ndarray, v: jnp.ndarray, substeps: int = 6,
                     coef: float = 2e16) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Divergence-damping wind filter (reference polefilt_lap2d_V2):
        remove the gradient of nabla^2(divergence), masked by the lat ramp."""
        u = pole_lowpass_rows(u, self.n_pole_rows)
        v = pole_lowpass_rows(v, self.n_pole_rows)
        for _ in range(substeps):
            vrt, div = self.sht.vrtdiv_spec(u, v)
            ddiv_dx, ddiv_dy = self._grad(div)
            ddx2, _ = self._grad(self.sht.grid2spec(ddiv_dx))
            _, ddy2 = self._grad(self.sht.grid2spec(ddiv_dy))
            lap = ddx2 + ddy2
            dlap_dx, dlap_dy = self._grad(self.sht.grid2spec(lap))
            u = u - dlap_dx * self.sigmoid[:, None] * coef
            v = v - dlap_dy * self.sigmoid[:, None] * coef
        return u, v

    def filter_scalar(self, t: jnp.ndarray, substeps: int = 5,
                      coef: float = 1e8) -> jnp.ndarray:
        """Scalar Laplacian diffusion near poles (reference polefilt_lap2d_V1)."""
        t = pole_lowpass_rows(t, self.n_pole_rows)
        for _ in range(substeps):
            t = t + self._laplacian_of_grid(t) * self.sigmoid[:, None] * coef
        return t

    def filter_moisture(self, q: jnp.ndarray, substeps: int = 8,
                        coef: float = 0.5e8) -> jnp.ndarray:
        """Moisture variant with gentler coefficient (reference QV1)."""
        q = pole_lowpass_rows(q, self.n_pole_rows)
        for _ in range(substeps):
            q = q + self._laplacian_of_grid(q) * self.sigmoid[:, None] * coef
        return q
