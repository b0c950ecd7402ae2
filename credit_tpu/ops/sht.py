"""Real spherical harmonic transforms as batched matmuls + rFFT.

TPU-native replacement for torch-harmonics (the reference's compiled SHT
dependency — reference: credit/pol_lapdiff_filt.py:151-162 grid2spec/
spec2grid, credit/skebs.py:447-458, credit/ensemble/spherical.py). The
longitude transform is an rFFT (XLA), the latitude transform contracts
against a precomputed associated-Legendre table — one big einsum that XLA
tiles onto the MXU.

Conventions (matching torch-harmonics defaults): orthonormal spherical
harmonics with Condon-Shortley phase; grids 'equiangular' (trapezoid/CC
quadrature) or 'legendre-gauss'. Tables are built host-side in float64 with
the stable standard recurrence, stored float32.

Memory: the P table is (mmax, lmax, nlat); for 1-deg (181^3) ~ 24 MB. For
0.25-deg use bf16 tables or level-blocked application.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.physics.constants import RAD_EARTH


def _legendre_table(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Normalized associated Legendre P̄_l^m(x), shape (mmax, lmax, nlat).

    P̄ normalized so that ∫_{-1}^{1} P̄_l^m P̄_l'^m dx = δ_ll' (i.e. the
    orthonormal-Y_lm latitude factor up to 1/sqrt(2π)); includes
    Condon-Shortley phase.
    """
    nlat = x.shape[0]
    out = np.zeros((mmax, lmax, nlat))
    # P̄_m^m via stable product form
    pmm = np.full(nlat, 1.0 / np.sqrt(2.0))  # P̄_0^0 = 1/sqrt(2)
    sx = np.sqrt(np.maximum(0.0, 1.0 - x * x))
    for m in range(mmax):
        if m > 0:
            pmm = -np.sqrt((2 * m + 1) / (2.0 * m)) * sx * pmm
        if m < lmax:
            out[m, m] = pmm
        # upward recurrence in l
        if m + 1 < lmax:
            out[m, m + 1] = np.sqrt(2 * m + 3.0) * x * out[m, m]
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((2.0 * l + 1.0) * ((l - 1.0) ** 2 - m * m))
                        / ((2.0 * l - 3.0) * (l * l - m * m)))
            out[m, l] = a * x * out[m, l - 1] - b * out[m, l - 2]
    return out


def _dlegendre_dtheta(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """d P̄_l^m / dθ where x = cosθ, shape (mmax, lmax, nlat).

    Uses dP/dθ = -sinθ dP/dx and the recurrence
    (1-x^2) dP̄_l^m/dx = l x P̄_l^m - sqrt((2l+1)/(2l-1)) sqrt(l^2-m^2) P̄_{l-1}^m
    => dP̄/dθ = (-l x P̄_l^m + c P̄_{l-1}^m) / sinθ, c = sqrt((l^2-m^2)(2l+1)/(2l-1)).
    """
    p = _legendre_table(lmax, mmax, x)
    sx = np.sqrt(np.maximum(1e-12, 1.0 - x * x))
    out = np.zeros_like(p)
    for m in range(mmax):
        for l in range(m, lmax):
            c = np.sqrt((l * l - m * m) * (2.0 * l + 1.0) / max(2.0 * l - 1.0, 1.0))
            pl1 = p[m, l - 1] if l - 1 >= m else 0.0
            out[m, l] = (-l * x * p[m, l] + c * pl1) / sx
    return out


def _quadrature(lat_deg: np.ndarray, grid: str) -> np.ndarray:
    """Quadrature weights over x = sin(lat) for the latitude sum."""
    nlat = lat_deg.shape[0]
    if grid == "legendre-gauss":
        xg, wg = np.polynomial.legendre.leggauss(nlat)
        return wg  # caller must use the matching gauss latitudes
    # equiangular incl. poles: Clenshaw-Curtis-style weights via exact
    # integration of the trapezoid basis over sin(lat)
    lat = np.deg2rad(lat_deg)
    order = np.argsort(lat)
    ls = lat[order]
    edges = np.empty(nlat + 1)
    edges[1:-1] = 0.5 * (ls[:-1] + ls[1:])
    edges[0] = -np.pi / 2
    edges[-1] = np.pi / 2
    w_sorted = np.sin(edges[1:]) - np.sin(edges[:-1])
    w = np.empty(nlat)
    w[order] = w_sorted
    return w


class SHT:
    """Scalar real SHT pair + spectral derivative helpers."""

    def __init__(self, lat_deg: np.ndarray, nlon: int,
                 lmax: Optional[int] = None, mmax: Optional[int] = None,
                 grid: str = "equiangular", dtype=jnp.float32,
                 radius: float = RAD_EARTH):
        self.nlat = int(lat_deg.shape[0])
        self.nlon = int(nlon)
        self.lmax = lmax or self.nlat
        self.mmax = mmax or min(self.lmax, nlon // 2 + 1)
        self.grid = grid
        self.radius = radius
        x = np.sin(np.deg2rad(np.asarray(lat_deg, np.float64)))
        w = _quadrature(np.asarray(lat_deg, np.float64), grid)
        p = _legendre_table(self.lmax, self.mmax, x)           # (M, L, nlat)
        dp = _dlegendre_dtheta(self.lmax, self.mmax, x)
        # analysis operator folds in quadrature weights; 2π from the lon
        # integral and 1/(2π) of the Y normalization cancel into 2π/nlon
        # handled by fft scaling below.
        self.pct = jnp.asarray(p, dtype)                        # synthesis
        self.pw = jnp.asarray(p * w[None, None, :], dtype)      # analysis
        self.dpct = jnp.asarray(dp, dtype)
        self._wvec_cached = jnp.asarray(w, dtype)
        self.coslat = jnp.asarray(np.cos(np.deg2rad(lat_deg)), dtype)
        ls = np.arange(self.lmax)
        self.laplacian = jnp.asarray(-ls * (ls + 1.0) / radius**2, jnp.float32)
        self.m = jnp.arange(self.mmax)

    # ------------------------------------------------------------------
    def grid2spec(self, f: jnp.ndarray) -> jnp.ndarray:
        """f: (..., nlat, nlon) real -> (..., lmax, mmax) complex."""
        fm = jnp.fft.rfft(f, axis=-1)[..., :self.mmax] * (2.0 * jnp.pi / self.nlon)
        # contract latitude: (..., nlat, M) x (M, L, nlat) -> (..., L, M)
        flm = jnp.einsum("...jm,mlj->...lm", fm, self.pw.astype(fm.real.dtype))
        return flm

    def spec2grid(self, flm: jnp.ndarray) -> jnp.ndarray:
        """(..., lmax, mmax) complex -> (..., nlat, nlon) real."""
        fm = jnp.einsum("...lm,mlj->...jm", flm, self.pct.astype(flm.real.dtype))
        return self._ifft(fm)

    def _ifft(self, fm):
        full = jnp.zeros((*fm.shape[:-1], self.nlon // 2 + 1), fm.dtype)
        full = full.at[..., :self.mmax].set(fm)
        return jnp.fft.irfft(full, n=self.nlon, axis=-1) * (self.nlon / (2.0 * jnp.pi))

    # ------------------------------------------------------------------
    def filter(self, f: jnp.ndarray, response: jnp.ndarray) -> jnp.ndarray:
        """Apply a per-degree spectral response r(l): (..., lat, lon) real."""
        flm = self.grid2spec(f)
        return self.spec2grid(flm * response[:, None])

    def laplacian_grid(self, f: jnp.ndarray) -> jnp.ndarray:
        return self.spec2grid(self.grid2spec(f) * self.laplacian[:, None])

    def inverse_laplacian(self, flm: jnp.ndarray) -> jnp.ndarray:
        inv = jnp.where(self.laplacian != 0, 1.0 / self.laplacian, 0.0)
        return flm * inv[:, None]

    # ------------------------------------------------------------------
    def grad_from_spec(self, flm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """∇f on the grid from spectral f: returns (df/dx_east, df/dy_north).

        east  = (1 / (R cosθ)) ∂f/∂λ ;  north = (1/R) ∂f/∂θ with θ latitude.
        """
        dlam = self._ifft(jnp.einsum(
            "...lm,mlj->...jm", flm * (1j * self.m)[None, :],
            self.pct.astype(flm.real.dtype)))
        east = dlam / (self.radius * jnp.clip(self.coslat, 1e-6)[..., :, None])
        north = self._ifft(jnp.einsum(
            "...lm,mlj->...jm", flm, self.dpct.astype(flm.real.dtype))) / self.radius
        return east, north

    def uv_from_streamfunction(self, psi_lm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(u, v) = k x ∇ψ: u = -(1/R) ∂ψ/∂θ, v = (1/(R cosθ)) ∂ψ/∂λ.

        This is the SKEBS perturbation path (reference: credit/skebs.py:775
        getuv applied to the rotational streamfunction forcing).
        """
        east, north = self.grad_from_spec(psi_lm)
        return -north, east

    # vorticity/divergence of a wind field (scalar-SHT route)
    def _fourier(self, f):
        return jnp.fft.rfft(f, axis=-1)[..., :self.mmax] * (2.0 * jnp.pi / self.nlon)

    def vrtdiv_spec(self, u: jnp.ndarray, v: jnp.ndarray):
        """(vrt_lm, div_lm) of a horizontal wind field.

        div = (1/(R cosθ))[∂u/∂λ + ∂(v cosθ)/∂θ]
        vrt = (1/(R cosθ))[∂v/∂λ − ∂(u cosθ)/∂θ]
        The θ terms are evaluated by integration by parts against dP̄/dθ
        (no pole boundary terms since cosθ -> 0 there):
          ∫ (1/cosθ) ∂(f cosθ)/∂θ Y* dΩ = −Σ_j (w_j/cosθ_j) dP̄/dθ(j) f_m(j).
        """
        um = self._fourier(u)
        vm = self._fourier(v)
        im = (1j * self.m)[None, :]
        cos = jnp.clip(self.coslat, 1e-6)
        a_u = jnp.einsum("...jm,mlj->...lm", um / cos[:, None],
                         self.pw.astype(um.real.dtype)) * im
        a_v = jnp.einsum("...jm,mlj->...lm", vm / cos[:, None],
                         self.pw.astype(vm.real.dtype)) * im
        # ∫ f cosφ ∂Y*/∂φ dφ dλ: the cosφ of dΩ cancels the 1/cosφ of the
        # operator, leaving plain quadrature weights against dP̄/dφ
        dp_w = self.dpct * self._wvec_cached[None, None, :]
        theta_u = jnp.einsum("...jm,mlj->...lm", um, dp_w.astype(um.real.dtype))
        theta_v = jnp.einsum("...jm,mlj->...lm", vm, dp_w.astype(vm.real.dtype))
        div = (a_u - theta_v) / self.radius
        vrt = (a_v + theta_u) / self.radius
        return vrt, div
