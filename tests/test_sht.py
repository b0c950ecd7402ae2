"""SHT tests: roundtrip on band-limited fields, Laplacian eigenvalues,
streamfunction winds (reference capability: torch-harmonics usage in
credit/pol_lapdiff_filt.py and credit/skebs.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from credit_tpu.ops.sht import SHT, _legendre_table


def gauss_lat(nlat):
    x, _ = np.polynomial.legendre.leggauss(nlat)
    return np.rad2deg(np.arcsin(x))


def band_limited(sht, rng, lcut):
    flm = (rng.standard_normal((sht.lmax, sht.mmax))
           + 1j * rng.standard_normal((sht.lmax, sht.mmax)))
    flm[:, 0] = rng.standard_normal(sht.lmax)  # m=0 real
    ls = np.arange(sht.lmax)[:, None]
    ms = np.arange(sht.mmax)[None, :]
    flm[(ms > ls)] = 0.0
    flm[ls.ravel() >= lcut, :] = 0.0
    return jnp.asarray(flm)


def test_legendre_orthonormal():
    nlat = 64
    x, w = np.polynomial.legendre.leggauss(nlat)
    p = _legendre_table(20, 20, x)
    # <P_l^m, P_l'^m> = delta
    for m in (0, 1, 5):
        g = np.einsum("lj,kj,j->lk", p[m], p[m], w)
        np.testing.assert_allclose(g[m:, m:], np.eye(20 - m), atol=1e-10)


@pytest.mark.parametrize("grid,nlat,tol", [("legendre-gauss", 48, 1e-5),
                                           ("equiangular", 49, 2e-2)])
def test_roundtrip_spec_grid_spec(grid, nlat, tol, rng):
    lat = gauss_lat(nlat) if grid == "legendre-gauss" else np.linspace(90, -90, nlat)
    sht = SHT(lat, nlon=2 * nlat, grid=grid)
    flm = band_limited(sht, rng, lcut=nlat // 2)
    f = sht.spec2grid(flm)
    flm2 = sht.grid2spec(f)
    mask = np.asarray(jnp.abs(flm) > 0)
    np.testing.assert_allclose(np.asarray(flm2)[mask], np.asarray(flm)[mask],
                               rtol=tol, atol=tol * float(jnp.abs(flm).max()))


def test_laplacian_eigenvalue(rng):
    nlat = 48
    sht = SHT(gauss_lat(nlat), nlon=96, grid="legendre-gauss")
    # pick single (l, m) = (6, 3)
    flm = jnp.zeros((sht.lmax, sht.mmax), jnp.complex64).at[6, 3].set(1.0 + 0.5j)
    f = sht.spec2grid(flm)
    lap = sht.laplacian_grid(f)
    eig = float(sht.laplacian[6])
    np.testing.assert_allclose(np.asarray(lap), eig * np.asarray(f),
                               rtol=1e-4, atol=1e-4 * abs(eig) * float(jnp.abs(f).max()))


def test_streamfunction_winds_match_fd(rng):
    """u = -dpsi/dy, v = +dpsi/dx for psi = smooth band-limited field."""
    nlat = 96
    lat = gauss_lat(nlat)
    sht = SHT(lat, nlon=192, grid="legendre-gauss")
    psi_lm = band_limited(sht, rng, lcut=6)
    psi = sht.spec2grid(psi_lm)
    u, v = sht.uv_from_streamfunction(psi_lm)
    # finite-difference check away from poles
    latr = np.deg2rad(lat)
    lonr = np.linspace(0, 2 * np.pi, 192, endpoint=False)
    R = sht.radius
    psi_n = np.asarray(psi)
    # numerical d/dlat (grid is descending or ascending by gauss order)
    dpsi_dlat = np.gradient(psi_n, latr, axis=0)
    dpsi_dlon = np.gradient(psi_n, lonr, axis=1)
    u_fd = -dpsi_dlat / R
    v_fd = dpsi_dlon / (R * np.cos(latr)[:, None])
    sl = slice(10, -10)
    scale = np.abs(u_fd[sl]).max()
    np.testing.assert_allclose(np.asarray(u)[sl], u_fd[sl], atol=6e-2 * scale)
    np.testing.assert_allclose(np.asarray(v)[sl], v_fd[sl],
                               atol=6e-2 * np.abs(v_fd[sl]).max())


def test_vrtdiv_of_streamfunction_is_laplacian(rng):
    nlat = 64
    sht = SHT(gauss_lat(nlat), nlon=128, grid="legendre-gauss")
    psi_lm = band_limited(sht, rng, lcut=12)
    u, v = sht.uv_from_streamfunction(psi_lm)
    vrt_lm, div_lm = sht.vrtdiv_spec(u, v)
    # vorticity of rotational wind = laplacian(psi); divergence = 0
    want = np.asarray(psi_lm * sht.laplacian[:, None])
    got = np.asarray(vrt_lm)
    mask = np.abs(want) > 1e-12
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[mask], want[mask], rtol=0.05,
                               atol=0.02 * scale)
    assert float(jnp.abs(div_lm)[2:12, :8].max()) < 0.02 * scale


def test_spectral_filter_removes_high_degrees(rng):
    nlat = 48
    sht = SHT(gauss_lat(nlat), nlon=96, grid="legendre-gauss")
    flm = band_limited(sht, rng, lcut=40)
    f = sht.spec2grid(flm)
    response = jnp.asarray((np.arange(sht.lmax) < 10).astype(np.float32))
    f_filt = sht.filter(f, response)
    flm2 = np.asarray(sht.grid2spec(f_filt))
    assert np.abs(flm2[12:, :]).max() < 1e-4 * np.abs(flm2).max()
