"""Tests: pole filter, SKEBS pattern statistics, ensemble noise, bred
vectors, metrics (reference: tests/test_physics.py, skebs smoke tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.grid import Grid


@pytest.fixture(scope="module")
def grid():
    return Grid.regular(33, 64)


def test_sigmoid_ramp():
    from credit_tpu.physics.pole_filter import sigmoid_ramp

    r = np.asarray(sigmoid_ramp(40, 8))
    assert r.shape == (40,)
    assert r[0] < 0.01 and r[-1] < 0.01
    np.testing.assert_allclose(r[10:30], 1.0)


def test_pole_lowpass_only_touches_pole_rows(grid, rng):
    from credit_tpu.physics.pole_filter import pole_lowpass_rows

    f = jnp.asarray(rng.standard_normal((33, 64)), jnp.float32)
    g = pole_lowpass_rows(f, n_rows=4)
    mid = slice(6, -6)
    np.testing.assert_array_equal(np.asarray(g)[mid], np.asarray(f)[mid])
    assert not np.allclose(np.asarray(g)[1], np.asarray(f)[1])
    # filtered rows are smoother (high-freq power reduced)
    z0 = np.abs(np.fft.rfft(np.asarray(f)[2]))[20:]
    z1 = np.abs(np.fft.rfft(np.asarray(g)[2]))[20:]
    assert z1.sum() < 0.1 * z0.sum()


def test_scalar_pole_filter_smooths(grid, rng):
    from credit_tpu.physics.pole_filter import DiffusionPoleFilter

    dpf = DiffusionPoleFilter(grid, n_pole_rows=4, ramp=6)
    f = jnp.asarray(rng.standard_normal((33, 64)), jnp.float32)
    g = dpf.filter_scalar(f, substeps=2, coef=1e8)
    assert g.shape == f.shape
    assert bool(jnp.isfinite(g).all())
    # Laplacian diffusion reduces variance of pole-adjacent rows
    assert float(jnp.var(g[:6])) < float(jnp.var(f[:6]))


def test_wind_pole_filter_runs(grid, rng):
    from credit_tpu.physics.pole_filter import DiffusionPoleFilter

    dpf = DiffusionPoleFilter(grid, n_pole_rows=4, ramp=6)
    u = jnp.asarray(rng.standard_normal((33, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((33, 64)), jnp.float32)
    u2, v2 = dpf.filter_winds(u, v, substeps=2)
    assert u2.shape == u.shape and bool(jnp.isfinite(u2).all() and jnp.isfinite(v2).all())


def test_skebs_pattern_is_ar1_and_bandlimited(grid):
    from credit_tpu.physics.skebs import SKEBS, SKEBSParams

    sk = SKEBS(grid, SKEBSParams(alpha=0.1), max_pattern_wavenum=12,
               pattern_filter_anneal_start=8)
    key = jax.random.PRNGKey(0)
    coef = sk.init_state(key, batch=2)
    assert coef.shape == (2, sk.sht.lmax, sk.sht.mmax)
    # band-limited: zero above max_pattern_wavenum
    assert float(jnp.abs(coef[:, 13:, :]).max()) == 0.0
    # AR(1): autocorrelation between successive patterns ~ (1 - alpha)
    c1 = sk.cycle(coef, jax.random.PRNGKey(1))
    num = jnp.sum(jnp.real(c1 * jnp.conj(coef))).astype(float)
    den = jnp.sum(jnp.abs(coef) ** 2).astype(float)
    rho = float(num / den)
    assert 0.7 < rho < 1.0  # (1 - 0.1) = 0.9 up to noise


def test_skebs_perturbs_winds(grid):
    from credit_tpu.physics.skebs import SKEBS, SKEBSParams

    sk = SKEBS(grid, SKEBSParams(), backscatter=1e-5)
    key = jax.random.PRNGKey(0)
    coef = sk.init_state(key, batch=1)
    u = jnp.zeros((1, 33, 64))
    v = jnp.zeros((1, 33, 64))
    u2, v2, coef2 = sk.perturb_winds(u, v, coef, jax.random.PRNGKey(3))
    assert float(jnp.abs(u2).max()) > 0
    assert bool(jnp.isfinite(u2).all() and jnp.isfinite(v2).all())
    assert not np.allclose(np.asarray(coef2), np.asarray(coef))


def test_gaussian_and_spherical_noise(grid, rng):
    from credit_tpu.ensemble.noise import GaussianNoise, SphericalNoise

    x = jnp.zeros((2, 1, 33, 64, 3))
    g = GaussianNoise(std=0.1)(jax.random.PRNGKey(0), x)
    assert abs(float(g.std()) - 0.1) < 0.02
    s = SphericalNoise(grid, std=0.1, alpha=3.0)(jax.random.PRNGKey(1), x)
    assert s.shape == x.shape
    # spatial correlation: neighboring lat rows should correlate strongly
    f = np.asarray(s[0, 0, :, :, 0])
    corr = np.corrcoef(f[10], f[11])[0, 1]
    assert corr > 0.5


def test_bred_vectors(grid):
    from credit_tpu.ensemble.bred_vector import generate_bred_vectors

    # toy linear 'model' with growing mode
    def step(x):
        return 1.5 * x - 0.5 * jnp.roll(x, 1, axis=-2)

    x0 = jnp.ones((1, 8, 8, 2))
    members = generate_bred_vectors(step, x0, jax.random.PRNGKey(0),
                                    n_members=4, amplitude=0.01, n_cycles=2)
    assert len(members) == 4
    # mirrored pairs around control
    np.testing.assert_allclose(np.asarray(members[0] + members[1]),
                               2 * np.asarray(x0), rtol=1e-5)
    for m in members:
        assert not np.allclose(np.asarray(m), np.asarray(x0))


def test_lat_weighted_metrics(grid, rng):
    from credit_tpu.metrics import LatWeightedMetrics, spread_error

    m = LatWeightedMetrics(grid, var_names=["a", "b"])
    t = jnp.asarray(rng.standard_normal((2, 1, 33, 64, 2)), jnp.float32)
    p = t + 0.1 * jnp.asarray(rng.standard_normal((2, 1, 33, 64, 2)), jnp.float32)
    out = m(t, p)
    assert 0.05 < float(out["rmse"]) < 0.2
    assert float(out["acc"]) > 0.9
    assert "rmse_a" in out and "acc_b" in out
    ens = jnp.stack([p, t, 2 * p - t], axis=1)
    eo = m.ensemble(t, ens)
    assert "spread" in eo and np.isfinite(float(eo["spread"]))
    sp, sk = spread_error(t, ens)
    assert np.isfinite(float(sp)) and np.isfinite(float(sk))


def test_binned_spread_skill(grid, rng):
    from credit_tpu.metrics import binned_spread_skill

    center = jnp.asarray(rng.standard_normal((4, 16, 16)), jnp.float32)
    # calibrated heteroscedastic ensemble: truth is exchangeable with members
    sigma = jnp.asarray(rng.uniform(0.1, 2.0, (4, 16, 16)), jnp.float32)
    t = center + sigma * jnp.asarray(rng.standard_normal((4, 16, 16)), jnp.float32)
    # large ensemble keeps the sample-spread binning selection bias small
    eps = jnp.asarray(rng.standard_normal((4, 64, 16, 16)), jnp.float32)
    ens = center[:, None] + sigma[:, None] * eps
    sp, rmse, cnt = binned_spread_skill(t, ens, n_bins=5)
    sp, rmse = np.asarray(sp), np.asarray(rmse)
    assert cnt.sum() == t.size
    # calibrated: binned rmse tracks binned spread (1:1 up to sampling noise)
    ratio = rmse[1:] / np.clip(sp[1:], 1e-6, None)
    assert (np.abs(ratio - 1) < 0.3).all(), ratio
    # and the relation is monotone: higher spread bins have higher error
    assert (np.diff(rmse) > 0).all()


def test_div_rot_spectra(grid):
    from credit_tpu.metrics import divergent_rotational_spectra
    from credit_tpu.ops.sht import SHT

    sht = SHT(np.asarray(grid.lat), grid.nlon, grid="equiangular")
    # purely rotational wind from a streamfunction
    flm = jnp.zeros((sht.lmax, sht.mmax), jnp.complex64).at[5, 2].set(1e8)
    u, v = sht.uv_from_streamfunction(flm)
    ke_rot, ke_div = divergent_rotational_spectra(u, v, grid)
    ke_rot, ke_div = np.asarray(ke_rot), np.asarray(ke_div)
    assert ke_rot[5] > 100 * max(ke_div.max(), 1e-30)
