"""Vertical interpolation + semi-Lagrangian advection tests
(reference: tests/test_interp.py, tests/test_advect_blocks.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.grid import Grid
from credit_tpu.physics.constants import GRAVITY, RDGAS
from credit_tpu.physics import interp as itp
from credit_tpu.physics.advection import (
    SemiLagrangianAdvection, horizontal_divergence, trilinear_sample)


def test_interp_hybrid_to_pressure_linear_exact(rng):
    # var linear in log(p) -> log interp is exact
    p_model = jnp.asarray(np.tile(np.array([1e4, 3e4, 6e4, 9e4]), (2, 5, 5, 1)))
    var = 7.0 + 3.0 * jnp.log(p_model)
    plevs = [2e4, 5e4, 8e4]
    out = itp.interp_hybrid_to_pressure(var, p_model, plevs, use_log=True)
    want = 7.0 + 3.0 * np.log(np.asarray(plevs))
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), want, rtol=1e-5)


def test_interp_clamps_outside():
    p_model = jnp.asarray(np.tile(np.array([1e4, 5e4, 9e4]), (1, 1, 1, 1)))
    var = jnp.asarray(np.tile(np.array([1.0, 2.0, 3.0]), (1, 1, 1, 1)))
    out = itp.interp_hybrid_to_pressure(var, p_model, [1e3, 1e5], use_log=True)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [1.0, 3.0])


def test_mslp_at_sea_level_is_sp():
    sp = jnp.full((1, 4, 4), 101325.0)
    t = jnp.full((1, 4, 4), 288.0)
    sgp = jnp.zeros((1, 4, 4))
    mslp = itp.mslp_trenberth(sp, t, sgp)
    np.testing.assert_allclose(np.asarray(mslp), 101325.0)


def test_mslp_above_sea_level_increases():
    sp = jnp.full((1, 4, 4), 85000.0)
    t = jnp.full((1, 4, 4), 280.0)
    sgp = jnp.full((1, 4, 4), 1500.0 * GRAVITY)  # 1500 m elevation
    mslp = np.asarray(itp.mslp_trenberth(sp, t, sgp))
    assert (mslp > 85000.0).all()
    # roughly consistent with barometric formula (~101 kPa within 3 kPa)
    assert abs(mslp.mean() - 101000) < 4000


def test_geopotential_isothermal_column():
    """For isothermal dry column, phi(p) = phi_s + R T ln(p_s/p)."""
    L = 8
    a_half = jnp.asarray(np.linspace(10.0, 0.0, L + 1) ** 2 * 10)  # small at bottom
    b_half = jnp.asarray(np.linspace(0.0, 1.0, L + 1) ** 1.5)
    sp = jnp.full((1, 3, 3), 1.0e5)
    T0 = 250.0
    t = jnp.full((1, 3, 3, L), T0)
    q = jnp.zeros((1, 3, 3, L))
    sgp = jnp.full((1, 3, 3), 5000.0)
    z = itp.geopotential_hybrid(sgp, sp, t, q, a_half, b_half)
    p_half = np.asarray(itp.pressure_on_interfaces(sp, a_half, b_half))
    pu, pl = p_half[..., :-1], p_half[..., 1:]
    dlogp = np.log(pl / pu)
    alpha = 1.0 - (pu / (pl - pu)) * dlogp
    # the ECMWF center is exact (isothermal) at p_eff = p_lower * exp(-alpha)
    p_eff = pl * np.exp(-alpha)
    want = 5000.0 + 287.05 * T0 * np.log(1.0e5 / p_eff)
    got = np.asarray(z)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # and close to the analytic log-mean center for thin layers (skip the
    # thick top layer where center definitions genuinely diverge)
    p_log = np.exp(0.5 * (np.log(pu) + np.log(pl)))
    want_log = 5000.0 + 287.05 * T0 * np.log(1.0e5 / p_log)
    np.testing.assert_allclose(got[..., 1:], want_log[..., 1:], rtol=3e-2)
    # monotonically decreasing toward surface
    assert (np.diff(got[0, 0, 0]) < 0).all()


def test_trilinear_sample_identity_and_shift(rng):
    vol = jnp.asarray(rng.standard_normal((1, 6, 8, 3)), jnp.float32)
    r = jnp.broadcast_to(jnp.arange(6.0)[None, :, None, None], vol.shape)
    c = jnp.broadcast_to(jnp.arange(8.0)[None, None, :, None], vol.shape)
    l = jnp.broadcast_to(jnp.arange(3.0)[None, None, None, :], vol.shape)
    out = trilinear_sample(vol, r, c, l)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-6)
    # shift one column with wraparound
    out2 = trilinear_sample(vol, r, c + 1, l)
    np.testing.assert_allclose(np.asarray(out2), np.roll(np.asarray(vol), -1, axis=2),
                               rtol=1e-6)


def test_divergence_of_solid_rotation_is_small():
    grid = Grid.regular(31, 60)
    lat_rad = jnp.asarray(np.deg2rad(grid.lat))
    # solid-body rotation u = U0 cos(lat), v = 0 -> divergence = 0
    u = jnp.broadcast_to(jnp.cos(lat_rad)[None, :, None, None] * 10.0, (1, 31, 60, 2))
    v = jnp.zeros_like(u)
    div = horizontal_divergence(u, v, lat_rad, float(np.deg2rad(6.0)))
    assert float(jnp.abs(div[:, 2:-2]).max()) < 1e-9


def test_advection_moves_tracer_westward():
    """Uniform eastward wind advects the tracer east; departure points lie
    west, so the peak moves east by ~ u dt / (R cos) columns."""
    grid = Grid.regular(31, 64)
    L = 1
    a_half = jnp.asarray([0.0, 0.0])
    b_half = jnp.asarray([0.9, 1.0])
    adv = SemiLagrangianAdvection(grid, a_half, b_half, timestep_seconds=21600.0,
                                  n_iterations=2)
    u = jnp.full((1, 31, 64, L), 20.0)
    v = jnp.zeros_like(u)
    sp = jnp.full((1, 31, 64), 1e5)
    tracer = jnp.zeros((1, 31, 64, L)).at[:, 15, 10, :].set(1.0)
    (out,) = adv.advect([tracer], u, v, sp)
    out_n = np.asarray(out)[0, 15, :, 0]
    # expected displacement in columns at the equator row (lat index 15 = 0 deg)
    import credit_tpu.physics.constants as C

    dcol = 20.0 * 21600.0 / (C.RAD_EARTH * 1.0) / np.deg2rad(360 / 64)
    peak = np.argmax(out_n)
    assert abs(peak - (10 + dcol)) < 1.5, (peak, 10 + dcol)
    assert np.isfinite(out_n).all()
    # mass approximately conserved along the row
    np.testing.assert_allclose(out_n.sum(), 1.0, rtol=1e-3)
