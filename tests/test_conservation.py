"""Conservation fixer tests (reference: tests/test_conservation_gen2.py —
apply fixer, then verify the global budget actually closes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.grid import Grid
from credit_tpu.physics.constants import GRAVITY, RHO_WATER
from credit_tpu.physics.core import HybridSigmaPhysics
from credit_tpu.postblock import (
    GlobalEnergyFixer, GlobalMassFixer, GlobalWaterFixer, TracerFixer,
    build_postblocks,
)

NLEV = 4
H, W = 10, 20

CONF = {
    "data": {
        "source": {
            "ERA5": {
                "levels": list(range(NLEV)),
                "variables": {
                    "prognostic": {
                        "vars_3D": ["U", "V", "T", "Q"],
                        "vars_2D": ["SP"],
                    },
                    "dynamic_forcing": {"vars_2D": ["tsi"]},
                    "diagnostic": {"vars_2D": [
                        "total_precipitation", "evaporation",
                        "top_net_solar_radiation", "top_net_thermal_radiation",
                        "surface_net_solar_radiation", "surface_net_thermal_radiation",
                        "surface_sensible_heat_flux", "surface_latent_heat_flux",
                    ]},
                },
            }
        }
    }
}


@pytest.fixture(scope="module")
def env():
    schema = ChannelSchema.from_config(CONF)
    grid = Grid.regular(H, W, levels=list(range(NLEV)))
    # plausible hybrid coefficients, one per model level (trapz path:
    # len == NLEV, reference conservation.py n_levels = len(coef_a))
    ak = np.array([10000.0, 5000.0, 1500.0, 0.0])
    bk = np.array([0.0, 0.3, 0.8, 1.0])
    rng = np.random.default_rng(0)

    def field3d():
        return rng.uniform(0.001, 0.01, (1, 1, H, W, NLEV)).astype(np.float32)

    x = np.zeros((1, 1, H, W, schema.n_input), np.float32)
    y = np.zeros((1, 1, H, W, schema.n_target), np.float32)
    # fill plausible values: U,V ~ 10, T ~ 280, Q ~ 0.005, SP ~ 1e5
    for arr, entries in ((x, schema.input_entries), (y, schema.target_entries)):
        for e in entries:
            base = e.name.rpartition("_L")[0] or e.name
            if base in ("U", "V"):
                arr[..., e.index] = rng.normal(5, 2)
            elif base == "T":
                arr[..., e.index] = rng.normal(270, 10)
            elif base == "Q":
                arr[..., e.index] = rng.uniform(0.001, 0.008)
            elif e.name == "SP":
                arr[..., e.index] = rng.normal(1.0e5, 100, (H, W))
            elif e.name in ("total_precipitation", "evaporation"):
                arr[..., e.index] = rng.uniform(1e-4, 1e-3, (H, W))
            elif e.name == "tsi":
                arr[..., e.index] = rng.uniform(100, 400, (H, W))
            else:
                arr[..., e.index] = rng.uniform(10, 100, (H, W))
    return schema, grid, ak, bk, jnp.asarray(x), jnp.asarray(y)


def _view(schema, y, name, target=True):
    from credit_tpu.postblock import _VarView

    return _VarView(schema, name, target).get(y)


def test_mass_fixer_conserves_dry_air(env):
    schema, grid, ak, bk, x, y = env
    fixer = GlobalMassFixer(schema, grid, q_var="Q", sp_var="SP", ak=ak, bk=bk,
                            midpoint=False)
    y_fixed = fixer(y, x)
    core = HybridSigmaPhysics(grid, ak, bk, midpoint=False)
    q_in = _view(schema, x, "Q", False)[:, -1:]
    sp_in = _view(schema, x, "SP", False)[:, -1:]
    m0 = float(core.total_dry_air_mass(q_in, sp_in)[0, 0])
    q1 = _view(schema, y_fixed, "Q")
    sp1 = _view(schema, y_fixed, "SP")
    m1 = float(core.total_dry_air_mass(q1, sp1)[0, 0])
    np.testing.assert_allclose(m1, m0, rtol=1e-5)
    # and it actually changed SP
    assert not np.allclose(np.asarray(sp1), np.asarray(_view(schema, y, "SP")))


def test_water_fixer_closes_budget(env):
    schema, grid, ak, bk, x, y = env
    fixer = GlobalWaterFixer(schema, grid, q_var="Q", sp_var="SP",
                             precip_var="total_precipitation",
                             evapor_var="evaporation", lead_time_periods=6,
                             ak=ak, bk=bk, midpoint=False)
    y_fixed = fixer(y, x)
    core = HybridSigmaPhysics(grid, ak, bk, midpoint=False)
    n_sec = 6 * 3600
    q_in = _view(schema, x, "Q", False)[:, -1:]
    sp_in = _view(schema, x, "SP", False)[:, -1:]
    q1, sp1 = _view(schema, y_fixed, "Q"), _view(schema, y_fixed, "SP")
    dtwc = (core.total_column_water(q1, sp1) - core.total_column_water(q_in, sp_in)) / n_sec
    p_flux = _view(schema, y_fixed, "total_precipitation") * RHO_WATER / n_sec
    e_flux = _view(schema, y_fixed, "evaporation") * RHO_WATER / n_sec
    residual = float(core.weighted_sum(dtwc + p_flux + e_flux)[0, 0])
    scale = float(core.weighted_sum(jnp.abs(p_flux))[0, 0])
    assert abs(residual) < 1e-5 * scale


def test_energy_fixer_closes_budget(env):
    schema, grid, ak, bk, x, y = env
    gph = np.zeros((H, W), np.float32)
    fixer = GlobalEnergyFixer(
        schema, grid, surface_geopotential=gph, ak=ak, bk=bk, midpoint=False,
        toa_down_solar_input_var="tsi",
        toa_up_solar_var="top_net_solar_radiation",
        toa_up_olr_var="top_net_thermal_radiation",
        surf_net_solar_var="surface_net_solar_radiation",
        surf_net_lw_var="surface_net_thermal_radiation",
        lead_time_periods=6)
    y_fixed = fixer(y, x)
    core = HybridSigmaPhysics(grid, ak, bk, midpoint=False)
    n_sec = 6 * 3600

    def total_e(T, q, u, v, sp):
        return core.weighted_sum(core.total_energy(T, q, u, v, sp, jnp.asarray(gph)))

    e0 = total_e(_view(schema, x, "T", False)[:, -1:], _view(schema, x, "Q", False)[:, -1:],
                 _view(schema, x, "U", False)[:, -1:], _view(schema, x, "V", False)[:, -1:],
                 _view(schema, x, "SP", False)[:, -1:])
    e1 = total_e(_view(schema, y_fixed, "T"), _view(schema, y_fixed, "Q"),
                 _view(schema, y_fixed, "U"), _view(schema, y_fixed, "V"),
                 _view(schema, y_fixed, "SP"))
    r_t = core.weighted_sum(_view(schema, x, "tsi", False)[:, -1:]
                            - _view(schema, y_fixed, "top_net_solar_radiation")
                            - _view(schema, y_fixed, "top_net_thermal_radiation"))
    f_s = core.weighted_sum(_view(schema, y_fixed, "surface_net_solar_radiation")
                            + _view(schema, y_fixed, "surface_net_thermal_radiation")
                            + _view(schema, y_fixed, "surface_sensible_heat_flux")
                            + _view(schema, y_fixed, "surface_latent_heat_flux"))
    lhs = float(e1[0, 0] - e0[0, 0])
    rhs = float(n_sec * (r_t - f_s)[0, 0])
    # fp32 roundoff at ~1e20 J global magnitudes dominates; 5e-4 rel is the
    # closure the reference's fp32 fixer achieves too
    np.testing.assert_allclose(lhs, rhs, rtol=5e-4)


def test_tracer_fixer_clamps(env):
    schema, grid, ak, bk, x, y = env
    y_neg = y.at[..., 0].set(-5.0)
    fixer = TracerFixer(schema, tracer_vars=["Q"], tracer_thres=0.0)
    y_fixed = fixer(y_neg, x)
    assert float(_view(schema, y_fixed, "Q").min()) >= 0.0


def test_build_postblocks_pipeline(env):
    schema, grid, ak, bk, x, y = env
    conf = {
        "model": {"post_conf": {
            "activate": True,
            "tracer_fixer": {"activate": True, "tracer_vars": ["Q"],
                             "tracer_thres": 0.0},
            "global_mass_fixer": {"activate": True, "q_var": "Q", "sp_var": "SP",
                                  "ak": ak, "bk": bk, "midpoint": False},
        }}
    }
    blocks = build_postblocks(conf, schema, grid)
    assert len(blocks) == 2
    from credit_tpu.postblock import apply_postblocks

    y2 = apply_postblocks(blocks, y, x)
    assert y2.shape == y.shape
