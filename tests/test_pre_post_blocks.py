"""Preblock pipeline + wind artifact filter tests
(reference: tests/test_preblock*.py, wind_filter tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.normalize import Normalizer

CONF = {"data": {"source": {"E": {
    "levels": [0.0, 1.0],
    "variables": {
        "prognostic": {"vars_3D": ["U", "V"], "vars_2D": ["SP", "precip"]},
    },
}}}}


@pytest.fixture(scope="module")
def schema():
    return ChannelSchema.from_config(CONF)


def test_preblock_pipeline(schema, rng):
    from credit_tpu.preblock import apply_preblocks, build_preblocks

    conf = {"preblocks": [
        {"type": "fill_values", "fill_value": 0.0},
        {"type": "log_transform", "variables": ["precip"]},
        {"type": "clamp", "min": -5, "max": 5},
        {"type": "era5_normalizer", "phase": "ic_only"},
    ]}
    norm = Normalizer.identity(schema)
    per_step = build_preblocks(conf, schema, norm, phase="per_step")
    ic_only = build_preblocks(conf, schema, norm, phase="ic_only")
    assert len(per_step) == 3 and len(ic_only) == 1

    x = jnp.asarray(rng.standard_normal((1, 1, 4, 8, schema.n_input)), jnp.float32)
    x = x.at[0, 0, 0, 0, 0].set(jnp.nan)
    precip_idx = schema.input_names.index("precip")
    x = x.at[..., precip_idx].set(3.0)
    out = apply_preblocks(per_step, x)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(float(out[0, 0, 0, 0, precip_idx]),
                               np.log1p(3.0), rtol=1e-6)
    assert float(jnp.abs(out).max()) <= 5.0


def test_wind_filter_smooths_jet(schema, rng):
    from credit_tpu.postblock.wind_filter import WindArtifactFilter

    H, W = 24, 48
    y = np.zeros((1, 1, H, W, schema.n_target), np.float32)
    # a 'jet' band with a zonal stripe artifact in U at both levels
    stripe = 50.0 + 10.0 * np.cos(np.arange(W) * np.pi)  # +-10 alternating
    for lev in range(2):
        ui = schema.target_names.index(f"U_L{lev}")
        y[0, 0, 10:14, :, ui] = stripe
    x = np.zeros((1, 1, H, W, schema.n_input), np.float32)
    filt = WindArtifactFilter(schema, U_var="U", V_var="V", mask_level=-1,
                              speed_threshold=30.0)
    out = np.asarray(filt(jnp.asarray(y), jnp.asarray(x)))
    ui = schema.target_names.index("U_L1")
    before = y[0, 0, 12, :, ui]
    after = out[0, 0, 12, :, ui]
    # stripe variance strongly reduced inside the jet, mean roughly kept
    assert after.std() < 0.5 * before.std()
    assert abs(after.mean() - before.mean()) < 5.0
    # far from the jet nothing changes
    np.testing.assert_allclose(out[0, 0, :4], y[0, 0, :4], atol=1e-6)


def test_hybrid_level_interp_postblock(schema):
    from credit_tpu.postblock import HybridLevelInterp

    H, W = 6, 8
    y = np.zeros((1, 1, H, W, schema.n_target), np.float32)
    sp_i = schema.target_names.index("SP")
    y[..., sp_i] = 1.0e5
    # U linear in log-p: exact under log interp
    a_in = [5.0e4, 0.0]
    b_in = [0.0, 1.0]
    for lev, (a, b) in enumerate(zip(a_in, b_in)):
        p = a + b * 1.0e5
        ui = schema.target_names.index(f"U_L{lev}")
        y[..., ui] = 3.0 * np.log(p)
    blk = HybridLevelInterp(schema, variables=["U"], a_in=a_in, b_in=b_in,
                            a_out=[7.0e4, 1.0e4], b_out=[0.0, 0.8])
    out = np.asarray(blk(jnp.asarray(y), jnp.zeros((1, 1, H, W, schema.n_input))))
    for lev, p in enumerate([7.0e4, 1.0e4 + 0.8e5]):
        ui = schema.target_names.index(f"U_L{lev}")
        np.testing.assert_allclose(out[..., ui], 3.0 * np.log(p), rtol=1e-5)


def test_rk4_step_fixed_point():
    from credit_tpu.rollout import rk4_step

    # for the identity model, rk4 returns x exactly
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(rk4_step(lambda z: z, x)),
                               np.asarray(x), rtol=1e-6)
    # linear model y = c x: staged closed form
    c = 1.1
    out = np.asarray(rk4_step(lambda z: c * z, x))[0, 0]
    k1 = c
    k2 = c * (1 + (k1 - 1) / 2)
    k3 = c * (1 + (k2 - 1) / 2)
    k4 = c * k3
    want = float(x[0, 0]) * (k1 + 2 * k2 + 2 * k3 + k4) / 6
    np.testing.assert_allclose(out, want, rtol=1e-5)
