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
