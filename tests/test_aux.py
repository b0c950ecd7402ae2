"""Aux subsystem tests: forecast scheduling, seed, replay buffer, ic-opt,
preflight, config validation."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.config import convert_legacy, load_config, validate
from credit_tpu.forecast import generate_forecasts, strided_for_rank


def test_generate_forecasts_custom():
    inits = generate_forecasts({"forecasts": {
        "start_year": 2021, "start_month": 6, "start_day": 1,
        "start_hours": [0, 12], "duration": 3}})
    assert len(inits) == 6
    assert inits[0] == datetime.datetime(2021, 6, 1, 0)
    assert inits[-1] == datetime.datetime(2021, 6, 3, 12)
    assert strided_for_rank(inits, 1, 2) == inits[1::2]


def test_convert_legacy_gen1_schema():
    conf = {"data": {"variables": ["U", "V"], "surface_variables": ["SP"],
                     "static_variables": ["lsm"], "levels": [0, 1]},
            "model": {"type": "crossformer", "levels": 2}}
    out = convert_legacy(conf)
    src = out["data"]["source"]["ERA5"]
    assert src["variables"]["prognostic"]["vars_3D"] == ["U", "V"]
    assert src["variables"]["prognostic"]["vars_2D"] == ["SP"]
    assert src["variables"]["static"]["vars_2D"] == ["lsm"]


def test_validate_rejects_bad_config():
    with pytest.raises(ValueError):
        validate({"data": {"source": {"X": {}}}})
    with pytest.raises(ValueError):
        validate({"model": {"image_height": -1}})


def test_config_expands_env_vars_and_validates_sections(monkeypatch):
    """$VAR expansion in path-like keys + scalar sanity checks (reference:
    credit/parser.py credit_main_parser expandvars + section validation)."""
    from credit_tpu.config import load_config

    monkeypatch.setenv("CREDIT_TEST_ROOT", "/tmp/credit_root")
    c = load_config({"save_loc": "$CREDIT_TEST_ROOT/exp",
                     "model": {"type": "debugger"},
                     "data": {"mean_path": "${CREDIT_TEST_ROOT}/m.nc"}})
    assert c["save_loc"] == "/tmp/credit_root/exp"
    assert c["data"]["mean_path"] == "/tmp/credit_root/m.nc"
    for bad in ({"trainer": {"learning_rate": 0}},
                {"trainer": {"train_batch_size": 0}},
                {"data": {"history_len": 0}},
                {"predict": {"forecast_steps": 0}}):
        with pytest.raises(ValueError):
            load_config({"model": {"type": "debugger"}, **bad})


def test_seed_everything_deterministic():
    from credit_tpu.utils.seed import seed_everything

    k1 = seed_everything(42)
    a = np.random.rand(3)
    k2 = seed_everything(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    k3 = seed_everything(42, data_rank=1)
    assert not np.array_equal(np.asarray(k1), np.asarray(k3))


def test_replay_buffer_mixing():
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.data.replay_buffer import ReplayBuffer
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.grid import Grid

    conf = {"data": {"source": {"E": {"levels": [0.0], "variables": {
        "prognostic": {"vars_2D": ["T"]}}}}}}
    schema = ChannelSchema.from_config(conf)
    ds = SyntheticDataset(schema, Grid.regular(8, 16), n_times=20)
    buf = ReplayBuffer(capacity=4, replay_probability=1.0, seed=0)
    state = 99.0 * np.ones_like(ds.input_at(3))
    buf.add(3, state)
    batch = buf.make_batch(ds, [5, 6], 1)
    # with p=1 every sample is replaced by the stored state
    np.testing.assert_allclose(batch["x"][0], state)
    # capacity bound holds
    for i in range(10):
        buf.add(i, state)
    assert len(buf) <= 4


def test_ic_optimization_reduces_loss():
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model
    from credit_tpu.trainers.ic_optimization import optimize_initial_condition

    conf = {
        "model": {"type": "debugger", "image_height": 8, "image_width": 16,
                  "levels": 1, "channels": 2, "surface_channels": 1,
                  "input_only_channels": 0, "output_only_channels": 0},
        "data": {"source": {"E": {"levels": [0.0], "variables": {
            "prognostic": {"vars_3D": ["U", "V"], "vars_2D": ["SP"]}}}}},
    }
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 1, 8, 16, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    targets = jnp.asarray(rng.standard_normal((1, 2, 8, 16, 3)), jnp.float32)
    x_opt, losses = optimize_initial_condition(
        model, variables, schema, x0, targets, n_steps=2, iterations=60,
        learning_rate=5e-2)
    # two random targets through one linear map bound the attainable loss;
    # check a solid monotone-ish reduction rather than an absolute floor
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])
    assert not np.allclose(np.asarray(x_opt), np.asarray(x0))


def test_preflight_estimates():
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.grid import Grid
    from credit_tpu.trainers.preflight import (
        estimate_batch_ram, first_batch_watchdog)

    conf = {"data": {"source": {"E": {"levels": [0.0], "variables": {
        "prognostic": {"vars_2D": ["T"]}}}}}}
    schema = ChannelSchema.from_config(conf)
    ds = SyntheticDataset(schema, Grid.regular(8, 16), n_times=10)
    out = estimate_batch_ram(ds, batch_size=4)
    assert out["batch_gb"] > 0
    assert first_batch_watchdog(lambda: 42, timeout_s=5) == 42


def test_netcdf_variable_metadata(tmp_path):
    """CF attrs from the metadata registry land in the written files
    (reference: credit/metadata/era5.yaml applied by output.py)."""
    import numpy as np

    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.grid import Grid
    from credit_tpu.metadata import variable_attrs
    from credit_tpu.output import save_netcdf_increment
    from credit_tpu.utils.ncio import open_dataset

    assert variable_attrs("T_L3")["units"] == "K"
    assert variable_attrs("unknown_var") == {}
    assert variable_attrs("T", {"metadata": {"T": {"units": "degC"}}})[
        "units"] == "degC"

    conf = {"data": {"source": {"ERA5": {
        "levels": [0.0, 1.0],
        "variables": {"prognostic": {"vars_3D": ["T"], "vars_2D": ["SP"]}},
    }}}}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(4, 8, levels=[0.0, 1.0])
    flat = np.zeros((1, 4, 8, schema.n_target), np.float32)
    p = save_netcdf_increment(flat, schema, grid, str(tmp_path), "init", 6)
    ds = open_dataset(p)
    attrs = ds["SP"].attrs
    assert attrs.get("units") in ("Pa", b"Pa")


def test_samudra_ocean_utils():
    """Ocean (Samudra) constants + wet-mask plumbing
    (reference: credit/ocean/samudra_data.py:17,40)."""
    import numpy as np

    from credit_tpu.ocean import (DEPTH_I_LEVELS, MASK_VARS, PROG_VARS_MAP,
                                  depth_index, extract_wet_mask,
                                  get_inference_steps)

    assert len(DEPTH_I_LEVELS) == 19
    assert len(PROG_VARS_MAP["thermo"]) == 2 * 19 + 1
    assert depth_index("thetao_2_5") == 0
    assert depth_index("so_6000_0") == 18
    assert depth_index("zos") == 0

    rng = np.random.default_rng(0)
    masks = {m: (rng.uniform(0, 1, (4, 8)) > 0.3).astype(np.float32)
             for m in MASK_VARS}
    outputs = ["thetao_2_5", "thetao_6000_0", "zos"]
    wet, surf = extract_wet_mask(masks, outputs, hist=1)
    assert wet.shape == (4, 8, 6)  # 3 channels x (hist+1)
    np.testing.assert_array_equal(wet[..., 1], masks[MASK_VARS[18]])
    np.testing.assert_array_equal(surf, masks[MASK_VARS[0]])

    # noleap clock: 2000-01-01..2000-03-01 = 60 days (no Feb 29), delta 5
    # -> 13 steps, truncated to a multiple of hist+1=2 -> 12
    assert get_inference_steps("2000-01-01", "2000-03-01", 5, 1) == 12
