"""Multi-source dataset + multi-source update_x segment tests
(reference: tests/multi_source_dataset_test.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.multi_source import build_multi_source
from credit_tpu.grid import Grid

CONF = {
    "seed": 3,
    "data": {
        "n_times": 16,
        "history_len": 1,
        "source": {
            "ATMOS": {"levels": [0.0, 1.0], "variables": {
                "prognostic": {"vars_3D": ["U"], "vars_2D": ["SP"]},
                "dynamic_forcing": {"vars_2D": ["tsi"]},
            }},
            "OCEAN": {"variables": {
                "prognostic": {"vars_2D": ["SST"]},
                "static": {"vars_2D": ["mask"]},
                "diagnostic": {"vars_2D": ["flux"]},
            }},
        },
    },
}


@pytest.fixture(scope="module")
def env():
    schema = ChannelSchema.from_config(CONF)
    grid = Grid.regular(8, 16)
    ds = build_multi_source(CONF, schema, grid)
    return schema, ds


def test_layout_and_segments(env):
    schema, ds = env
    # input: ATMOS prognostic U_L0,U_L1,SP; dyn tsi; OCEAN prognostic SST; static mask
    assert schema.input_names == ["U_L0", "U_L1", "SP", "tsi", "SST", "mask"]
    assert schema.target_names == ["U_L0", "U_L1", "SP", "SST", "flux"]
    segs = schema.input_segments()
    assert segs == [("ATMOS", "prognostic", 0, 3),
                    ("ATMOS", "dynamic_forcing", 3, 4),
                    ("OCEAN", "prognostic", 4, 5),
                    ("OCEAN", "static", 5, 6)]
    assert schema.dynamic_forcing_indices() == [3]


def test_multi_source_samples_and_batch(env):
    schema, ds = env
    s = ds.sample(2, 2)
    assert s["x"].shape == (1, 8, 16, 6)
    assert s["y"].shape == (2, 8, 16, 5)
    assert s["forcing"].shape == (2, 8, 16, 1)
    b = ds.batch([2, 3], 1)
    assert b["x"].shape == (2, 1, 8, 16, 6)


def test_multi_source_update_x(env):
    schema, ds = env
    x = jnp.arange(6, dtype=jnp.float32)[None, :]
    y = 100 + jnp.arange(5, dtype=jnp.float32)[None, :]
    f = jnp.asarray([[555.0]])
    out = np.asarray(schema.update_x(x, y, f))[0]
    # prognostic A from y[0:3], forcing replaced, OCEAN prognostic from y[3:4],
    # static carried from x
    np.testing.assert_allclose(out, [100, 101, 102, 555, 103, 5])
    out2 = np.asarray(schema.update_x(x, y, None))[0]
    np.testing.assert_allclose(out2, [100, 101, 102, 3, 103, 5])
