"""CF-calendar clock + vendored zarr reader + cloud dataset classes.

VERDICT round-1 item 3 'done' criteria: a `dataset_type: wb2_era5` config
constructs, lists init times by datetime, and a mocked-store unit test reads
a sample end-to-end. Reference contracts:
credit/datasets/gen_2/era5.py:56, base_dataset.py:311,374,697."""

import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.timeclock import (CFDatetime, TimeClock, build_time_index,
                                       parse_datetime, parse_timestep)
from credit_tpu.data.zarrlite import open_group, write_array


# ---------------------------------------------------------------------------
# timeclock
def test_parse_timestep():
    assert parse_timestep("6h") == np.timedelta64(21600, "s")
    assert parse_timestep("1D") == np.timedelta64(86400, "s")
    assert parse_timestep(6) == np.timedelta64(21600, "s")


def test_standard_index():
    idx = build_time_index("2020-02-28", "2020-03-01", "6h")
    assert len(idx) == 9  # leap year: Feb 29 exists
    assert str(idx[4]) == "2020-02-29T00:00:00"


def test_noleap_skips_feb29():
    idx = build_time_index("2020-02-28", "2020-03-01", "6h", calendar="noleap")
    assert len(idx) == 5  # no Feb 29
    assert str(idx[4]) == "2020-03-01T00:00:00"
    assert [t.day for t in idx[:4]] == [28, 28, 28, 28]


def test_360day_months():
    t = parse_datetime("2001-02-28", "360_day")
    t2 = t + parse_timestep("2D")
    assert (t2.month, t2.day) == (2, 30)  # Feb has 30 days on 360_day
    t3 = t2 + parse_timestep("1D")
    assert (t3.month, t3.day) == (3, 1)


def test_cfdatetime_roundtrip_and_diff():
    t = CFDatetime(1999, 12, 31, 3600 * 18, "noleap")
    t2 = t + parse_timestep("12h")
    assert (t2.year, t2.month, t2.day, t2.second) == (2000, 1, 1, 3600 * 6)
    assert (t2 - t) == np.timedelta64(12 * 3600, "s")


def test_clock_margins():
    clk = TimeClock("2018-01-01", "2018-01-03", "6h", history_len=2,
                    num_forecast_steps=2)
    # init times: start+1*dt .. end-2*dt
    assert str(clk.init_times[0]) == "2018-01-01T06:00:00"
    assert str(clk.init_times[-1]) == "2018-01-02T12:00:00"
    i = clk.index_of("2018-01-01T06:00:00")
    win = clk.window("2018-01-01T06:00:00", 2)
    assert len(win) == 4  # 2 history + 2 targets
    assert clk.time_at(i) == win[1]


# ---------------------------------------------------------------------------
# zarrlite
def test_zarr_roundtrip_chunked(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 4, 6, 8)).astype(np.float32)
    write_array(str(tmp_path), "temp", a, chunks=(2, 3, 4, 5),
                attrs={"units": "K"})
    g = open_group(str(tmp_path))
    z = g["temp"]
    assert z.shape == (5, 4, 6, 8) and z.attrs["units"] == "K"
    np.testing.assert_array_equal(z.read(), a)
    np.testing.assert_array_equal(z.read((3,)), a[3])
    np.testing.assert_array_equal(z.read((slice(1, 4), [0, 2])),
                                  a[1:4][:, [0, 2]])
    np.testing.assert_array_equal(z[2, 1], a[2, 1])


def test_zarr_uncompressed_and_missing_chunk(tmp_path):
    a = np.arange(12, dtype=np.int64).reshape(3, 4)
    write_array(str(tmp_path), "x", a, chunks=(2, 2), compressor=None)
    z = open_group(str(tmp_path))["x"]
    np.testing.assert_array_equal(z.read(), a)


# ---------------------------------------------------------------------------
# mocked WB2-style store end-to-end
LAT, LON, NLEV, NT = 8, 16, 3, 20

CONF = {
    "data": {
        "source": {
            "WB2": {
                "dataset_type": "wb2_era5",
                "store_path": None,  # filled per test
                "level_coord": "level",
                "levels": [500.0, 850.0, 1000.0],
                "variables": {
                    "prognostic": {"vars_3D": ["temperature"],
                                   "vars_2D": ["surface_pressure"]},
                    "dynamic_forcing": {
                        "vars_2D": ["toa_incident_solar_radiation"]},
                    "static": {"vars_2D": ["land_sea_mask"]},
                    "diagnostic": {"vars_2D": ["total_precipitation"]},
                },
            }
        },
        "start_datetime": "2018-01-02T00:00:00",
        "end_datetime": "2018-01-04T00:00:00",
        "timestep": "6h",
        "history_len": 1,
        "forecast_len": 1,
    }
}


@pytest.fixture
def wb2_store(tmp_path):
    """A tiny consolidated-layout-free zarr store shaped like WB2 ERA5:
    hourly=no — 6h steps starting 2018-01-01, 5 levels of which the config
    selects 3."""
    rng = np.random.default_rng(7)
    root = str(tmp_path / "store")
    levels = np.array([300.0, 500.0, 700.0, 850.0, 1000.0])
    # time: hours since 2018-01-01, every 6h, NT steps
    tvals = np.arange(NT, dtype=np.int64) * 6
    write_array(root, "time", tvals,
                attrs={"units": "hours since 2018-01-01",
                       "calendar": "proleptic_gregorian"})
    write_array(root, "level", levels)
    fields = {
        "temperature": rng.normal(250, 30, (NT, 5, LAT, LON)).astype(np.float32),
        "surface_pressure": rng.normal(1e5, 100, (NT, LAT, LON)).astype(np.float32),
        "toa_incident_solar_radiation": rng.uniform(
            0, 1e6, (NT, LAT, LON)).astype(np.float32),
        "total_precipitation": rng.uniform(0, 1e-3, (NT, LAT, LON)).astype(np.float32),
        "land_sea_mask": (rng.uniform(0, 1, (LAT, LON)) > 0.5).astype(np.float32),
    }
    for k, v in fields.items():
        chunks = (4,) + v.shape[1:] if v.ndim > 2 else None
        write_array(root, k, v, chunks=chunks)
    return root, fields, levels


def test_wb2_dataset_end_to_end(wb2_store):
    from credit_tpu.data.era5 import WB2ERA5Dataset

    root, fields, levels = wb2_store
    conf = {"data": {**CONF["data"]}}
    src = dict(conf["data"]["source"]["WB2"], store_path=root)
    conf["data"]["source"] = {"WB2": src}
    schema = ChannelSchema.from_config(conf)
    ds = WB2ERA5Dataset(schema, src, conf["data"], source_name="WB2",
                        history_len=1, forecast_len=1)

    # init times listed by DATETIME
    inits = ds.init_times()
    assert str(inits[0]) == "2018-01-02T00:00:00"
    assert str(inits[-1]) == "2018-01-03T18:00:00"

    # clock index 0 == 2018-01-02T00 == store index 4 (6h steps from 01-01)
    i = ds.index_of("2018-01-02T06:00:00")
    x = ds.input_at(i)
    assert x.shape == (1, LAT, LON, schema.n_input)
    st = 4 + i  # store time index
    # temperature levels selected [500, 850, 1000] -> store level idx 1,3,4
    np.testing.assert_allclose(x[0, ..., 0], fields["temperature"][st, 1])
    np.testing.assert_allclose(x[0, ..., 2], fields["temperature"][st, 4])
    sp_col = schema.input_names.index("surface_pressure")
    np.testing.assert_allclose(x[0, ..., sp_col],
                               fields["surface_pressure"][st])
    lsm_col = schema.input_names.index("land_sea_mask")
    np.testing.assert_allclose(x[0, ..., lsm_col], fields["land_sea_mask"])

    s = ds.sample(i, 1)
    assert s["y"].shape == (1, LAT, LON, schema.n_target)
    pr_col = schema.target_names.index("total_precipitation")
    np.testing.assert_allclose(s["y"][0, ..., pr_col],
                               fields["total_precipitation"][st + 1])
    assert s["forcing"].shape[-1] == 1

    b = ds.batch([i, i + 1], 1)
    assert b["x"].shape == (2, 1, LAT, LON, schema.n_input)


def test_wb2_via_load_dataset(wb2_store):
    from credit_tpu.data.local import load_dataset
    from credit_tpu.grid import Grid

    root, fields, _ = wb2_store
    conf = {"data": {**CONF["data"]}}
    conf["data"]["source"] = {
        "WB2": dict(CONF["data"]["source"]["WB2"], store_path=root)}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(LAT, LON)
    ds = load_dataset(conf, schema, grid)
    assert len(ds.init_times()) > 0
    assert ds.sample(2, 1)["x"].shape[-1] == schema.n_input


def test_store_clock_mismatch_raises(wb2_store):
    from credit_tpu.data.era5 import WB2ERA5Dataset

    root, _, _ = wb2_store
    conf = {"data": {**CONF["data"], "start_datetime": "2017-12-31"}}
    src = dict(CONF["data"]["source"]["WB2"], store_path=root)
    schema = ChannelSchema.from_config(CONF)
    with pytest.raises(ValueError, match="not on the store's time axis"):
        WB2ERA5Dataset(schema, src, conf["data"], source_name="WB2")


def test_missing_level_raises(wb2_store):
    from credit_tpu.data.era5 import WB2ERA5Dataset

    root, _, _ = wb2_store
    src = dict(CONF["data"]["source"]["WB2"], store_path=root,
               levels=[123.0])
    schema = ChannelSchema.from_config(CONF)
    with pytest.raises(ValueError, match="level 123.0 not in store"):
        WB2ERA5Dataset(schema, src, CONF["data"], source_name="WB2")


# ---------------------------------------------------------------------------
def test_tisr_computed_source():
    from credit_tpu.data.tisr import TISRDataset
    from credit_tpu.grid import Grid

    conf = {"data": {
        "source": {"SUN": {"dataset_type": "tisr",
                           "variables": {"dynamic_forcing":
                                         {"vars_2D": ["tisr"]}}}},
        "start_datetime": "2018-06-01", "end_datetime": "2018-06-03",
        "timestep": "6h", "lead_time_periods": 6,
    }}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(LAT, LON)
    ds = TISRDataset(schema, conf["data"]["source"]["SUN"], conf["data"],
                     source_name="SUN", grid=grid)
    x = ds.input_at(2)
    assert x.shape == (1, LAT, LON, 1)
    assert np.all(x >= 0) and x.max() > 0  # summer sun somewhere
    # 6h accumulation in J/m^2: bounded by TSI * 6h
    assert x.max() < 1361.0 * 6 * 3600


def test_hrrr_and_mrms_sources(tmp_path):
    """User-provided HRRR/MRMS zarr MIRRORS go through the generic zarr
    source (the real buckets hold GRIB/NetCDF granules — those use the
    granule readers in credit_tpu/data/obs.py, tests/test_obs_readers.py)."""
    from credit_tpu.data.era5 import GenericZarrDataset as HRRRDataset
    from credit_tpu.data.era5 import GenericZarrDataset as MRMSDataset

    rng = np.random.default_rng(3)
    root = str(tmp_path / "hrrr")
    write_array(root, "time", np.arange(12, dtype=np.int64),
                attrs={"units": "hours since 2022-06-01"})
    write_array(root, "level", np.array([1.0, 5.0, 10.0]))
    write_array(root, "TMP", rng.normal(280, 10, (12, 3, 6, 9)).astype(np.float32))
    write_array(root, "REFC", rng.uniform(0, 60, (12, 6, 9)).astype(np.float32))
    conf = {"data": {
        "source": {"HRRR": {
            "dataset_type": "zarr", "store_path": root,
            "levels": [1.0, 10.0],
            "variables": {"prognostic": {"vars_3D": ["TMP"],
                                         "vars_2D": ["REFC"]}},
        }},
        "start_datetime": "2022-06-01T01:00:00",
        "end_datetime": "2022-06-01T10:00:00", "timestep": "1h",
    }}
    schema = ChannelSchema.from_config(conf)
    ds = HRRRDataset(schema, conf["data"]["source"]["HRRR"], conf["data"],
                     source_name="HRRR")
    x = ds.input_at(ds.index_of("2022-06-01T03:00:00"))
    assert x.shape == (1, 6, 9, 3)  # 2 levels + REFC

    root2 = str(tmp_path / "mrms")
    write_array(root2, "time", np.arange(12, dtype=np.int64),
                attrs={"units": "hours since 2022-06-01"})
    write_array(root2, "precip_rate",
                rng.uniform(0, 20, (12, 6, 9)).astype(np.float32))
    conf2 = {"data": {
        "source": {"MRMS": {"dataset_type": "zarr", "store_path": root2,
                            "variables": {"diagnostic":
                                          {"vars_2D": ["precip_rate"]}}}},
        "start_datetime": "2022-06-01T01:00:00",
        "end_datetime": "2022-06-01T10:00:00", "timestep": "1h",
    }}
    schema2 = ChannelSchema.from_config(conf2)
    ds2 = MRMSDataset(schema2, conf2["data"]["source"]["MRMS"],
                      conf2["data"], source_name="MRMS")
    y = ds2.target_at(3)
    assert y.shape == (1, 6, 9, 1)
