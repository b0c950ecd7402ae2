"""GOES/HRRR/MRMS granule readers: projection, tolerance matching, band and
level selection, extent cropping — exercised against synthetic local
granules (the reference's network-mocked dataset tests:
tests/goes_dataset_test.py, hrrr_dataset_test.py, mrms_dataset_test.py).
"""

import datetime as dt
import json
import os

import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.projection import (HRRR_PARAMS, extent_slices,
                                        goes_fixed_grid_to_latlon,
                                        haversine_nearest, lambert_forward,
                                        lambert_grid_latlon, lambert_inverse)
from credit_tpu.utils.ncio import Dataset, Variable


# ---------------------------------------------------------------------------
# projection math
def test_goes_fixed_grid_pug_example():
    """GOES-R PUG worked example: scan angle (x=-0.024052, y=0.095340) rad
    on GOES-East -> (33.846162N, 84.690932W)."""
    lat, lon = goes_fixed_grid_to_latlon(
        np.array([-0.024052]), np.array([0.095340]), lon_origin=-75.0)
    np.testing.assert_allclose(lat[0, 0], 33.846162, atol=1e-4)
    np.testing.assert_allclose(lon[0, 0], -84.690932, atol=1e-4)


def test_goes_off_disk_is_nan():
    lat, lon = goes_fixed_grid_to_latlon(np.array([0.3]), np.array([0.3]))
    assert np.isnan(lat).all() and np.isnan(lon).all()


def test_hrrr_lambert_grid_corners():
    """The computed HRRR grid reproduces the published corner coordinates."""
    lat, lon = lambert_grid_latlon()
    np.testing.assert_allclose(lat[0, 0], 21.138123, atol=1e-5)
    np.testing.assert_allclose(lon[0, 0], -122.719528, atol=1e-5)
    # published HRRR upper-right corner ~ (47.8424N, 60.9178W)
    np.testing.assert_allclose(lat[-1, -1], 47.8424, atol=2e-3)
    np.testing.assert_allclose(lon[-1, -1], -60.9178, atol=2e-3)


def test_lambert_roundtrip():
    x, y = lambert_forward(40.0, -100.0)
    lat, lon = lambert_inverse(x, y)
    np.testing.assert_allclose([lat, lon], [40.0, -100.0], atol=1e-9)


def test_extent_slices_corners():
    lat2d, lon2d = lambert_grid_latlon({**HRRR_PARAMS, "nx": 60, "ny": 40})
    si, sj = extent_slices(lat2d, lon2d, {"nw": [lat2d[30, 10], lon2d[30, 10]],
                                          "se": [lat2d[10, 50], lon2d[10, 50]]})
    assert (si.start, si.stop) == (10, 31)
    assert (sj.start, sj.stop) == (10, 51)
    i, j = haversine_nearest(lat2d, lon2d, lat2d[17, 23], lon2d[17, 23])
    assert (i, j) == (17, 23)


# ---------------------------------------------------------------------------
# synthetic GOES granules
NY, NX = 10, 12


def _goes_granule(path, seed):
    rng = np.random.default_rng(seed)
    # small scan-angle window near nadir (on-disk everywhere)
    x = np.linspace(-0.02, 0.02, NX)
    y = np.linspace(0.06, 0.10, NY)
    Dataset(
        {f"CMI_C{b:02d}": Variable(("y", "x"),
                                   rng.uniform(200, 300, (NY, NX))
                                   .astype(np.float32))
         for b in (4, 7, 13)}
        | {"goes_imager_projection": Variable(
            (), np.zeros(()), {
                "longitude_of_projection_origin": -75.0,
                "perspective_point_height": 35786023.0,
                "semi_major_axis": 6378137.0,
                "semi_minor_axis": 6356752.31414})},
        coords={"x": x, "y": y}).to_netcdf(path)


def _goes_name(t: dt.datetime) -> str:
    doy = (t - dt.datetime(t.year, 1, 1)).days + 1
    return (f"OR_ABI-L2-MCMIPC-M6_G16_s{t.year}{doy:03d}"
            f"{t:%H%M%S}2_e0_c0.nc")


GOES_CONF = {
    "data": {
        "source": {
            "G16": {
                "dataset_type": "goes",
                "variables": {"prognostic": {
                    "vars_2D": ["CMI_C04", "CMI_C07"]}},
            }
        },
        "start_datetime": "2021-06-01 00:00",
        "end_datetime": "2021-06-01 18:00",
        "timestep": "6h",
    }
}


def _goes_dir(tmp_path, offsets_min=(1, -2, 2, 1)):
    d = tmp_path / "goes"
    d.mkdir()
    t0 = dt.datetime(2021, 6, 1)
    for k, off in enumerate(offsets_min):
        t = t0 + dt.timedelta(hours=6 * k, minutes=off)
        _goes_granule(str(d / _goes_name(t)), seed=k)
    return str(d)


def test_goes_reader_tolerance_and_bands(tmp_path):
    from credit_tpu.data.obs import GOESDataset

    conf = json.loads(json.dumps(GOES_CONF))
    src = conf["data"]["source"]["G16"]
    src["mode"] = "local"
    src["path"] = _goes_dir(tmp_path)  # granules 1-2 min OFF the clock
    schema = ChannelSchema.from_config(conf)
    ds = GOESDataset(schema, src, conf["data"], source_name="G16",
                     history_len=1, forecast_len=1)
    # nearest-granule matching within the 3-min default tolerance
    assert len(ds._match) == 4
    x = ds.input_at(0)
    assert x.shape == (1, NY, NX, 2)  # two selected bands
    assert np.isfinite(x).all()
    # band selection is by name: C04 channel differs from C07
    assert not np.allclose(x[..., 0], x[..., 1])
    # projection grid: finite, within the window around the sub-satellite
    lat, lon = ds.grid_latlon()
    assert lat.shape == (NY, NX)
    assert np.isfinite(lat).all()
    assert (lat > 20).all() and (lat < 50).all()
    assert (lon > -90).all() and (lon < -60).all()
    # sample/batch API works end to end
    b = ds.batch([0, 1], 1)
    assert b["x"].shape == (2, 1, NY, NX, 2)


def test_goes_reader_outside_tolerance_raises(tmp_path):
    from credit_tpu.data.obs import GOESDataset

    conf = json.loads(json.dumps(GOES_CONF))
    src = conf["data"]["source"]["G16"]
    src["mode"] = "local"
    src["path"] = _goes_dir(tmp_path, offsets_min=(1, 30, 2, 1))  # 30min gap
    schema = ChannelSchema.from_config(conf)
    with pytest.raises(ValueError, match="no granule within tolerance"):
        GOESDataset(schema, src, conf["data"], source_name="G16")


def test_goes_extent_crop(tmp_path):
    from credit_tpu.data.obs import GOESDataset

    conf = json.loads(json.dumps(GOES_CONF))
    src = conf["data"]["source"]["G16"]
    src["mode"] = "local"
    src["path"] = _goes_dir(tmp_path)
    schema = ChannelSchema.from_config(conf)
    full = GOESDataset(schema, src, conf["data"], source_name="G16")
    lat, lon = full.grid_latlon()
    src2 = dict(src, extent={"nw": [float(lat[7, 2]), float(lon[7, 2])],
                             "se": [float(lat[2, 9]), float(lon[2, 9])]})
    crop = GOESDataset(schema, src2, conf["data"], source_name="G16")
    x = crop.input_at(0)
    assert x.shape == (1, 6, 8, 2)  # rows 2..7, cols 2..9
    la2, lo2 = crop.grid_latlon()
    assert la2.shape == (6, 8)


def test_goes_remote_mode_is_gated():
    from credit_tpu.data.obs import GOESDataset

    conf = json.loads(json.dumps(GOES_CONF))
    src = conf["data"]["source"]["G16"]
    src["mode"] = "remote"
    schema = ChannelSchema.from_config(conf)
    with pytest.raises(RuntimeError, match="noaa-goes16"):
        GOESDataset(schema, src, conf["data"], source_name="G16")


# ---------------------------------------------------------------------------
# synthetic HRRR granules
H_NY, H_NX = 14, 16
PRS_LEVELS = [250.0, 500.0, 700.0, 850.0, 925.0, 1000.0]


def _hrrr_granule(path, seed, with_latlon=False):
    rng = np.random.default_rng(seed)
    data = {
        "T": Variable(("level", "y", "x"),
                      rng.uniform(250, 290,
                                  (len(PRS_LEVELS), H_NY, H_NX))
                      .astype(np.float32)),
        "t2m": Variable(("y", "x"),
                        rng.uniform(270, 300, (H_NY, H_NX))
                        .astype(np.float32)),
    }
    coords = {"level": np.asarray(PRS_LEVELS)}
    if with_latlon:
        lat, lon = lambert_grid_latlon(
            {**HRRR_PARAMS, "nx": H_NX, "ny": H_NY})
        data["latitude"] = Variable(("y", "x"), lat)
        data["longitude"] = Variable(("y", "x"), lon)
    Dataset(data, coords=coords).to_netcdf(path)


HRRR_CONF = {
    "data": {
        "source": {
            "HRRR": {
                "dataset_type": "hrrr",
                "levels": [500.0, 850.0],
                "variables": {"prognostic": {"vars_3D": ["T"],
                                             "vars_2D": ["t2m"]}},
            }
        },
        "start_datetime": "2022-03-01 00:00",
        "end_datetime": "2022-03-01 06:00",
        "timestep": "3h",
    }
}


def _hrrr_dir(tmp_path, with_latlon=False):
    d = tmp_path / "hrrr"
    d.mkdir()
    t0 = dt.datetime(2022, 3, 1)
    for k in range(3):
        t = t0 + dt.timedelta(hours=3 * k)
        _hrrr_granule(str(d / f"HRRR_{t:%Y%m%d-%H%M%S}.nc"), seed=k,
                      with_latlon=with_latlon)
    return str(d)


def test_hrrr_pressure_level_selection(tmp_path):
    from credit_tpu.data.obs import HRRRDataset

    conf = json.loads(json.dumps(HRRR_CONF))
    src = conf["data"]["source"]["HRRR"]
    src["mode"] = "local"
    src["path"] = _hrrr_dir(tmp_path)
    schema = ChannelSchema.from_config(conf)
    ds = HRRRDataset(schema, src, conf["data"], source_name="HRRR")
    x = ds.input_at(0)
    # channels: T_L0 (500 hPa), T_L1 (850 hPa), t2m
    assert x.shape == (1, H_NY, H_NX, 3)
    gran = ds.granule_for(0)
    raw = np.asarray(gran["T"].values)
    np.testing.assert_allclose(x[0, ..., 0], raw[1], rtol=1e-6)  # 500 hPa
    np.testing.assert_allclose(x[0, ..., 1], raw[3], rtol=1e-6)  # 850 hPa
    # Lambert 2-D coordinates computed from the standard params
    lat, lon = ds.grid_latlon()
    assert lat.shape == (H_NY, H_NX)
    np.testing.assert_allclose(lat[0, 0], 21.138123, atol=1e-5)


def test_hrrr_granule_latlon_preferred(tmp_path):
    from credit_tpu.data.obs import HRRRDataset

    conf = json.loads(json.dumps(HRRR_CONF))
    src = conf["data"]["source"]["HRRR"]
    src["mode"] = "local"
    src["path"] = _hrrr_dir(tmp_path, with_latlon=True)
    schema = ChannelSchema.from_config(conf)
    ds = HRRRDataset(schema, src, conf["data"], source_name="HRRR")
    lat, _ = ds.grid_latlon()
    ref, _ = lambert_grid_latlon({**HRRR_PARAMS, "nx": H_NX, "ny": H_NY})
    np.testing.assert_allclose(lat, ref, atol=1e-5)


def test_hrrr_missing_level_raises(tmp_path):
    from credit_tpu.data.obs import HRRRDataset

    conf = json.loads(json.dumps(HRRR_CONF))
    src = conf["data"]["source"]["HRRR"]
    src["mode"] = "local"
    src["path"] = _hrrr_dir(tmp_path)
    src["levels"] = [512.0]
    conf["data"]["source"]["HRRR"]["variables"]["prognostic"]["vars_3D"] = ["T"]
    schema = ChannelSchema.from_config(conf)
    ds = HRRRDataset(schema, src, conf["data"], source_name="HRRR")
    with pytest.raises(KeyError, match="pressure level 512"):
        ds.input_at(0)


IDX_TEXT = """1:0:d=2022030100:TMP:250 mb:anl:
2:120:d=2022030100:TMP:500 mb:anl:
3:260:d=2022030100:UGRD:500 mb:anl:
4:400:d=2022030100:TMP:2 m above ground:anl:
5:530:d=2022030100:PRES:surface:anl:
"""


def test_grib_idx_parsing_and_selection():
    """Remote HRRR byte-range math (reference: hrrr.py:310,409,434)."""
    from credit_tpu.data.obs import parse_grib_idx, select_idx_entries

    entries = parse_grib_idx(IDX_TEXT)
    assert len(entries) == 5
    assert entries[0]["byte_start"] == 0 and entries[0]["byte_end"] == 119
    assert entries[-1]["byte_end"] is None  # open-ended last message
    # pressure-level selection in REQUESTED order
    sel = select_idx_entries(entries, "TMP", pressure_levels=[500, 250])
    assert [e["byte_start"] for e in sel] == [120, 0]
    # fixed-level surface field
    t2m = select_idx_entries(entries, "TMP", idx_level="2 m above ground")
    assert len(t2m) == 1 and t2m[0]["byte_start"] == 400
    with pytest.raises(KeyError, match="no level"):
        select_idx_entries(entries, "TMP", pressure_levels=[700])


# ---------------------------------------------------------------------------
# synthetic MRMS granules
M_NY, M_NX = 12, 20


def _mrms_granule(path, seed):
    rng = np.random.default_rng(seed)
    lat = np.linspace(20.0, 55.0, M_NY)
    lon = np.linspace(230.0, 300.0, M_NX)  # 0-360 convention
    Dataset({"MultiSensor_QPE_01H_Pass2": Variable(
        ("lat", "lon"), rng.exponential(1.0, (M_NY, M_NX))
        .astype(np.float32))},
        coords={"lat": lat, "lon": lon}).to_netcdf(path)


MRMS_CONF = {
    "data": {
        "source": {
            "MRMS": {
                "dataset_type": "mrms",
                "variables": {"diagnostic": {
                    "vars_2D": ["MultiSensor_QPE_01H_Pass2"]},
                    "prognostic": {"vars_2D": [
                        "MultiSensor_QPE_01H_Pass2"]}},
            }
        },
        "start_datetime": "2024-06-01 00:00",
        "end_datetime": "2024-06-01 02:00",
        "timestep": "1h",
    }
}


def test_mrms_reader_extent_negative_lon(tmp_path):
    from credit_tpu.data.obs import MRMSDataset

    d = tmp_path / "mrms"
    d.mkdir()
    t0 = dt.datetime(2024, 6, 1)
    for k in range(3):
        t = t0 + dt.timedelta(hours=k)
        _mrms_granule(str(d / f"MRMS_{t:%Y%m%d-%H%M%S}.nc"), seed=k)
    conf = json.loads(json.dumps(MRMS_CONF))
    src = conf["data"]["source"]["MRMS"]
    src["mode"] = "local"
    src["path"] = str(d)
    # -130..-60 in -180..180 form, normalized to 0-360 (mrms.py:57)
    src["extent"] = [-125.0, -65.0, 25.0, 50.0]
    schema = ChannelSchema.from_config(conf)
    ds = MRMSDataset(schema, src, conf["data"], source_name="MRMS")
    x = ds.input_at(0)
    lat, lon = ds.grid_latlon()
    assert x.shape[1:3] == lat.shape
    assert (lat >= 25).all() and (lat <= 50).all()
    assert (lon >= 235 - 1e-9).all() and (lon <= 295 + 1e-9).all()
    assert x.shape[1] < M_NY and x.shape[2] < M_NX  # actually cropped


def test_catalog_json_path(tmp_path):
    """Explicit file_catalog_path skips the directory scan
    (reference: goes.py file_catalog_path)."""
    from credit_tpu.data.obs import MRMSDataset

    d = tmp_path / "mrms"
    d.mkdir()
    t0 = dt.datetime(2024, 6, 1)
    cat = {}
    for k in range(3):
        t = t0 + dt.timedelta(hours=k)
        p = str(d / f"oddname_{k}.nc")
        _mrms_granule(p, seed=k)
        cat[t.isoformat()] = p
    cp = str(tmp_path / "catalog.json")
    with open(cp, "w") as f:
        json.dump(cat, f)
    conf = json.loads(json.dumps(MRMS_CONF))
    src = conf["data"]["source"]["MRMS"]
    src["file_catalog_path"] = cp
    schema = ChannelSchema.from_config(conf)
    ds = MRMSDataset(schema, src, conf["data"], source_name="MRMS")
    assert np.isfinite(ds.input_at(0)).all()


def test_multi_source_routes_obs_types(tmp_path):
    """MultiSourceDataset routes dataset_type goes/hrrr/mrms to the granule
    readers (reference: multi_source.py:65 _SOURCE_REGISTRY)."""
    from credit_tpu import registry
    from credit_tpu.data.local import CLOCKED_TYPES
    from credit_tpu.data.obs import GOESDataset, HRRRDataset, MRMSDataset

    for t in ("goes", "hrrr", "mrms"):
        assert t in CLOCKED_TYPES
    assert registry.get("dataset", "goes") is GOESDataset
    assert registry.get("dataset", "hrrr") is HRRRDataset
    assert registry.get("dataset", "mrms") is MRMSDataset


# ---------------------------------------------------------------------------
# granule-gap policies (missing: error|skip|fill) — reference tolerates
# archive outages per sample (goes.py:1064-1079 nearest-tolerance indexer)


def _gap_conf(tmp_path):
    """6-step clock with granule idx 1 missing (30 min off the clock)."""
    conf = json.loads(json.dumps(GOES_CONF))
    conf["data"]["end_datetime"] = "2021-06-02 06:00"
    src = conf["data"]["source"]["G16"]
    src["mode"] = "local"
    src["path"] = _goes_dir(tmp_path, offsets_min=(1, 30, 2, 1, 0, -1))
    return conf, src


def test_goes_missing_skip_drops_init_times(tmp_path):
    from credit_tpu.data.obs import GOESDataset

    conf, src = _gap_conf(tmp_path)
    src["missing"] = "skip"
    schema = ChannelSchema.from_config(conf)
    ds = GOESDataset(schema, src, conf["data"], source_name="G16",
                     history_len=1, forecast_len=1)
    # clock idx 1 unmatched -> init windows {0,1} and {1,2} dropped
    assert list(ds.valid_init_indices(1)) == [2, 3]
    # a valid window reads fine; the gap index refuses loudly
    s = ds.sample(2, 1)
    assert np.isfinite(s["x"]).all() and np.isfinite(s["y"]).all()
    with pytest.raises(KeyError, match="no granule within tolerance"):
        ds.input_at(1)


def test_goes_missing_fill_yields_nan_frames(tmp_path):
    from credit_tpu.data.obs import GOESDataset

    conf, src = _gap_conf(tmp_path)
    src["missing"] = "fill"
    schema = ChannelSchema.from_config(conf)
    ds = GOESDataset(schema, src, conf["data"], source_name="G16",
                     history_len=1, forecast_len=1)
    # every margin-valid init stays addressable under fill
    assert list(ds.valid_init_indices(1)) == [0, 1, 2, 3]
    x1 = ds.input_at(1)
    assert np.isnan(x1).all()          # the gap frame
    assert x1.shape == (1, NY, NX, 2)  # probed shape matches real frames
    assert np.isfinite(ds.input_at(0)).all()
    # a sample whose target lands on the gap: y is NaN, x finite
    s = ds.sample(0, 1)
    assert np.isfinite(s["x"]).all() and np.isnan(s["y"]).all()


def test_goes_missing_error_is_default_and_actionable(tmp_path):
    from credit_tpu.data.obs import GOESDataset

    conf, src = _gap_conf(tmp_path)
    schema = ChannelSchema.from_config(conf)
    with pytest.raises(ValueError, match="missing: skip"):
        GOESDataset(schema, src, conf["data"], source_name="G16")
    src["missing"] = "bogus"
    with pytest.raises(ValueError, match="error|skip|fill"):
        GOESDataset(schema, src, conf["data"], source_name="G16")


def test_sampler_honors_valid_indices():
    from credit_tpu.data.sampler import MultiStepSampler

    s = MultiStepSampler(100, 2, forecast_len=1, history_len=1, seed=0,
                         valid_indices=[5, 9, 23, 42, 77, 88])
    drawn = {int(i) for b in s for i in b}
    assert drawn <= {5, 9, 23, 42, 77, 88} and len(drawn) >= 4


def test_idx_byte_range_assembly_offline(tmp_path):
    """Slice a local file per parse_grib_idx output (the remote path's HTTP
    Range math) and reassemble the exact message bytes — no network
    (reference: hrrr.py:310 _parse_idx, :374 _fetch_message)."""
    from credit_tpu.data.obs import (parse_grib_idx, read_idx_ranges,
                                     select_idx_entries)

    rng = np.random.default_rng(0)
    msgs = [rng.bytes(n) for n in (120, 140, 140, 130, 77)]
    blob = b"".join(msgs)
    path = tmp_path / "synthetic.grib2"
    path.write_bytes(blob)
    entries = parse_grib_idx(IDX_TEXT)
    got = read_idx_ranges(str(path), entries)
    assert got == msgs  # every range, including the open-ended tail
    # range math composes with variable selection
    sel = select_idx_entries(entries, "TMP", pressure_levels=[500])
    assert read_idx_ranges(str(path), sel) == [msgs[1]]
