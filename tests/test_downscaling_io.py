"""Downscaling transforms + template-based regional output writer
(reference: credit/transforms_downscaling.py, credit/output_downscaling.py)."""

import numpy as np

from credit_tpu.output import TemplateWriter, write_downscaling_outputs
from credit_tpu.transforms import (Clip, DataTransforms, Expand, Minmax, Pad,
                                   Power, Zscore)
from credit_tpu.utils.ncio import Dataset, Variable, open_dataset


def test_elementwise_transforms_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.5, 2.0, (3, 8, 8))
    for t in (Minmax(0.5, 2.0), Zscore(1.2, 0.4), Power(0.5)):
        y = t(x)
        np.testing.assert_allclose(t(y, inverse=True), x, rtol=1e-10)


def test_expand_pad_roundtrip():
    x = np.arange(24, dtype=np.float64).reshape(1, 4, 6)
    e = Expand(by=3)
    up = e(x)
    assert up.shape == (1, 12, 18)
    np.testing.assert_array_equal(e(up, inverse=True), x)
    p = Pad(left=1, right=2, top=3, bottom=1)
    padded = p(x)
    assert padded.shape == (1, 4 + 3 + 1, 6 + 1 + 2)
    np.testing.assert_array_equal(p(padded, inverse=True), x)


def test_clip_is_idempotent_both_ways():
    c = Clip(cmin=0.0)
    x = np.array([-1.0, 0.5, 2.0])
    np.testing.assert_array_equal(c(x), [0.0, 0.5, 2.0])
    np.testing.assert_array_equal(c(c(x), inverse=True), [0.0, 0.5, 2.0])


def test_data_transforms_composition_and_paramfile(tmp_path):
    # store per-variable zscore params in a netCDF "paramfile"
    Dataset({"T2": Variable(("s",), np.array([280.0], np.float32)),
             "P": Variable(("s",), np.array([0.0], np.float32))}).to_netcdf(
        str(tmp_path / "mean.nc"))
    Dataset({"T2": Variable(("s",), np.array([10.0], np.float32)),
             "P": Variable(("s",), np.array([2.0], np.float32))}).to_netcdf(
        str(tmp_path / "std.nc"))
    vardict = {"prognostic": ["T2"], "diagnostic": ["P"], "unused": ["junk"]}
    transdict = {
        "T2": {"zscore": "paramfile"},
        "P": {"clip": {"cmin": 0.0}, "zscore": "paramfile"},
        "paramfiles": {"mean": "mean.nc", "stdev": "std.nc"},
    }
    dt = DataTransforms(vardict, transdict, rootpath=str(tmp_path))
    x = {"prognostic": {"T2": np.array([290.0, 270.0])},
         "diagnostic": {"P": np.array([-1.0, 4.0])}}
    y = dt({k: dict(v) for k, v in x.items()})
    np.testing.assert_allclose(y["prognostic"]["T2"], [1.0, -1.0])
    np.testing.assert_allclose(y["diagnostic"]["P"], [0.0, 2.0])
    # inverse composition runs reversed
    back = dt(y, inverse=True)
    np.testing.assert_allclose(back["prognostic"]["T2"], [290.0, 270.0])
    np.testing.assert_allclose(back["diagnostic"]["P"], [0.0, 4.0])  # clipped


def test_template_writer_roundtrip(tmp_path):
    # template: projected y/x grid with two vars + one to drop
    ny, nx = 5, 7
    tpl = Dataset(
        {"T2": Variable(("time", "y", "x"), np.zeros((1, ny, nx), np.float32),
                        {"units": "K"}),
         "RAIN": Variable(("time", "y", "x"),
                          np.zeros((1, ny, nx), np.float32)),
         "IGNORED": Variable(("time", "y", "x"),
                             np.zeros((1, ny, nx), np.float32))},
        coords={"time": np.array([0.0]),
                "y": np.arange(ny, dtype=np.float64),
                "x": np.arange(nx, dtype=np.float64)})
    tpath = str(tmp_path / "template.nc")
    tpl.to_netcdf(tpath)

    w = TemplateWriter(tpath, out_vars=["T2", "RAIN"])
    data = {"T2": np.full((2, ny, nx), 300.0, np.float32),
            "RAIN": np.full((2, ny, nx), 1.5, np.float32)}
    newtime = {"time": np.array([6.0, 12.0]),
               "units": "hours since 2020-01-01", "calendar": "noleap"}
    out = str(tmp_path / "out.nc")
    assert w.write(data, newtime, out) == out
    ds = open_dataset(out)
    assert "T2" in ds and "RAIN" in ds and "IGNORED" not in ds
    np.testing.assert_allclose(np.asarray(ds["T2"].values)[0], 300.0)
    np.testing.assert_allclose(np.asarray(ds["time"].values), [6.0, 12.0])
    assert ds["T2"].attrs.get("units") == "K"


def test_write_downscaling_outputs_layout(tmp_path):
    ny, nx = 3, 4
    tpl = Dataset({"T2": Variable(("time", "y", "x"),
                                  np.zeros((1, ny, nx), np.float32))},
                  coords={"time": np.array([0.0]),
                          "y": np.arange(ny, dtype=np.float64),
                          "x": np.arange(nx, dtype=np.float64)})
    tpath = str(tmp_path / "tpl.nc")
    tpl.to_netcdf(tpath)
    writers = {"wrf": TemplateWriter(tpath, ["T2"]),
               "empty": TemplateWriter(tpath, [])}
    datadict = {"wrf": {"T2": np.ones((1, ny, nx), np.float32)},
                "empty": {}}
    out = write_downscaling_outputs(
        datadict, writers, {"time": np.array([0.0]), "units": "h",
                            "calendar": "standard"},
        str(tmp_path / "outdir"), "2020-01-01_00", prefix="fcst")
    assert len(out) == 1
    assert out[0].endswith("fcst.wrf.2020-01-01_00.nc")
