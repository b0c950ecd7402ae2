"""Realtime NWP ingest on a synthetic GFS-like cube (VERDICT item 10).

Reference: credit/nwp.py:27-330 (build_GFS_init: regrid + vertical interp
to model levels), credit/gefs.py (member paths, unstagger)."""

import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.grid import Grid
from credit_tpu.nwp import (build_gfs_init, gefs_member_paths, load_gfs_grib,
                            unstagger_winds)

H, W = 12, 24          # model grid
SH, SW, SL = 18, 36, 6  # GFS-like source grid

CONF = {
    "data": {
        "source": {"GFS": {
            "levels": [30000.0, 50000.0, 70000.0, 85000.0],
            "variables": {
                "prognostic": {"vars_3D": ["T", "Q"], "vars_2D": ["SP"]},
                "static": {"vars_2D": ["lsm"]},
            },
        }},
    }
}


@pytest.fixture
def gfs_cube():
    rng = np.random.default_rng(5)
    src_lat = np.linspace(90, -90, SH)
    src_lon = np.linspace(0, 360, SW, endpoint=False)
    src_p = np.array([20000.0, 35000.0, 50000.0, 65000.0, 80000.0, 95000.0])
    # T increases toward the surface; Q decays upward — structure the
    # vertical interp must preserve
    t_prof = 220 + 60 * (src_p / 1e5)
    fields = {
        "tmp": (t_prof[:, None, None]
                + rng.normal(0, 2, (SL, SH, SW))).astype(np.float32),
        "spfh": (1e-2 * (src_p[:, None, None] / 1e5) ** 2
                 + rng.uniform(0, 1e-4, (SL, SH, SW))).astype(np.float32),
        "pressfc": rng.normal(1.0e5, 500, (SH, SW)).astype(np.float32),
    }
    return fields, src_lat, src_lon, src_p


def test_build_gfs_init_shapes_and_physics(gfs_cube):
    fields, src_lat, src_lon, src_p = gfs_cube
    schema = ChannelSchema.from_config(CONF)
    grid = Grid.regular(H, W, levels=[30000.0, 50000.0, 70000.0, 85000.0])
    lsm = (np.random.default_rng(0).uniform(0, 1, (H, W)) > 0.5
           ).astype(np.float32)
    ic = build_gfs_init(schema, grid, fields, src_lat, src_lon, src_p,
                        static_fields={"lsm": lsm})
    assert ic.shape == (1, 1, H, W, schema.n_input)
    assert np.isfinite(ic).all()

    names = schema.input_names
    t3 = ic[0, 0, :, :, names.index("T_L0"):names.index("T_L3") + 1]
    # interpolated T must increase with pressure level (toward surface)
    assert (np.diff(t3, axis=-1) > 0).mean() > 0.97
    # T at 500 hPa should sit near the source profile's 500 hPa value
    assert abs(t3[..., 1].mean() - (220 + 60 * 0.5)) < 3.0
    sp = ic[0, 0, :, :, names.index("SP")]
    assert abs(sp.mean() - 1.0e5) < 1e3  # regrid preserves the mean
    np.testing.assert_allclose(ic[0, 0, :, :, names.index("lsm")], lsm)


def test_missing_sp_raises(gfs_cube):
    fields, src_lat, src_lon, src_p = gfs_cube
    schema = ChannelSchema.from_config(CONF)
    grid = Grid.regular(H, W, levels=[50000.0])
    with pytest.raises(KeyError, match="surface pressure"):
        build_gfs_init(schema, grid,
                       {k: v for k, v in fields.items() if k != "pressfc"},
                       src_lat, src_lon, src_p)


def test_grib_loader_degrades_gracefully(tmp_path):
    """cfgrib is absent in this image: clear ImportError, not a crash."""
    with pytest.raises(ImportError, match="cfgrib"):
        load_gfs_grib(str(tmp_path / "x.grib2"), ["tmp"])


def test_gefs_member_paths():
    paths = gefs_member_paths("20240101", 3)
    assert set(paths) == {"c00", "p01", "p02", "p03"}
    assert "gep02" in paths["p02"] and "gec00" in paths["c00"]


def test_unstagger_winds():
    u_s = np.arange(12, dtype=np.float32).reshape(3, 4)
    v_w = np.arange(12, dtype=np.float32).reshape(3, 4)
    u, v = unstagger_winds(u_s, v_w)
    assert u.shape == (3, 3) and v.shape == (2, 4)
    np.testing.assert_allclose(u[0], [0.5, 1.5, 2.5])


def test_realtime_app_end_to_end(tmp_path, gfs_cube):
    """CLI-level: synthetic npz fields -> realtime rollout -> netCDF files."""
    fields, src_lat, src_lon, src_p = gfs_cube
    np.savez(tmp_path / "fields.npz", lat=src_lat, lon=src_lon,
             pressure=src_p, **fields)

    conf = {
        "save_loc": str(tmp_path / "ckpt"),
        "data": {**CONF["data"], "history_len": 1, "forecast_len": 1,
                 "lead_time_periods": 6, "n_times": 12},
        "trainer": {"type": "era5-v2", "learning_rate": 1e-3,
                    "train_batch_size": 1, "preflight": False},
        "model": {"type": "debugger", "image_height": H, "image_width": W,
                  "levels": 4, "channels": 2, "surface_channels": 1,
                  "input_only_channels": 1, "output_only_channels": 0,
                  "frames": 1, "output_frames": 1},
        "loss": {"training_loss": "mse"},
        "realtime": {"fields_path": str(tmp_path / "fields.npz"),
                     "forecast_steps": 2, "init_label": "2024-01-01T00Z",
                     "save_forecast": str(tmp_path / "rt")},
    }
    from credit_tpu.applications.realtime import run_realtime

    written = run_realtime(conf)
    assert len(written) == 2
    import os

    files = sorted(os.listdir(tmp_path / "rt" / "2024-01-01T00Z"))
    assert files == ["pred_2024-01-01T00Z_006.nc", "pred_2024-01-01T00Z_012.nc"]


def test_build_gefs_init_members(gfs_cube):
    """Ensemble IC assembly: control + perturbations stack to (E, 1, H, W, C)
    in member order (reference: gefs.py:206 member assembly)."""
    from credit_tpu.nwp import build_gefs_init

    fields, src_lat, src_lon, src_p = gfs_cube
    rng = np.random.default_rng(7)
    members = {"p02": {k: v + rng.normal(0, 0.1, v.shape).astype(np.float32)
                       for k, v in fields.items()},
               "c00": fields,
               "p01": {k: v + rng.normal(0, 0.1, v.shape).astype(np.float32)
                       for k, v in fields.items()}}
    schema = ChannelSchema.from_config(CONF)
    grid = Grid.regular(H, W, levels=[30000.0, 50000.0, 70000.0, 85000.0])
    ic, order = build_gefs_init(schema, grid, members, src_lat, src_lon, src_p)
    assert order == ["c00", "p01", "p02"]  # control first
    assert ic.shape == (3, 1, H, W, schema.n_input)
    assert np.isfinite(ic).all()
    # members differ (perturbations survive regrid + interp)
    assert not np.allclose(ic[0], ic[1])
    assert not np.allclose(ic[1], ic[2])


def test_realtime_ensemble_end_to_end(tmp_path, gfs_cube):
    """GEFS-style ensemble realtime: per-member npz cubes -> one batched
    rollout -> per-member output directories (reference:
    applications/rollout_realtime with GEFS members)."""
    fields, src_lat, src_lon, src_p = gfs_cube
    rng = np.random.default_rng(11)
    paths = {}
    for m in ("c00", "p01", "p02"):
        f = {k: (v if m == "c00" else
                 v + rng.normal(0, 0.1, v.shape).astype(np.float32))
             for k, v in fields.items()}
        p = tmp_path / f"{m}.npz"
        np.savez(p, lat=src_lat, lon=src_lon, pressure=src_p, **f)
        paths[m] = str(p)

    conf = {
        "save_loc": str(tmp_path / "ckpt"),
        "data": {**CONF["data"], "history_len": 1, "forecast_len": 1,
                 "lead_time_periods": 6, "n_times": 12},
        "trainer": {"type": "era5-v2", "learning_rate": 1e-3,
                    "train_batch_size": 1, "preflight": False},
        "model": {"type": "debugger", "image_height": H, "image_width": W,
                  "levels": 4, "channels": 2, "surface_channels": 1,
                  "input_only_channels": 1, "output_only_channels": 0,
                  "frames": 1, "output_frames": 1},
        "loss": {"training_loss": "mse"},
        "realtime": {"member_fields_paths": paths,
                     "forecast_steps": 2, "init_label": "2024-01-01T00Z",
                     "save_forecast": str(tmp_path / "rt")},
    }
    from credit_tpu.applications.realtime import run_realtime

    written = run_realtime(conf)
    assert len(written) == 6  # 3 members x 2 steps
    import os

    for m in ("c00", "p01", "p02"):
        files = sorted(os.listdir(tmp_path / "rt" / m / "2024-01-01T00Z"))
        assert files == ["pred_2024-01-01T00Z_006.nc",
                         "pred_2024-01-01T00Z_012.nc"], (m, files)
    # members produce distinct forecasts
    from credit_tpu.utils.ncio import open_dataset

    a = open_dataset(str(tmp_path / "rt" / "c00" / "2024-01-01T00Z" /
                         "pred_2024-01-01T00Z_006.nc"))
    b = open_dataset(str(tmp_path / "rt" / "p01" / "2024-01-01T00Z" /
                         "pred_2024-01-01T00Z_006.nc"))
    diffs = [np.abs(np.asarray(a[v].values) - np.asarray(b[v].values)).max()
             for v in a.keys()]
    assert max(diffs) > 1e-3, diffs
