"""Multi-init / ensemble rollout app (VERDICT round-1 item 5).

Reference: credit/applications/rollout_to_netcdf.py:195-345 (rank-strided
init loop, per-init output dirs), credit/forecast.py:7,39."""

import datetime as dt
import os

import numpy as np
import pytest

from credit_tpu.applications.experiment import _resolve_init_indices, run_rollout
from credit_tpu.forecast import generate_forecasts, strided_for_rank

H, W, NLEV = 8, 16, 3

CONF = {
    "seed": 0,
    "data": {
        "source": {"ERA5": {
            "levels": [0.0, 1.0, 2.0],
            "variables": {"prognostic": {"vars_3D": ["T"], "vars_2D": ["SP"]}},
        }},
        "history_len": 1, "forecast_len": 1, "lead_time_periods": 6,
        "n_times": 24,
    },
    "trainer": {"type": "era5-v2", "learning_rate": 1e-3,
                "train_batch_size": 2, "preflight": False},
    "model": {"type": "debugger", "image_height": H, "image_width": W,
              "levels": NLEV, "channels": 1, "surface_channels": 1,
              "input_only_channels": 0, "output_only_channels": 0,
              "frames": 1, "output_frames": 1},
    "loss": {"training_loss": "mse"},
}


def test_generate_forecasts_grid():
    inits = generate_forecasts({"forecasts": {
        "start_year": 2020, "start_month": 1, "start_day": 5,
        "start_hours": [0, 12], "duration": 3}})
    assert len(inits) == 6
    assert inits[0] == dt.datetime(2020, 1, 5, 0)
    assert inits[-1] == dt.datetime(2020, 1, 7, 12)
    assert strided_for_rank(inits, 1, 2) == inits[1::2]


def test_resolve_init_indices_datetime_clock():
    class FakeClockDS:
        history_len = 1

        def index_of(self, iso):
            return {"2020-01-05T00:00:00": 7, "2020-01-05T12:00:00": 9}[iso]

    out = _resolve_init_indices(
        {"forecasts": {"start_year": 2020, "start_month": 1, "start_day": 5,
                       "start_hours": [0, 12], "duration": 1}}, FakeClockDS())
    assert out == [(7, "2020-01-05T00Z"), (9, "2020-01-05T12Z")]


def test_multi_init_ensemble_rollout_layout(tmp_path):
    conf = {**CONF, "save_loc": str(tmp_path / "ckpt"),
            "predict": {"forecasts": {"duration": 1, "start_hours": [0, 12]},
                        "forecast_steps": 2, "ensemble_size": 2,
                        "save_forecast": str(tmp_path / "out")}}
    written = run_rollout(conf)
    out = tmp_path / "out"
    dirs = sorted(os.listdir(out))
    # 2 inits x (control + 1 member) = 4 directories
    assert dirs == ["init0001", "init0001_e01", "init0002", "init0002_e01"]
    for d in dirs:
        files = sorted(os.listdir(out / d))
        assert files == [f"pred_{d}_006.nc", f"pred_{d}_012.nc"]
    assert len(written) == 8
    # member differs from control (perturbed IC)
    from credit_tpu.utils.ncio import open_dataset

    a = open_dataset(str(out / "init0001" / "pred_init0001_006.nc"))
    b = open_dataset(str(out / "init0001_e01" / "pred_init0001_e01_006.nc"))
    v = next(iter(a.keys()))
    assert not np.allclose(np.asarray(a[v].values), np.asarray(b[v].values))


def test_bred_vector_members(tmp_path):
    conf = {**CONF, "save_loc": str(tmp_path / "ckpt"),
            "predict": {"forecast_steps": 1, "ensemble_size": 3,
                        "perturbation": "bred", "perturbation_std": 0.05,
                        "bred_cycles": 2,
                        "save_forecast": str(tmp_path / "out")}}
    written = run_rollout(conf)
    dirs = sorted(os.listdir(tmp_path / "out"))
    assert dirs == ["init0001", "init0001_e01", "init0001_e02"]
    from credit_tpu.utils.ncio import open_dataset

    arrs = []
    for d in dirs:
        ds = open_dataset(str(tmp_path / "out" / d / f"pred_{d}_006.nc"))
        v = next(iter(ds.keys()))
        arrs.append(np.asarray(ds[v].values))
    # bred pair: members differ from control and (mirrored) from each other
    assert not np.allclose(arrs[0], arrs[1])
    assert not np.allclose(arrs[1], arrs[2])
