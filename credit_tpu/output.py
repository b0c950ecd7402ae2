"""Forecast output: flat tensors -> xarray Datasets -> per-step netCDF files.

Mirrors the reference writer contract (reference: credit/output.py —
load_metadata:25, make_xarray:89, save_netcdf_increment:174 writes
`<init>Z/pred_<init>Z_<FHR>.nc`), channels-last and schema-driven: 3-D
variables are reassembled from their per-level channels.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.grid import Grid


def split_channels(flat: np.ndarray, schema: ChannelSchema) -> Dict[str, np.ndarray]:
    """(..., lat, lon, C_target) -> {var: (..., lat, lon) or (..., lev, lat, lon)}."""
    out: Dict[str, np.ndarray] = {}
    levels: Dict[str, list] = {}
    for e in schema.target_entries:
        base, sep, lev = e.name.rpartition("_L")
        if sep and lev.isdigit():
            levels.setdefault(base, []).append((int(lev), e.index))
        else:
            out[e.name] = flat[..., e.index]
    for base, idxs in levels.items():
        idxs.sort()
        chans = [i for _, i in idxs]
        # (..., lat, lon, L) -> (..., L, lat, lon)
        arr = flat[..., chans]
        out[base] = np.moveaxis(arr, -1, -3)
    return out


def make_xarray(flat: np.ndarray, schema: ChannelSchema, grid: Grid,
                init_time=None, lead_hours: Optional[float] = None):
    """flat: (T, lat, lon, C_target) -> Dataset on the grid coords (real
    xarray when installed, else the built-in scipy-netCDF3 stand-in)."""
    from credit_tpu.utils.ncio import Dataset

    fields = split_channels(flat, schema)
    coords = {"lat": grid.lat, "lon": grid.lon,
              "time": np.arange(flat.shape[0], dtype=np.float64)}
    if grid.levels is not None:
        coords["level"] = grid.levels
    from credit_tpu.metadata import variable_attrs
    from credit_tpu.utils.ncio import Variable

    data_vars = {}
    for name, arr in fields.items():
        # CF attributes per variable (reference: credit/metadata/era5.yaml
        # applied by output.py when writing forecasts)
        va = variable_attrs(name)
        if arr.ndim == 4:  # (T, lev, lat, lon)
            data_vars[name] = Variable(("time", "level", "lat", "lon"), arr, va)
        else:  # (T, lat, lon)
            data_vars[name] = Variable(("time", "lat", "lon"), arr, va)
    attrs = {}
    if init_time is not None:
        attrs["initialization_time"] = str(init_time)
    if lead_hours is not None:
        attrs["lead_hours"] = float(lead_hours)
    return Dataset(data_vars, coords, attrs)


def save_netcdf_increment(flat: np.ndarray, schema: ChannelSchema, grid: Grid,
                          save_dir: str, init_label: str, forecast_hour: int,
                          init_time=None) -> str:
    """Write one forecast step: <save_dir>/<init_label>/pred_<init_label>_<FHR>.nc
    (same file naming scheme as the reference, credit/output.py:174)."""
    ds = make_xarray(flat, schema, grid, init_time, forecast_hour)
    out_dir = os.path.join(save_dir, init_label)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"pred_{init_label}_{forecast_hour:03d}.nc")
    ds.to_netcdf(path)
    return path
