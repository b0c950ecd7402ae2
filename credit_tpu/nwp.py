"""Realtime NWP ingest: GFS/GEFS analysis -> model initial conditions.

TPU-native re-design of the reference's realtime plumbing
(reference: credit/nwp.py:27 build_GFS_init — download GDAS model-level
GRIB, regrid to the model grid, vertically interpolate to hybrid levels;
credit/gefs.py:14 download_gefs_run + member assembly). Differences:

- The GRIB decode step rides optional deps (cfgrib absent in this image ->
  `load_gfs_grib` raises a clear ImportError and `build_gfs_init` accepts
  already-decoded numpy cubes instead), so the numeric pipeline —
  horizontal regrid (credit_tpu/ops/regrid.py precomputed gathers) and
  log-pressure vertical interpolation (credit_tpu/physics/interp.py) —
  is fully exercisable without network or GRIB codecs.
- Everything returns the flat channels-last IC tensor the jitted step
  consumes, assembled per ChannelSchema, instead of an xarray Dataset.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import numpy as np

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.ops.regrid import make_regridder
from credit_tpu.physics.interp import create_pressure_grid

logger = logging.getLogger(__name__)

# GFS short-name -> ERA5-style variable mapping (reference: nwp.py:100
# _get_gfs_maps 'wchapmanera5' map)
GFS_MAP = {
    "ugrd": "U", "vgrd": "V", "tmp": "T", "spfh": "Q",
    "pressfc": "SP", "tmp2m": "VAR_2T", "ugrd10m": "VAR_10U",
    "vgrd10m": "VAR_10V", "hgtsfc": "Z_SFC", "dzdt": "W",
    "clwmr": "CLWMR", "o3mr": "O3MR",
}

GDAS_BASE = "gs://global-forecast-system/"


def build_file_path(date, base_path: str = GDAS_BASE, file_type: str = "atm",
                    step: str = "f000") -> str:
    """GDAS object path for an init time (reference: nwp.py:145)."""
    ymd = f"{date.year:04d}{date.month:02d}{date.day:02d}"
    hh = f"{date.hour:02d}"
    return (f"{base_path.rstrip('/')}/gfs.{ymd}/{hh}/atmos/"
            f"gfs.t{hh}z.{'atmf000' if file_type == 'atm' else 'sfcf000'}"
            f".nc" if file_type in ("atm", "sfc") else base_path)


def load_gfs_grib(path: str, variables: Sequence[str]) -> Dict[str, np.ndarray]:
    """Decode a GFS GRIB2 file (requires cfgrib; reference: nwp.py:163)."""
    try:
        import cfgrib  # noqa: F401
        import xarray as xr
    except ImportError as e:
        raise ImportError(
            "GFS GRIB decoding needs cfgrib+xarray, which are not installed "
            "in this environment. Decode externally and pass numpy cubes to "
            "build_gfs_init(fields=...) instead.") from e
    ds = xr.open_dataset(path, engine="cfgrib")
    return {v: np.asarray(ds[v].values) for v in variables if v in ds}


def _interp_columns(var: np.ndarray, p_src: np.ndarray, p_dst: np.ndarray
                    ) -> np.ndarray:
    """Per-column monotone log-pressure interpolation, fully vectorized
    (reference: nwp.py:267 _vertical_interpolation via numba; here pure
    numpy — the production path runs inside jit via physics/interp.py).

    var: (L_src, H, W); p_src: (L_src, H, W) or (L_src,); p_dst: (L_dst, H, W).
    """
    lsrc, h, w = var.shape
    if p_src.ndim == 1:
        p_src = np.broadcast_to(p_src[:, None, None], (lsrc, h, w))
    lv = np.log(np.maximum(p_src, 1e-3))
    lq = np.log(np.maximum(p_dst, 1e-3))
    out = np.empty((p_dst.shape[0], h, w), var.dtype)
    flat_v = var.reshape(lsrc, -1)
    flat_p = lv.reshape(lsrc, -1)
    flat_q = lq.reshape(p_dst.shape[0], -1)
    for col in range(flat_v.shape[1]):
        out.reshape(p_dst.shape[0], -1)[:, col] = np.interp(
            flat_q[:, col], flat_p[:, col], flat_v[:, col])
    return out


def build_gfs_init(schema: ChannelSchema, grid,
                   fields: Dict[str, np.ndarray],
                   src_lat: np.ndarray, src_lon: np.ndarray,
                   src_pressure: Optional[np.ndarray] = None,
                   a_half: Optional[np.ndarray] = None,
                   b_half: Optional[np.ndarray] = None,
                   method: str = "bilinear",
                   variable_map: Optional[Dict[str, str]] = None,
                   static_fields: Optional[Dict[str, np.ndarray]] = None
                   ) -> np.ndarray:
    """Assemble a model IC from decoded NWP fields.

    fields: {gfs_or_era5_name: (L, H_src, W_src) 3-D | (H_src, W_src) 2-D}
    src_pressure: source pressure levels (Pa), (L,) or (L, H_src, W_src)
    a_half/b_half: target hybrid coefficients; with SP regridded first the
    3-D variables interpolate onto the model's hybrid pressures
    (reference: nwp.py:267). Without them (pure pressure-level target) the
    grid's `levels` are used as target pressures.

    Returns the flat IC (1, 1, H, W, n_input) in schema channel order.
    """
    vmap = {**GFS_MAP, **(variable_map or {})}
    named = {}
    for k, v in fields.items():
        named[vmap.get(k, k)] = np.asarray(v, np.float32)
    static_fields = {k: np.asarray(v, np.float32)
                     for k, v in (static_fields or {}).items()}

    rg = make_regridder(method, np.asarray(src_lat), np.asarray(src_lon),
                        np.asarray(grid.lat), np.asarray(grid.lon))

    def regrid(a):
        if a.ndim == 2:
            return np.asarray(rg(a[None])[0])
        return np.asarray(rg(a))

    regridded = {k: regrid(v) for k, v in named.items()}

    if "SP" not in regridded:
        raise KeyError("surface pressure ('SP'/'pressfc') is required to "
                       "build the vertical target grid")
    sp = regridded["SP"]

    # target pressures per column
    if a_half is not None and b_half is not None:
        import jax.numpy as jnp

        _, p_full = create_pressure_grid(jnp.asarray(sp[None]),
                                         jnp.asarray(a_half, jnp.float32),
                                         jnp.asarray(b_half, jnp.float32))
        p_dst = np.moveaxis(np.asarray(p_full[0]), -1, 0)  # (L_dst, H, W)
    else:
        levels = np.asarray(grid.levels, np.float32)
        p_dst = np.broadcast_to(levels[:, None, None],
                                (len(levels),) + sp.shape).copy()

    cols = []
    for e in schema.input_entries:
        base, sep, lev = e.name.rpartition("_L")
        if sep and lev.isdigit() and base in regridded:
            v3 = regridded[base]
            key = ("interp", base)
            if key not in regridded:
                if src_pressure is None:
                    raise ValueError(f"3-D variable {base} needs src_pressure")
                regridded[key] = _interp_columns(
                    v3, np.asarray(src_pressure, np.float32), p_dst)
            cols.append(regridded[key][int(lev)])
        elif e.name in regridded:
            cols.append(regridded[e.name])
        elif e.name in static_fields:
            f = static_fields[e.name]
            if f.shape != sp.shape:
                f = regrid(f)
            cols.append(f)
        else:
            logger.warning("IC variable %s not in NWP fields; zero-filled",
                           e.name)
            cols.append(np.zeros_like(sp))
    ic = np.stack(cols, axis=-1).astype(np.float32)
    return ic[None, None]  # (1, 1, H, W, C_in)


def gefs_member_paths(init_date: str, members: int,
                      base: str = "gs://gfs-ensemble-forecast-system/"
                      ) -> Dict[str, str]:
    """GEFS perturbation-member object paths (reference: gefs.py:14
    download_gefs_run naming: gep01..gepNN + gec00 control)."""
    d = init_date.replace("-", "")
    out = {"c00": f"{base}gefs.{d[:8]}/{d[8:10] if len(d) > 8 else '00'}/"
                  f"atmos/pgrb2ap5/gec00.t00z.pgrb2a.0p50.f000"}
    for m in range(1, members + 1):
        out[f"p{m:02d}"] = out["c00"].replace("gec00", f"gep{m:02d}")
    return out


def unstagger_winds(u_s: np.ndarray, v_w: np.ndarray):
    """Average staggered wind components to cell centers
    (reference: gefs.py:169 unstagger_winds)."""
    u_a = 0.5 * (u_s[..., :-1] + u_s[..., 1:])
    v_a = 0.5 * (v_w[..., :-1, :] + v_w[..., 1:, :])
    return u_a, v_a


def member_order(member_fields: Dict[str, Dict[str, np.ndarray]]):
    """Deterministic member ordering: control first, then p01..pNN
    (reference: gefs.py:206 assembles gec00 + gep## in member order)."""
    return sorted(member_fields, key=lambda k: (k not in ("c00", "gec00"), k))


def build_gefs_init(schema: ChannelSchema, grid,
                    member_fields: Dict[str, Dict[str, np.ndarray]],
                    src_lat: np.ndarray, src_lon: np.ndarray,
                    src_pressure: Optional[np.ndarray] = None,
                    a_half: Optional[np.ndarray] = None,
                    b_half: Optional[np.ndarray] = None,
                    method: str = "bilinear",
                    variable_map: Optional[Dict[str, str]] = None,
                    static_fields: Optional[Dict[str, np.ndarray]] = None):
    """Assemble the GEFS ensemble IC cube: every member (control gec00 +
    perturbations gep01..gepNN) through the same regrid + vertical-interp
    pipeline, stacked on the leading ensemble axis.

    member_fields: {member_key: {var: array}} — decoded per-member cubes
    (from per-member GRIBs via load_gfs_grib, npz sidecars, or the
    gefs_member_paths() bucket listing).
    Returns ((E, 1, H, W, n_input) IC, [member keys in stack order]).
    Reference: credit/gefs.py:206 member download + assembly feeding the
    ensemble realtime apps (applications/rollout_realtime*.py).
    """
    order = member_order(member_fields)
    ics = [build_gfs_init(schema, grid, member_fields[m], src_lat, src_lon,
                          src_pressure, a_half, b_half, method,
                          variable_map, static_fields)
           for m in order]
    return np.concatenate(ics, axis=0), order
