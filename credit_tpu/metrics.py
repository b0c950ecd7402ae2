"""Latitude-weighted forecast metrics.

Re-implementation of the reference's LatWeightedMetrics
(reference: credit/metrics.py:24 — per-variable lat-weighted
ACC/RMSE/MSE/MAE (+ensemble std :51-112), climatology-anomaly variant :113,
ensemble variant :245). Channels-last: fields are (B, T, lat, lon, C).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class LatWeightedMetrics:
    def __init__(self, grid, var_names: Optional[Sequence[str]] = None,
                 climatology: Optional[jnp.ndarray] = None):
        w = grid.coslat_weights()
        self.w = jnp.asarray(w, jnp.float32)[:, None]  # (lat, 1)
        self.var_names = list(var_names) if var_names else None
        self.climatology = climatology  # (lat, lon, C) or None

    def _wmean(self, f):
        return jnp.mean(f * self.w[..., None], axis=(-3, -2))  # over lat, lon

    def __call__(self, target: jnp.ndarray, pred: jnp.ndarray,
                 prefix: str = "") -> Dict[str, jnp.ndarray]:
        """Returns dict of per-channel metrics averaged over batch/time."""
        if self.climatology is not None:
            pa = pred - self.climatology
            ta = target - self.climatology
        else:
            pa = pred - self._wmean(pred)[..., None, None, :]
            ta = target - self._wmean(target)[..., None, None, :]
        err = pred - target
        mse = self._wmean(err**2)
        out = {
            "mse": mse.mean(axis=(0, 1)),
            "rmse": jnp.sqrt(mse).mean(axis=(0, 1)),
            "mae": self._wmean(jnp.abs(err)).mean(axis=(0, 1)),
            "acc": (self._wmean(pa * ta)
                    / jnp.sqrt(self._wmean(pa**2) * self._wmean(ta**2) + 1e-12)
                    ).mean(axis=(0, 1)),
        }
        named = {}
        for k, v in out.items():
            if self.var_names:
                for i, name in enumerate(self.var_names):
                    named[f"{prefix}{k}_{name}"] = v[i]
            named[f"{prefix}{k}"] = v.mean()
        return named

    def ensemble(self, target: jnp.ndarray, pred_ens: jnp.ndarray,
                 prefix: str = "") -> Dict[str, jnp.ndarray]:
        """pred_ens: (B, E, T, lat, lon, C). Adds spread and ensemble-mean
        skill (reference metrics.py:245)."""
        mean = pred_ens.mean(axis=1)
        out = self(target, mean, prefix)
        spread = self._wmean(pred_ens.std(axis=1) ** 2)
        out[f"{prefix}spread"] = jnp.sqrt(spread).mean()
        rmse = out[f"{prefix}rmse"]
        out[f"{prefix}spread_skill_ratio"] = out[f"{prefix}spread"] / (rmse + 1e-12)
        return out


class UnWeightedMetrics(LatWeightedMetrics):
    """Per-variable ACC/RMSE/MSE/MAE WITHOUT latitude weighting — for
    regional datasets on projected grids where cos(lat) area weights do
    not apply (reference: credit/metrics_downscaling.py:8
    UnWeightedMetrics, same math with w_lat=None)."""

    def __init__(self, var_names: Optional[Sequence[str]] = None,
                 climatology: Optional[jnp.ndarray] = None):
        self.w = jnp.ones((1, 1), jnp.float32)
        self.var_names = list(var_names) if var_names else None
        self.climatology = climatology


def spread_error(target: jnp.ndarray, pred_ens: jnp.ndarray, w=None):
    """(spread, rmse of ensemble mean) — reference verification/ensemble.py:14."""
    mean = pred_ens.mean(axis=1)
    err2 = (mean - target) ** 2
    var = pred_ens.var(axis=1, ddof=1)
    if w is not None:
        err2 = err2 * w
        var = var * w
    return jnp.sqrt(var.mean()), jnp.sqrt(err2.mean())


# regional latitude partition for ensemble verification
# (reference: credit/verification/ensemble.py:7 latitude_slices)
LATITUDE_BANDS = {
    "global": (-91.0, 91.0),
    "s_extratropics": (-91.0, -24.5),
    "tropics": (-24.5, 24.5),
    "n_extratropics": (24.5, 91.0),
}


def spread_error_regional(target: jnp.ndarray, pred_ens: jnp.ndarray,
                          lats) -> dict:
    """Latitude-band-partitioned spread/RMSE with cos(lat) area weighting
    and the (M+1)/(M-1) finite-ensemble spread correction
    (reference: credit/verification/ensemble.py:14-45 spread_error).

    target: (B, ..., H, W, C) truth; pred_ens: (B, M, ..., H, W, C);
    lats: (H,) latitudes in degrees. Returns
    {"std_<band>": ..., "rmse_<band>": ...} scalars.
    """
    import numpy as np

    lats = np.asarray(lats)
    m = pred_ens.shape[1]
    corr = (m + 1) / max(m - 1, 1)
    w_lat = jnp.asarray(np.cos(np.deg2rad(lats)))  # (H,)
    mean = pred_ens.mean(axis=1)
    # reference quirk kept verbatim: "rmse" is sqrt((mean-true)^2) == |err|
    # averaged over the non-lat dims BEFORE the area-weighted lat mean
    # (ensemble.py:29 rmse_raw)
    err = jnp.abs(mean - target)
    std = pred_ens.std(axis=1, ddof=0)
    # collapse all axes except lat: (..., H, W, C) -> (H,)
    lat_ax = -3
    red = tuple(i for i in range(err.ndim) if i != err.ndim + lat_ax)
    err_lat = err.mean(axis=red)
    std_lat = std.mean(axis=red)
    out = {}
    for name, (lo, hi) in LATITUDE_BANDS.items():
        sel = jnp.asarray((lats >= lo) & (lats < hi), err_lat.dtype)
        wsum = jnp.sum(w_lat * sel) + 1e-12
        out[f"std_{name}"] = float(corr * jnp.sum(std_lat * w_lat * sel) / wsum)
        out[f"rmse_{name}"] = float(jnp.sum(err_lat * w_lat * sel) / wsum)
    return out


def zonal_spectrum(f: jnp.ndarray) -> jnp.ndarray:
    """Per-latitude zonal power spectrum (reference verification/standard.py:9
    semantics, FFT over lon): (..., lat, lon) -> (..., lat, nlon//2+1)."""
    fk = jnp.fft.rfft(f, axis=-1, norm="forward")
    mag = (fk * jnp.conj(fk)).real
    scale = jnp.ones(mag.shape[-1]).at[1:].set(2.0)
    return mag * scale


def binned_spread_skill(target: jnp.ndarray, pred_ens: jnp.ndarray,
                        n_bins: int = 10):
    """Binned spread-skill relation (reference: credit/verification/
    ensemble.py:45): bin grid points by ensemble spread, return per-bin
    (mean spread, RMSE of the ensemble mean). A calibrated ensemble tracks
    the 1:1 line."""
    mean = pred_ens.mean(axis=1)
    err2 = (mean - target) ** 2
    var = pred_ens.var(axis=1, ddof=1)
    spread = jnp.sqrt(var).ravel()
    err2 = err2.ravel()
    edges = jnp.quantile(spread, jnp.linspace(0, 1, n_bins + 1))
    idx = jnp.clip(jnp.searchsorted(edges[1:-1], spread), 0, n_bins - 1)
    import jax

    cnt = jax.ops.segment_sum(jnp.ones_like(spread), idx, n_bins)
    sp_bin = jax.ops.segment_sum(spread, idx, n_bins) / jnp.maximum(cnt, 1)
    rmse_bin = jnp.sqrt(jax.ops.segment_sum(err2, idx, n_bins) / jnp.maximum(cnt, 1))
    return sp_bin, rmse_bin, cnt


def divergent_rotational_spectra(u: jnp.ndarray, v: jnp.ndarray, grid):
    """Per-degree divergent and rotational kinetic-energy spectra via the
    SHT (reference: credit/verification/standard.py:50): KE_l from the
    vorticity/divergence coefficients."""
    import numpy as np

    from credit_tpu.ops.sht import SHT

    sht = SHT(np.asarray(grid.lat), grid.nlon, grid="equiangular")
    vrt, div = sht.vrtdiv_spec(u, v)
    eig = -sht.laplacian
    inv = jnp.where(eig > 0, 1.0 / jnp.maximum(eig, 1e-30), 0.0)[:, None]
    # KE_l = l(l+1)/(2) * |psi_lm|^2 summed over m, psi = invlap(vrt)
    scale = jnp.ones(sht.mmax).at[1:].set(2.0)  # hermitian doubling
    ke_rot = 0.5 * jnp.sum(jnp.abs(vrt) ** 2 * inv * scale, axis=-1)
    ke_div = 0.5 * jnp.sum(jnp.abs(div) ** 2 * inv * scale, axis=-1)
    return ke_rot, ke_div
