"""Lat-lon regridding: bilinear, nearest, first-order conservative.

Pure numpy/JAX re-implementation of the reference's torch regridders
(reference: credit/regrid.py:93 conservative, :134 bilinear, :155 nearest,
:285 Regridder dispatch; SCRIP writers credit/grid.py). Regrid operators are
precomputed sparse/structured index+weight maps applied as gathers —
XLA-friendly and reusable across fields.

Layout: fields (..., lat, lon).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _wrap_lon(lon):
    return np.mod(lon, 360.0)


class BilinearRegridder:
    def __init__(self, src_lat, src_lon, dst_lat, dst_lon):
        src_lat = np.asarray(src_lat, np.float64)
        src_lon = _wrap_lon(np.asarray(src_lon, np.float64))
        dst_lat = np.asarray(dst_lat, np.float64)
        dst_lon = _wrap_lon(np.asarray(dst_lon, np.float64))
        # latitude: clampped linear interp on the (possibly descending) axis
        order = np.argsort(src_lat)
        lat_sorted = src_lat[order]
        j = np.clip(np.searchsorted(lat_sorted, dst_lat), 1, len(src_lat) - 1)
        j0, j1 = order[j - 1], order[j]
        wlat = np.clip((dst_lat - lat_sorted[j - 1])
                       / (lat_sorted[j] - lat_sorted[j - 1]), 0, 1)
        # longitude: periodic linear interp
        nlon = len(src_lon)
        dlon = 360.0 / nlon
        pos = (dst_lon - src_lon[0]) / dlon
        i0 = np.floor(pos).astype(int) % nlon
        i1 = (i0 + 1) % nlon
        wlon = pos - np.floor(pos)
        self.j0, self.j1 = jnp.asarray(j0), jnp.asarray(j1)
        self.i0, self.i1 = jnp.asarray(i0), jnp.asarray(i1)
        self.wlat = jnp.asarray(wlat, jnp.float32)
        self.wlon = jnp.asarray(wlon, jnp.float32)

    def __call__(self, f: jnp.ndarray) -> jnp.ndarray:
        f00 = f[..., self.j0, :][..., :, self.i0]
        f01 = f[..., self.j0, :][..., :, self.i1]
        f10 = f[..., self.j1, :][..., :, self.i0]
        f11 = f[..., self.j1, :][..., :, self.i1]
        wl = self.wlat[:, None]
        wo = self.wlon[None, :]
        return ((f00 * (1 - wo) + f01 * wo) * (1 - wl)
                + (f10 * (1 - wo) + f11 * wo) * wl)


class NearestRegridder:
    def __init__(self, src_lat, src_lon, dst_lat, dst_lon):
        src_lat = np.asarray(src_lat, np.float64)
        src_lon = _wrap_lon(np.asarray(src_lon, np.float64))
        dst_lat = np.asarray(dst_lat, np.float64)
        dst_lon = _wrap_lon(np.asarray(dst_lon, np.float64))
        self.j = jnp.asarray(np.abs(dst_lat[:, None] - src_lat[None, :]).argmin(1))
        d = np.abs(dst_lon[:, None] - src_lon[None, :])
        d = np.minimum(d, 360.0 - d)
        self.i = jnp.asarray(d.argmin(1))

    def __call__(self, f: jnp.ndarray) -> jnp.ndarray:
        return f[..., self.j, :][..., :, self.i]


class ConservativeRegridder:
    """First-order conservative: destination cell = area-weighted mean of
    overlapping source cells (separable in lat/lon for regular grids)."""

    def __init__(self, src_lat, src_lon, dst_lat, dst_lon):
        self.Wlat = jnp.asarray(self._overlap_matrix_lat(src_lat, dst_lat), jnp.float32)
        self.Wlon = jnp.asarray(self._overlap_matrix_lon(src_lon, dst_lon), jnp.float32)

    @staticmethod
    def _edges(centers, periodic=False, span=360.0):
        c = np.asarray(centers, np.float64)
        e = np.empty(len(c) + 1)
        e[1:-1] = 0.5 * (c[:-1] + c[1:])
        if periodic:
            e[0] = c[0] - (e[1] - c[0])
            e[-1] = e[0] + span
        else:
            e[0] = c[0] - (e[1] - c[0])
            e[-1] = c[-1] + (c[-1] - e[-2])
        return e

    def _overlap_matrix_lat(self, src, dst):
        s = np.sort(np.asarray(src, np.float64))
        d = np.sort(np.asarray(dst, np.float64))
        se = np.clip(self._edges(s), -90, 90)
        de = np.clip(self._edges(d), -90, 90)
        # overlap in sin(lat) (area weight)
        se_s, de_s = np.sin(np.deg2rad(se)), np.sin(np.deg2rad(de))
        W = np.zeros((len(d), len(s)))
        for k in range(len(d)):
            lo, hi = de_s[k], de_s[k + 1]
            ov = np.clip(np.minimum(hi, se_s[1:]) - np.maximum(lo, se_s[:-1]), 0, None)
            if ov.sum() > 0:
                W[k] = ov / ov.sum()
        # restore original orderings
        src_order = np.argsort(np.asarray(src))
        dst_order = np.argsort(np.asarray(dst))
        Wo = np.zeros_like(W)
        Wo[dst_order[:, None], src_order[None, :]] = W
        return Wo

    def _overlap_matrix_lon(self, src, dst):
        s = _wrap_lon(np.asarray(src, np.float64))
        d = _wrap_lon(np.asarray(dst, np.float64))
        se = self._edges(np.sort(s), periodic=True)
        de = self._edges(np.sort(d), periodic=True)
        ns, nd = len(s), len(d)
        W = np.zeros((nd, ns))
        for k in range(nd):
            lo, hi = de[k], de[k + 1]
            for shift in (-360.0, 0.0, 360.0):
                ov = np.clip(np.minimum(hi, se[1:] + shift)
                             - np.maximum(lo, se[:-1] + shift), 0, None)
                W[k] += ov
            if W[k].sum() > 0:
                W[k] /= W[k].sum()
        so = np.argsort(s)
        do = np.argsort(d)
        Wo = np.zeros_like(W)
        Wo[do[:, None], so[None, :]] = W
        return Wo

    def __call__(self, f: jnp.ndarray) -> jnp.ndarray:
        out = jnp.einsum("ij,...jk->...ik", self.Wlat, f)
        return jnp.einsum("lk,...jk->...jl", self.Wlon, out)


def make_regridder(method: str, src_lat, src_lon, dst_lat, dst_lon):
    cls = {"bilinear": BilinearRegridder, "nearest": NearestRegridder,
           "conservative": ConservativeRegridder}[method]
    return cls(src_lat, src_lon, dst_lat, dst_lon)
