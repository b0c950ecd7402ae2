"""Explicit latitude-domain decomposition: shard_map halo exchange.

The GSPMD path (parallel/sharding.py) lets XLA insert halo exchanges for
sharded-spatial convs automatically. This module is the EXPLICIT analogue of
the reference's hand-rolled domain parallelism (reference:
credit/domain_parallel/halo_exchange.py:20 _HaloExchangeFunction fwd/bwd,
layers.py:29-461, sharding.py:13-106): lat-sharded tensors inside
shard_map, halo rings via lax.ppermute over the 'domain' mesh axis, with a
custom VJP that routes edge gradients back to the neighbor — the same
backward contract as the reference's autograd Function.

Used for: distributed GroupNorm moments (psum), shard/gather helpers, and
as the building block for manually-overlapped Pallas stencils.

Layout inside shard_map: local blocks (..., lat_local, lon, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

LAT_AXIS = -3


def _take_lat(x, start, size):
    idx = [slice(None)] * x.ndim
    idx[LAT_AXIS] = slice(start, start + size) if start >= 0 else slice(start, None)
    return x[tuple(idx)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = "domain"):
    """Pad the local lat block with `halo` rows from N/S neighbors.

    Edge shards get zero halos (the reference pre-pads the full grid with
    spherical pole halos BEFORE sharding — trainer_gen2._sharded_forward —
    so zeros at the outer edges are correct there too).
    Returns (..., lat_local + 2*halo, lon, C).
    """
    return _halo_fwd_impl(x, halo, axis_name)


def _halo_fwd_impl(x, halo, axis_name):
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    # send my top rows to the northern neighbor (idx-1): they become its
    # bottom halo; send bottom rows south.
    top_rows = _take_lat(x, 0, halo)
    bot_rows = _take_lat(x, -halo, halo)
    # ppermute: shift down (i -> i+1) carries bottom halo source
    from_north = lax.ppermute(bot_rows, axis_name,
                              [(i, i + 1) for i in range(n - 1)])
    from_south = lax.ppermute(top_rows, axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    zero = jnp.zeros_like(top_rows)
    north_halo = jnp.where(idx == 0, zero, from_north)
    south_halo = jnp.where(idx == n - 1, zero, from_south)
    return jnp.concatenate([north_halo, x, south_halo], axis=LAT_AXIS)


def _halo_fwd(x, halo, axis_name):
    return _halo_fwd_impl(x, halo, axis_name), None


def _halo_bwd(halo, axis_name, _, g):
    """Reverse exchange: interior grads pass through; halo-region grads are
    sent back to the neighbor that owns those rows and accumulated at its
    edges (reference halo_exchange.py:79-142)."""
    n = lax.axis_size(axis_name)
    g_north = _take_lat(g, 0, halo)           # grad wrt neighbor's bottom rows
    g_interior = _take_lat(g, halo, g.shape[LAT_AXIS] - 2 * halo)
    g_south = _take_lat(g, -halo, halo)       # grad wrt neighbor's top rows
    to_south = lax.ppermute(g_north, axis_name,
                            [(i, i - 1) for i in range(1, n)])
    to_north = lax.ppermute(g_south, axis_name,
                            [(i, i + 1) for i in range(n - 1)])
    idx = lax.axis_index(axis_name)
    zero = jnp.zeros_like(g_north)
    add_bottom = jnp.where(idx == n - 1, zero, to_south)
    add_top = jnp.where(idx == 0, zero, to_north)
    dx = g_interior
    nlat = dx.shape[LAT_AXIS]
    top = _take_lat(dx, 0, halo) + add_top
    mid = _take_lat(dx, halo, nlat - 2 * halo)
    bot = _take_lat(dx, -halo, halo) + add_bottom
    return (jnp.concatenate([top, mid, bot], axis=LAT_AXIS),)


halo_exchange.defvjp(_halo_fwd, _halo_bwd)


def trim_halo(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Drop the halo rows again (reference HaloExchange.trim)."""
    return _take_lat(x, halo, x.shape[LAT_AXIS] - 2 * halo)


def distributed_group_norm_moments(x: jnp.ndarray, num_groups: int,
                                   axis_name: str = "domain"):
    """Group mean/var with stats all-reduced over the domain axis
    (reference: domain_parallel/layers.py DistributedGroupNorm)."""
    b = x.shape[0]
    c = x.shape[-1]
    xg = x.reshape(b, -1, num_groups, c // num_groups)
    cnt = xg.shape[1]
    s1 = jnp.sum(xg, axis=(1, 3))
    s2 = jnp.sum(xg**2, axis=(1, 3))
    cnt_total = lax.psum(jnp.asarray(cnt * xg.shape[3], jnp.float32), axis_name)
    s1 = lax.psum(s1, axis_name)
    s2 = lax.psum(s2, axis_name)
    mean = s1 / cnt_total
    var = s2 / cnt_total - mean**2
    return mean, var


def shard_lat(x: jnp.ndarray, n_shards: int, shard_idx: int) -> jnp.ndarray:
    """Host-side helper: slice shard `shard_idx` of the lat axis
    (reference: domain_parallel/sharding.py shard_tensor)."""
    nlat = x.shape[LAT_AXIS]
    per = nlat // n_shards
    return _take_lat(x, shard_idx * per, per)
