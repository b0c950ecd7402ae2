"""Parallelism tests on the 8-device virtual CPU mesh
(reference analogues: tests/test_domain_parallel.py halo asserts,
tests/test_ring_crps.py ring-vs-dense parity, mesh rank arithmetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from credit_tpu.parallel.mesh import build_mesh, parse_parallelism_conf


@pytest.fixture(scope="module")
def mesh1d():
    return build_mesh(1, 1, 4, jax.devices()[:4])


def test_parse_parallelism():
    conf = {"trainer": {"parallelism": {"data": "none", "tensor": 2, "domain": 2}}}
    assert parse_parallelism_conf(conf, 8) == (2, 2, 2)
    conf2 = {"trainer": {"parallelism": {"data": 4, "tensor": 1, "domain": 2}}}
    assert parse_parallelism_conf(conf2, 8) == (4, 1, 2)
    with pytest.raises(ValueError):
        parse_parallelism_conf({"trainer": {"parallelism": {"data": 3, "tensor": 1, "domain": 2}}}, 8)


def test_halo_exchange_contents(mesh1d):
    from credit_tpu.parallel.halo import halo_exchange

    # global (1, 8, 4, 1) field, lat = 8 rows, 4 shards of 2 rows
    x = jnp.arange(8.0).reshape(1, 8, 1, 1) * jnp.ones((1, 8, 4, 1))

    def f(xl):
        return halo_exchange(xl, halo=1, axis_name="domain")

    out = shard_map(f, mesh=mesh1d, in_specs=P(None, "domain"),
                    out_specs=P(None, "domain"))(x)
    # each shard now has 4 rows: [neighbor_top, own0, own1, neighbor_bot]
    out = np.asarray(out).reshape(4, 4, 4)[:, :, 0]  # (shard, rows, lon0)
    np.testing.assert_allclose(out[1], [1, 2, 3, 4])  # shard1 rows 2,3 + halos
    np.testing.assert_allclose(out[2], [3, 4, 5, 6])
    # edge shards get zero halos
    assert out[0][0] == 0.0 and out[3][-1] == 0.0


def test_halo_exchange_gradients_route_to_neighbor(mesh1d):
    from credit_tpu.parallel.halo import halo_exchange

    x = jnp.ones((1, 8, 4, 1))

    def loss(xg):
        def f(xl):
            h = halo_exchange(xl, 1, "domain")
            return jnp.sum(h**2, keepdims=True).reshape(1, 1, 1, 1)

        parts = shard_map(f, mesh=mesh1d, in_specs=P(None, "domain"),
                          out_specs=P(None, "domain"))(xg)
        return parts.sum()

    g = jax.grad(loss)(x)
    g = np.asarray(g)[0, :, 0, 0]
    # interior rows (1..6) are counted twice (own shard + one neighbor halo);
    # outermost rows once
    np.testing.assert_allclose(g[0], 2.0)  # row0: own + no north neighbor -> 1 use...
    # compute expected usage: row r used by own shard always, plus by
    # northern neighbor if r is a top row of a non-first shard, plus southern
    # neighbor if bottom row of non-last shard.
    expected = np.full(8, 2.0)
    expected[[1, 2, 3, 4, 5, 6]] = 4.0  # shared rows: d/dx of x^2 counted twice
    # rows: shard boundaries at 2,4,6. row0: only own -> 2x. row1: bottom row
    # of shard0 -> used by shard1 halo too -> 4x. row2: top of shard1 -> 4x...
    expected = np.array([2, 4, 4, 4, 4, 4, 4, 2], np.float64)
    np.testing.assert_allclose(g, expected)


def test_trim_halo_roundtrip(mesh1d, rng):
    from credit_tpu.parallel.halo import halo_exchange, trim_halo

    x = jnp.asarray(rng.standard_normal((2, 8, 4, 3)), jnp.float32)

    def f(xl):
        return trim_halo(halo_exchange(xl, 2, "domain"), 2)

    out = shard_map(f, mesh=mesh1d, in_specs=P(None, "domain"),
                    out_specs=P(None, "domain"))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_distributed_group_norm_matches_global(mesh1d, rng):
    from credit_tpu.parallel.halo import distributed_group_norm_moments

    x = jnp.asarray(rng.standard_normal((2, 8, 4, 6)), jnp.float32)

    def f(xl):
        mean, var = distributed_group_norm_moments(xl, num_groups=3, axis_name="domain")
        return mean[:, None], var[:, None]

    mean_d, var_d = shard_map(f, mesh=mesh1d, in_specs=P(None, "domain"),
                              out_specs=(P(None, "domain"), P(None, "domain")))(x)
    # all shards agree; compare first shard's copy vs global computation
    xg = np.asarray(x).reshape(2, -1, 3, 2)
    mean_g = xg.mean(axis=(1, 3))
    var_g = xg.var(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(mean_d)[:, 0], mean_g, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_d)[:, 0], var_g, rtol=1e-4, atol=1e-5)


def test_ring_crps_matches_dense(rng):
    from credit_tpu.parallel.ring_crps import dense_fair_crps, make_ring_crps_loss

    mesh = build_mesh(8, 1, 1, jax.devices())
    # rename axes: ring over 'dp'
    members = jnp.asarray(rng.standard_normal((8, 6, 6)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((6, 6)), jnp.float32)
    loss = make_ring_crps_loss(mesh, "dp")
    ring = float(loss(members, target))
    dense = float(dense_fair_crps(members, target))
    np.testing.assert_allclose(ring, dense, rtol=1e-5)


def test_ring_crps_gradients_match_dense(rng):
    from credit_tpu.parallel.ring_crps import dense_fair_crps, make_ring_crps_loss

    mesh = build_mesh(8, 1, 1, jax.devices())
    members = jnp.asarray(rng.standard_normal((8, 4, 4)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    loss = make_ring_crps_loss(mesh, "dp")
    g_ring = jax.grad(lambda m: loss(m, target))(members)
    g_dense = jax.grad(lambda m: dense_fair_crps(m, target))(members)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-6)


def test_sharding_validator():
    """Aggregated pre-compile divisibility errors (reference: the parallel
    conversion/validation helpers)."""
    from credit_tpu.parallel.mesh import build_mesh
    from credit_tpu.parallel.validate import assert_valid_sharding, validate_sharding

    mesh = build_mesh(2, 2, 2)
    conf = {
        "trainer": {"train_batch_size": 3, "valid_batch_size": 4},
        "model": {"image_height": 181, "num_heads": 3, "dim": [32, 48],
                  "padding_conf": {"activate": True, "pad_lat": [1, 1]}},
    }
    probs = validate_sharding(conf, mesh=mesh)
    text = "\n".join(probs)
    assert "train_batch_size=3" in text
    assert "image_height=183" in text       # padded height checked
    assert "num_heads=3" in text
    with pytest.raises(ValueError, match="invalid parallelism"):
        assert_valid_sharding(conf, mesh=mesh)

    ok = {"trainer": {"train_batch_size": 4},
          "model": {"image_height": 180, "num_heads": 4, "dim": [32, 64]}}
    assert validate_sharding(ok, mesh=mesh) == []


def test_halo_benchmark_parity():
    """benchmark_halo: GSPMD auto-halo and the explicit shard_map
    halo-exchange path both match the unsharded stencil, forward and
    gradient (the PERF.md GSPMD-is-at-parity evidence; gives
    parallel/halo.py its production consumer)."""
    from credit_tpu.applications.benchmark import benchmark_halo

    out = benchmark_halo(n_devices=4, h=32, w=48, c=8, k=3, steps=3)
    assert out["fwd_err_gspmd"] < 1e-4
    assert out["fwd_err_explicit"] < 1e-4
    assert out["grad_err_gspmd"] < 1e-3
    assert out["grad_err_explicit"] < 1e-3
    # both paths actually communicate (halo rings compiled in)
    assert out["collectives_gspmd"]["collective-permute"] > 0
    assert out["collectives_explicit"]["collective-permute"] > 0
