"""Misc model + ops tests: noise-injection ensemble, UNet, solar, regrid."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.models import load_model


def test_crossformer_with_noise_produces_spread(rng):
    conf = {"model": {
        "type": "crossformer-ensemble",
        "frames": 1, "image_height": 32, "image_width": 64, "levels": 2,
        "channels": 2, "surface_channels": 2, "input_only_channels": 1,
        "output_only_channels": 1, "dim": [16, 32, 64, 128],
        "depth": [1, 1, 1, 1], "dim_head": 16,
        "global_window_size": [2, 2, 1, 1], "local_window_size": 2,
        "cross_embed_kernel_sizes": [[4, 8], [2, 4], [2, 4], [2, 4]],
        "cross_embed_strides": [2, 2, 2, 2], "use_spectral_norm": False,
        "padding_conf": {"activate": False},
    }}
    model = load_model(conf)
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 64, 7)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=())(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    y1 = model.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    y2 = model.apply(variables, x, rngs={"noise": jax.random.PRNGKey(3)})
    assert y1.shape == (1, 1, 32, 64, 7)
    spread = float(jnp.abs(y1 - y2).mean())
    assert spread > 0, "different noise keys must give different members"
    assert bool(jnp.isfinite(y1).all())


def test_unet_forward(rng):
    conf = {"model": {
        "type": "unet", "image_height": 30, "image_width": 62, "levels": 2,
        "channels": 2, "surface_channels": 2, "frames": 1,
        "encoder_dims": [8, 16, 32],
    }}
    model = load_model(conf)
    x = jnp.asarray(rng.standard_normal((2, 1, 30, 62, 6)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == (2, 1, 30, 62, 6)
    assert bool(jnp.isfinite(y).all())


def test_solar_zenith_physics():
    from credit_tpu.physics.solar import cos_zenith, tisr_accumulated

    lat = np.linspace(90, -90, 19)
    lon = np.linspace(0, 360, 36, endpoint=False)
    # June solstice, 12 UTC: subsolar point near lat 23.4, lon ~0
    mu = cos_zenith(lat, lon, day_of_year=172, utc_hours=12.0)
    i, j = np.unravel_index(np.argmax(mu), mu.shape)
    assert abs(lat[i] - 23.4) < 11  # nearest grid row to the subsolar lat
    assert min(lon[j], 360 - lon[j]) < 21
    assert mu.max() > 0.99
    # polar night: south pole dark at June solstice
    assert mu[-1].max() == 0.0
    # accumulation positive, bounded by TSI * seconds
    t = tisr_accumulated(lat, lon, datetime.datetime(2020, 6, 21, 12), 6.0)
    assert t.min() >= 0 and t.max() <= 1450.0 * 6 * 3600


def test_regridders_constant_field_preserved():
    from credit_tpu.ops.regrid import make_regridder

    src_lat = np.linspace(90, -90, 19)
    src_lon = np.linspace(0, 360, 36, endpoint=False)
    dst_lat = np.linspace(88, -88, 12)
    dst_lon = np.linspace(0, 360, 24, endpoint=False)
    f = jnp.ones((19, 36))
    for method in ("bilinear", "nearest", "conservative"):
        r = make_regridder(method, src_lat, src_lon, dst_lat, dst_lon)
        out = np.asarray(r(f))
        assert out.shape == (12, 24)
        np.testing.assert_allclose(out, 1.0, rtol=1e-5, err_msg=method)


def test_conservative_regrid_conserves_mean(rng):
    from credit_tpu.grid import Grid
    from credit_tpu.ops.regrid import ConservativeRegridder

    src = Grid.regular(37, 72)
    dst = Grid.regular(19, 36)
    f = jnp.asarray(rng.standard_normal((37, 72)), jnp.float32)
    r = ConservativeRegridder(src.lat, src.lon, dst.lat, dst.lon)
    out = np.asarray(r(f))
    # area-weighted means agree
    ws = src.cell_area()
    wd = dst.cell_area()
    m_src = float((np.asarray(f) * ws).sum() / ws.sum())
    m_dst = float((out * wd).sum() / wd.sum())
    np.testing.assert_allclose(m_dst, m_src, atol=5e-3)


def test_bilinear_regrid_smooth_field_accuracy():
    from credit_tpu.ops.regrid import BilinearRegridder

    src_lat = np.linspace(90, -90, 91)
    src_lon = np.linspace(0, 360, 180, endpoint=False)
    dst_lat = np.linspace(80, -80, 33)
    dst_lon = np.linspace(0, 360, 64, endpoint=False)
    f = np.cos(np.deg2rad(src_lat))[:, None] * np.sin(np.deg2rad(src_lon))[None, :]
    want = np.cos(np.deg2rad(dst_lat))[:, None] * np.sin(np.deg2rad(dst_lon))[None, :]
    r = BilinearRegridder(src_lat, src_lon, dst_lat, dst_lon)
    np.testing.assert_allclose(np.asarray(r(jnp.asarray(f))), want, atol=2e-3)


def test_graph_model_forward(rng):
    conf = {"model": {
        "type": "graph", "image_height": 12, "image_width": 24, "levels": 2,
        "channels": 2, "surface_channels": 1, "frames": 1,
        "hidden_size": 32, "n_blocks": 2, "heads": 4, "knn": 4,
    }}
    model = load_model(conf)
    x = jnp.asarray(rng.standard_normal((2, 1, 12, 24, 5)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == (2, 1, 12, 24, 5)
    assert bool(jnp.isfinite(y).all())


def test_segment_softmax_normalizes():
    from credit_tpu.models.graph import segment_softmax

    logits = jnp.asarray(np.random.default_rng(0).standard_normal((6, 2)), jnp.float32)
    seg = jnp.asarray([0, 0, 1, 1, 1, 2])
    a = segment_softmax(logits, seg, 3)
    sums = np.asarray(jax.ops.segment_sum(a, seg, 3))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_knn_edges_symmetric_coverage():
    from credit_tpu.models.graph import knn_sphere_edges

    src, dst = knn_sphere_edges(np.linspace(90, -90, 8),
                                np.linspace(0, 360, 16, endpoint=False), k=4)
    n = 8 * 16
    assert src.shape == dst.shape
    assert set(np.unique(dst)) == set(range(n))  # every node receives
    assert (src != dst).all()
