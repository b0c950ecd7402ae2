"""SDL inference wrapper: noise-factor control + latent capture/replay
(reference: credit/models/wxformer/sdl_inference_wrapper.py:36-324)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.ensemble.sdl_wrapper import SDLInferenceWrapper
from credit_tpu.models import load_model

CONF = {"model": {
    "type": "crossformer-ensemble", "frames": 1, "output_frames": 1,
    "image_height": 32, "image_width": 64, "levels": 2, "channels": 2,
    "surface_channels": 1, "input_only_channels": 0,
    "output_only_channels": 0, "dim": [16, 32, 64, 128],
    "depth": [1, 1, 1, 1], "global_window_size": [2, 2, 2, 1],
    "local_window_size": 2, "dim_head": 8,
    "cross_embed_kernel_sizes": [[2, 4], [2, 2], [2, 2], [2, 2]],
    "cross_embed_strides": [2, 2, 2, 2], "use_spectral_norm": False,
    "interp": True, "noise_latent_dim": 16,
}}


@pytest.fixture(scope="module")
def wrapped():
    model = load_model(CONF)
    x = jnp.zeros((1, 1, 32, 64, 5), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)}, x)
    return SDLInferenceWrapper(model, variables), x


def test_noise_factor_control(wrapped):
    w, x = wrapped
    names = w.layer_names()
    assert set(names) >= {"noise_inject1", "noise_inject2", "noise_inject3"}
    w.set_noise_factors(0.5)
    assert all(abs(v - 0.5) < 1e-6 for v in w.get_noise_factors().values())
    w.set_decoder_noise_factors([0.1, 0.2, 0.3])
    f = w.get_noise_factors()
    assert abs(f["noise_inject2"] - 0.2) < 1e-6
    w.set_manual_factors(large_scale=1.0, medium_scale=0.5, fine_scale=0.25)
    f = w.get_noise_factors()
    assert abs(f["noise_inject1"] - 1.0) < 1e-6
    assert abs(f["noise_inject3"] - 0.25) < 1e-6
    w.reset_to_original()
    f = w.get_noise_factors()
    assert abs(f["noise_inject1"] - 0.275) < 1e-6  # decoder default


def test_noise_factor_changes_output(wrapped):
    w, x = wrapped
    w.reset_to_original()
    k = jax.random.PRNGKey(3)
    y1 = w.forward(x, key=k)
    w.set_noise_factors(2.0)
    y2 = w.forward(x, key=k)
    w.reset_to_original()
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_latent_capture_and_exact_replay(wrapped):
    w, x = wrapped
    w.reset_to_original()
    y1, lat = w.forward(x, key=jax.random.PRNGKey(7), capture=True)
    w.store_latents("storm_a", lat)
    assert w.list_stored_latents() == ["storm_a"]
    # replay reproduces EXACTLY
    y2 = w.forward(x, latents=w.get_stored_latents("storm_a"))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # a different key without replay differs
    y3 = w.forward(x, key=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_latent_interpolation_is_smooth(wrapped):
    w, x = wrapped
    w.reset_to_original()
    _, la = w.forward(x, key=jax.random.PRNGKey(10), capture=True)
    _, lb = w.forward(x, key=jax.random.PRNGKey(11), capture=True)
    w.store_latents("a", la)
    w.store_latents("b", lb)
    ya = np.asarray(w.forward(x, latents=la))
    lm = w.interpolate_latents("a", "b", 0.5)
    ym = np.asarray(w.forward(x, latents=lm))
    l0 = w.interpolate_latents("a", "b", 0.0)
    y0 = np.asarray(w.forward(x, latents=l0))
    np.testing.assert_allclose(y0, ya, atol=1e-6)  # t=0 == member a
    # midpoint lies between the endpoints (closer than the endpoints are
    # to each other)
    yb = np.asarray(w.forward(x, latents=lb))
    d_ab = np.abs(ya - yb).mean()
    assert np.abs(ym - ya).mean() < d_ab
    w.clear_stored_latents()
    assert w.list_stored_latents() == []
