"""CrossFormer model tests: shapes, finiteness, spectral-norm state, jit
(reference: tests/test_crossformer.py builds a tiny model and asserts output
shape/finite values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.models import load_model

TINY_CONF = {
    "model": {
        "type": "crossformer",
        "frames": 1,
        "image_height": 32,
        "image_width": 64,
        "levels": 2,
        "channels": 2,
        "surface_channels": 2,
        "input_only_channels": 1,
        "output_only_channels": 1,
        "patch_width": 1,
        "patch_height": 1,
        "dim": [16, 32, 64, 128],
        "depth": [1, 1, 1, 1],
        "dim_head": 16,
        "global_window_size": [2, 2, 1, 1],
        "local_window_size": 2,
        "cross_embed_kernel_sizes": [[4, 8], [2, 4], [2, 4], [2, 4]],
        "cross_embed_strides": [2, 2, 2, 2],
        "interp": True,
        "use_spectral_norm": True,
        "padding_conf": {"activate": True, "mode": "earth", "pad_lat": [16, 16], "pad_lon": [0, 0]},
    }
}


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    from credit_tpu.models.spectral_utils import converge_spectral

    model = load_model(TINY_CONF)
    c_in = model.base_input_channels  # 2*2+2+1 = 7
    x = jnp.zeros((1, 1, 32, 64, c_in), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = converge_spectral(variables)
    return model, variables


def test_forward_shape_and_finite(tiny_model_and_vars, rng):
    model, variables = tiny_model_and_vars
    c_in = model.base_input_channels
    c_out = model.base_output_channels  # 2*2+2+1 = 7
    x = jnp.asarray(rng.standard_normal((2, 1, 32, 64, c_in)), jnp.float32)
    y = model.apply(variables, x)
    assert y.shape == (2, 1, 32, 64, c_out)
    assert bool(jnp.isfinite(y).all())


def test_spectral_collection_exists(tiny_model_and_vars):
    _, variables = tiny_model_and_vars
    assert "spectral" in variables
    leaves = jax.tree_util.tree_leaves(variables["spectral"])
    assert leaves, "spectral norm state should be non-empty"
    for u in leaves:
        np.testing.assert_allclose(float(jnp.linalg.norm(u)), 1.0, rtol=1e-5)


def test_train_mode_updates_spectral_state(tiny_model_and_vars, rng):
    model, variables = tiny_model_and_vars
    c_in = model.base_input_channels
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 64, c_in)), jnp.float32)
    y, mutated = model.apply(variables, x, train=True, mutable=["spectral"])
    before = jax.tree_util.tree_leaves(variables["spectral"])
    after = jax.tree_util.tree_leaves(mutated["spectral"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "power iteration should move u/v"


def test_jit_forward(tiny_model_and_vars, rng):
    model, variables = tiny_model_and_vars
    c_in = model.base_input_channels
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 64, c_in)), jnp.float32)
    fwd = jax.jit(lambda v, xx: model.apply(v, xx))
    y1 = fwd(variables, x)
    y2 = model.apply(variables, x)
    # jit changes fusion/reassociation; allow small fp32 drift
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-3, atol=1e-3)


def test_grad_flows(tiny_model_and_vars, rng):
    model, variables = tiny_model_and_vars
    c_in = model.base_input_channels
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 64, c_in)), jnp.float32)

    def loss_fn(params):
        y = model.apply({"params": params, "spectral": variables["spectral"]}, x)
        return jnp.mean(y**2)

    g = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
