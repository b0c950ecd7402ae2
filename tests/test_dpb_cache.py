"""Loop-invariant position-bias caching (models.layers.WindowAttention /
models.swin.WindowAttentionV2 `dpb_cache` collection).

The DPB/CPB tables depend only on params and a static offset grid, so an
apply that fills the cache (mutable=["dpb_cache"]) and a later apply that
reads it back must reproduce the plain forward bit-for-bit; the rollout
engines rely on this to hoist the tiny-MLP chains out of the scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.models import load_model

from test_crossformer import TINY_CONF


@pytest.fixture(scope="module")
def tiny():
    from credit_tpu.models.spectral_utils import converge_spectral

    model = load_model(TINY_CONF)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, 1, 32, 64, model.base_input_channels)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = converge_spectral(variables)
    return model, variables, x


def test_fill_apply_matches_plain_forward(tiny):
    model, variables, x = tiny
    y_plain = model.apply(variables, x)
    y_fill, mut = model.apply(variables, x, mutable=["dpb_cache"])
    assert mut["dpb_cache"], "fill apply should materialize bias tables"
    np.testing.assert_array_equal(np.asarray(y_fill), np.asarray(y_plain))


def test_cached_apply_matches_plain_forward(tiny):
    model, variables, x = tiny
    y_plain = model.apply(variables, x)
    _, mut = model.apply(variables, x, mutable=["dpb_cache"])
    y_cached = model.apply({**variables, **mut}, x)
    np.testing.assert_array_equal(np.asarray(y_cached), np.asarray(y_plain))


def test_cache_not_created_at_init(tiny):
    model, variables, _ = tiny
    assert "dpb_cache" not in variables


def test_training_apply_ignores_cache_grads(tiny):
    """Gradients must flow through the DPB params when no cache is passed."""
    model, variables, x = tiny

    def loss(params):
        y = model.apply({**variables, "params": params}, x)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(variables["params"])

    def find_dpb(tree):
        for k, v in tree.items():
            if k == "dpb":
                return v
            if isinstance(v, dict):
                r = find_dpb(v)
                if r is not None:
                    return r
        return None

    dpb = find_dpb(g)
    assert dpb is not None
    total = sum(float(jnp.sum(jnp.abs(leaf)))
                for leaf in jax.tree_util.tree_leaves(dpb))
    assert total > 0.0


def test_scan_rollout_unchanged_by_cache_hoist(tiny):
    """make_scan_rollout (fill on step 1, cache for 2..N) must equal the
    naive per-step loop."""
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.rollout import make_scan_rollout

    model, variables, x = tiny
    conf = {
        "data": {"source": {"S": {"levels": [0, 1], "variables": {
            "prognostic": {"vars_3D": ["U", "V"], "vars_2D": ["SP", "T2"]},
            "static": {"vars_2D": ["lsm"]},
            "diagnostic": {"vars_2D": ["d0"]},
        }}}}
    }
    schema = ChannelSchema.from_config(conf)
    assert schema.n_input == model.base_input_channels

    run = make_scan_rollout(model, schema, n_steps=3, history_len=1)
    final_x, stats = jax.jit(run)(variables, x)
    assert stats.shape[0] == 3

    # naive loop
    xi = x
    ref_stats = []
    for _ in range(3):
        y = model.apply(variables, xi)
        ref_stats.append(np.asarray(jnp.mean(y, axis=(0, 1, 2, 3))))
        xi = schema.update_x(xi[:, -1:], y[:, -1:], None)
    np.testing.assert_allclose(np.asarray(stats), np.stack(ref_stats),
                               rtol=1e-5, atol=1e-5)


def test_swin_cpb_cache_parity():
    from credit_tpu.models.swin import SwinStageV2

    stage = SwinStageV2(dim=16, depth=2, num_heads=2, window_size=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 16)),
                    jnp.float32)
    variables = stage.init(jax.random.PRNGKey(0), x)
    y_plain = stage.apply(variables, x)
    y_fill, mut = stage.apply(variables, x, mutable=["dpb_cache"])
    assert mut["dpb_cache"]
    y_cached = stage.apply({**variables, **mut}, x)
    np.testing.assert_array_equal(np.asarray(y_fill), np.asarray(y_plain))
    np.testing.assert_array_equal(np.asarray(y_cached), np.asarray(y_plain))


def test_rollout_engine_cached_steps_match():
    """RolloutEngine: a step after the fill (cache active) must equal a
    fresh engine's same step computed without any cache."""
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models.spectral_utils import converge_spectral
    from credit_tpu.rollout import RolloutEngine

    model = load_model(TINY_CONF)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 1, 32, 64, model.base_input_channels)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = converge_spectral(variables)
    conf = {
        "data": {"source": {"S": {"levels": [0, 1], "variables": {
            "prognostic": {"vars_3D": ["U", "V"], "vars_2D": ["SP", "T2"]},
            "static": {"vars_2D": ["lsm"]},
            "diagnostic": {"vars_2D": ["d0"]},
        }}}}
    }
    schema = ChannelSchema.from_config(conf)

    eng = RolloutEngine(model, dict(variables), schema, fold_sn=True)
    y1, x1 = eng.step(x)          # fill step
    assert "dpb_cache" in eng.variables
    y2, _ = eng.step(x1)          # cached step

    eng2 = RolloutEngine(model, dict(variables), schema, fold_sn=True)
    eng2._dpb_pending = False     # force the uncached path throughout
    y1b, x1b = eng2.step(x)
    y2b, _ = eng2.step(x1b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2b),
                               rtol=1e-6, atol=1e-6)
