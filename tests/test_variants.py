"""Model-variant behavioral deltas (VERDICT round-1 item 8).

Reference: credit/models/camulator.py:22,375 (sharp-skip SN exclusion),
credit/models/swin_wrf.py:285, dscale_wrf.py:289,
credit/models/wxformer/crossformer_downscaling.py."""

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.models import load_model

BASE = dict(frames=1, output_frames=1, image_height=32, image_width=64,
            levels=2, channels=2, surface_channels=1, input_only_channels=0,
            output_only_channels=0, dim=[16, 32, 64, 128], depth=[1, 1, 1, 1],
            global_window_size=[2, 2, 2, 1], local_window_size=2,
            cross_embed_kernel_sizes=[[2, 4], [2, 2], [2, 2], [2, 2]],
            cross_embed_strides=[2, 2, 2, 2], use_spectral_norm=True,
            dim_head=8, interp=True)


def _init(conf_model, x_shape, **extra):
    model = load_model({"model": conf_model})
    x = jnp.zeros(x_shape, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "noise": jax.random.PRNGKey(1)}, x, **extra)
    return model, variables, x


def test_camulator_sharp_skip_no_spectral_state():
    model, variables, x = _init({"type": "camulator", **BASE},
                                (1, 1, 32, 64, 5))
    # sharp conv exists in params...
    assert "sharp" in variables["params"], sorted(variables["params"])
    # ...zero-init (identity residual at init)...
    np.testing.assert_allclose(
        np.asarray(variables["params"]["sharp"]["kernel"]), 0.0)
    # ...and carries NO spectral-norm u/v state (the SN exclusion)
    def names(tree, prefix=""):
        out = []
        for k, v in tree.items():
            out.append(prefix + k)
            if isinstance(v, dict):
                out += names(v, prefix + k + "/")
        return out
    assert not any("sharp" in n for n in names(variables.get("spectral", {})))
    # other convs DO have spectral state
    assert len(jax.tree_util.tree_leaves(variables.get("spectral", {}))) > 0


def test_camulator_matches_crossformer_at_init():
    """Zero-init sharp residual: camulator == crossformer at init given the
    same weights minus the sharp kernel."""
    m1, v1, x = _init({"type": "camulator", **BASE}, (1, 1, 32, 64, 5))
    m2 = load_model({"model": {"type": "crossformer", **BASE}})
    p2 = {k: v for k, v in v1["params"].items() if k != "sharp"}
    y1 = m1.apply(v1, x)
    y2 = m2.apply({"params": p2, "spectral": v1["spectral"]}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_downscaling_distinct_target_grid():
    conf = {"type": "crossformer_downscaling", **BASE,
            "out_image_height": 64, "out_image_width": 128}
    model, variables, x = _init(conf, (1, 1, 32, 64, 5))
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 64, 128, 5)  # TARGET grid, not the input grid


def test_wrf_regional_forward():
    pi = dict(image_height=16, image_width=24, patch_height=2, patch_width=2,
              levels=2, frames=1, frame_patch_size=1, channels=2,
              surface_channels=1, input_only_channels=1,
              output_only_channels=0, dim=32)
    po = dict(pi, channels=1, input_only_channels=0)
    conf = {"type": "wrf", "param_interior": pi, "param_outside": po,
            "time_encode_dim": 4, "depth": 2, "num_heads": 4,
            "window_size": 4, "num_groups": 8}
    model = load_model({"model": conf})
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (2, 1, 16, 24, 6))   # 2*2+1+1 interior channels
    xo = jax.random.normal(k, (2, 1, 16, 24, 3))  # 1*2+1 outside channels
    xe = jnp.ones((2, 4))  # nonzero: FiLM alpha/beta are Dense(xe) with
    # zero-init bias, so a zero time-encode would null the outside branch
    variables = model.init(jax.random.PRNGKey(0), x, xo, xe)
    y = model.apply(variables, x, xo, xe)
    assert y.shape == (2, 1, 16, 24, 5)     # interior target channels
    # outside branch + FiLM params exist
    assert "cube_embedding_outside" in variables["params"]
    assert "film" in variables["params"]
    # boundary state changes the prediction (FiLM + sum injection)
    y2 = model.apply(variables, x, xo + 1.0, xe)
    assert not np.allclose(np.asarray(y), np.asarray(y2))
    # works without boundary inputs too (standard harness compatibility)
    v1 = model.init(jax.random.PRNGKey(0), x)
    y3 = model.apply(v1, x)
    assert y3.shape == (2, 1, 16, 24, 5)


def test_dscale_downscales_channels_and_grid():
    conf = {"type": "dscale", "image_height": 16, "image_width": 24,
            "out_image_height": 32, "out_image_width": 48,
            "patch_height": 2, "patch_width": 2,
            "total_input_channels": 7, "total_target_channels": 11,
            "time_encode_dim": 4, "frames": 1, "frame_patch_size": 1,
            "dim": 32, "depth": 2, "num_heads": 4, "window_size": 4,
            "num_groups": 8}
    model = load_model({"model": conf})
    x = jnp.zeros((1, 1, 16, 24, 7))
    xe = jnp.zeros((1, 4))
    variables = model.init(jax.random.PRNGKey(0), x, xe)
    y = model.apply(variables, x, xe)
    assert y.shape == (1, 1, 32, 48, 11)    # fine grid, target channels
