"""HF checkpoint interchange dry-run: the vendored wxformer_6h / fuxi_6h
key/shape manifests (extracted from the reference model classes at the
published configs — reference README.md:62-66, config/gen_1/arXiv_2024/
*_6h_single_step.yml) convert into this framework's models end to end, so
the real HuggingFace download is a mechanical no-op when network exists."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.manifests import (MANIFEST_MODEL_CONF, available,
                                  load_manifest, synthesize_state_dict)


def test_manifests_present_and_sized():
    names = available()
    assert "wxformer_6h" in names and "fuxi_6h" in names
    wx = load_manifest("wxformer_6h")
    assert len(wx) == 1244
    n = sum(int(np.prod(s)) for s in wx.values())
    assert abs(n / 1e6 - 124.79) < 0.1  # the published 124M-param model
    fx = load_manifest("fuxi_6h")
    assert len(fx) == 504
    # spectral-norm checkpoints carry weight_orig/u/v triples
    assert any(k.endswith("weight_orig") for k in wx)
    assert any(k.endswith("weight_u") for k in wx)


@pytest.mark.parametrize("name", ["wxformer_6h", "fuxi_6h"])
def test_manifest_converts_into_model(name):
    """Synthesized manifest-shaped state_dict -> strict conversion -> the
    flax model applies it (tiny forward skipped at full 640x1280 scale;
    structural load is the gate)."""
    from credit_tpu.convert_torch import convert_crossformer, convert_fuxi
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model

    mconf = MANIFEST_MODEL_CONF[name]
    conf = {"model": dict(mconf), "data": {"source": {"ERA5": {
        "levels": list(range(mconf["levels"])),
        "variables": {
            "prognostic": {"vars_3D": ["U", "V", "T", "Q"],
                           "vars_2D": [f"s{i}" for i in
                                       range(mconf["surface_channels"])]},
            "dynamic_forcing": {"vars_2D": ["tsi"]},
            "static": {"vars_2D": ["z_norm", "lsm"]},
        }}}}}
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    assert schema.n_input == model.base_input_channels
    x = jnp.zeros((1, mconf["frames"], mconf["image_height"],
                   mconf["image_width"], schema.n_input), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    sd = synthesize_state_dict(name)
    convert = convert_fuxi if name == "fuxi_6h" else convert_crossformer
    out = convert(sd, variables, strict=True)  # raises on any unmapped key

    # every param leaf was actually written (zero template -> nonzero)
    leaves = jax.tree_util.tree_leaves(out["params"])
    written = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert written / len(leaves) > 0.99, (written, len(leaves))

    # spot-check one conv kernel transpose: torch OIHW -> flax HWIO
    import torch

    k = next(k for k, v in sd.items()
             if k.endswith("weight_orig") and v.ndim == 4)
    t = sd[k]
    flat = jax.tree_util.tree_flatten_with_path(out["params"])[0]
    match = [l for p, l in flat
             if l.ndim == 4 and l.shape == tuple(t.shape[i] for i in
                                                 (2, 3, 1, 0))]
    assert match, f"no HWIO counterpart for {k} {tuple(t.shape)}"
