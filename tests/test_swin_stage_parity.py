"""SwinV2 stage checkpoint parity: vendored torch oracle vs flax SwinStageV2.

Closes VERDICT round-1 item 6's gap: the FuXi swin core (the bulk of FuXi's
parameters) now has a real (non-identity) torch oracle in the timm
parameterization (tests/torch_swin_v2.py). Reference:
credit/models/fuxi.py:204-305 (UTransformer wraps SwinTransformerV2Stage)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from credit_tpu.models.swin import SwinStageV2
from tests.torch_swin_v2 import SwinTransformerV2Stage

DIM, DEPTH, HEADS, WS = 32, 2, 4, 4
H, W = 8, 16


def _np(t):
    return t.detach().cpu().numpy()


def convert_stage(stage: SwinTransformerV2Stage) -> dict:
    """timm-named torch state -> flax SwinStageV2 params (same mapping as
    credit_tpu/convert_torch.py convert_fuxi's swin section)."""
    params = {}
    for i, blk in enumerate(stage.blocks):
        a = blk.attn
        params[f"block{i}"] = {
            "attn": {
                "qkv": {"kernel": _np(a.qkv.weight).T},
                "q_bias": _np(a.q_bias),
                "v_bias": _np(a.v_bias),
                "logit_scale": _np(a.logit_scale),
                "cpb_fc1": {"kernel": _np(a.cpb_mlp[0].weight).T,
                            "bias": _np(a.cpb_mlp[0].bias)},
                "cpb_fc2": {"kernel": _np(a.cpb_mlp[2].weight).T},
                "proj": {"kernel": _np(a.proj.weight).T,
                         "bias": _np(a.proj.bias)},
            },
            "norm1": {"scale": _np(blk.norm1.weight),
                      "bias": _np(blk.norm1.bias)},
            "norm2": {"scale": _np(blk.norm2.weight),
                      "bias": _np(blk.norm2.bias)},
            "mlp_fc1": {"kernel": _np(blk.mlp.fc1.weight).T,
                        "bias": _np(blk.mlp.fc1.bias)},
            "mlp_fc2": {"kernel": _np(blk.mlp.fc2.weight).T,
                        "bias": _np(blk.mlp.fc2.bias)},
        }
    return params


@pytest.mark.parametrize("seed", [0, 1])
def test_stage_parity(seed):
    torch.manual_seed(seed)
    stage = SwinTransformerV2Stage(DIM, DIM, (H, W), DEPTH, HEADS, WS).eval()
    # randomize beyond default init so biases/norms are exercised
    with torch.no_grad():
        for p in stage.parameters():
            p.add_(0.05 * torch.randn_like(p))

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, H, W, DIM)).astype(np.float32)
    with torch.no_grad():
        y_ref = _np(stage(torch.from_numpy(x)))

    model = SwinStageV2(DIM, DEPTH, HEADS, WS)
    params = convert_stage(stage)
    y = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_shifted_block_actually_shifts():
    """depth=2 exercises SW-MSA: ensure the mask path is active (window
    smaller than the grid) so the parity above covers shifted windows."""
    stage = SwinTransformerV2Stage(DIM, DIM, (H, W), 2, HEADS, WS)
    assert stage.blocks[1].shift_size == WS // 2
    assert stage.blocks[1].attn_mask is not None
