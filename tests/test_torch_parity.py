"""Numerical parity vs the reference PyTorch implementation (run in place as
an oracle — BASELINE.json north star: converted checkpoints must reproduce
reference outputs allclose)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from credit_tpu.convert_torch import convert_crossformer
from credit_tpu.models import load_model
from tests.reference_oracle import TINY_KW, build_reference_crossformer


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    ref, kw = build_reference_crossformer(use_spectral_norm=True)
    conf = {"model": {"type": "crossformer", **{
        k: (list(v) if isinstance(v, tuple) else v) for k, v in kw.items()}}}
    mine = load_model(conf)
    x = jnp.zeros((1, 1, 32, 64, mine.base_input_channels), jnp.float32)
    variables = jax.jit(mine.init)(jax.random.PRNGKey(0), x)
    variables = convert_crossformer(ref.state_dict(), variables, strict=True)
    return ref, mine, variables


def _run_both(ref, mine, variables, x_np):
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x_np)).numpy()  # (B, C, T, H, W)
    x_mine = jnp.asarray(np.transpose(x_np, (0, 2, 3, 4, 1)))  # (B,T,H,W,C)
    y_mine = np.asarray(mine.apply(variables, x_mine))
    y_mine_t = np.transpose(y_mine, (0, 4, 1, 2, 3))  # back to (B,C,T,H,W)
    return y_ref, y_mine_t


def test_converted_forward_matches_reference(pair):
    ref, mine, variables = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 7, 1, 32, 64)).astype(np.float32)
    y_ref, y_mine = _run_both(ref, mine, variables, x)
    assert y_ref.shape == y_mine.shape
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_mine, y_ref, rtol=2e-4, atol=2e-4 * scale)


def test_parity_over_autoregressive_steps(pair):
    """Feed outputs back in (prognostic-only toy splice) for 3 steps and
    check drift stays at fp-noise level."""
    ref, mine, variables = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 7, 1, 32, 64)).astype(np.float32)
    errs = []
    for _ in range(3):
        y_ref, y_mine = _run_both(ref, mine, variables, x)
        scale = np.abs(y_ref).max()
        errs.append(np.abs(y_ref - y_mine).max() / scale)
        # splice: prognostic channels 0..4 -> next input's first 5 channels;
        # keep the remaining input-only channels from x
        x = np.concatenate([y_ref[:, :6], x[:, 6:]], axis=1).astype(np.float32)
    assert max(errs) < 1e-3, errs


def test_quadrant_embed_parity_vs_torch():
    """Stage-0 kernels (4, 8, 16) trigger the quadrant decomposition of the
    largest embed scale — converted outputs must still match the reference
    torch conv semantics exactly."""
    torch.manual_seed(11)
    ref, kw = build_reference_crossformer(
        use_spectral_norm=True,
        cross_embed_kernel_sizes=((4, 8, 16), (2, 4), (2, 4), (2, 4)))
    conf = {"model": {"type": "crossformer", **{
        k: (list(v) if isinstance(v, tuple) else v) for k, v in kw.items()}}}
    mine = load_model(conf)
    x0 = jnp.zeros((1, 1, 32, 64, mine.base_input_channels), jnp.float32)
    variables = jax.jit(mine.init)(jax.random.PRNGKey(0), x0)
    variables = convert_crossformer(ref.state_dict(), variables, strict=True)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 7, 1, 32, 64)).astype(np.float32)
    y_ref, y_mine = _run_both(ref, mine, variables, x)
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_mine, y_ref, rtol=2e-4, atol=2e-4 * scale)


def test_convert_is_strict_about_unknown_keys(pair):
    ref, mine, variables = pair
    sd = dict(ref.state_dict())
    sd["layers.9.9.bogus.weight"] = torch.zeros(3)
    with pytest.raises(KeyError):
        convert_crossformer(sd, variables, strict=True)
