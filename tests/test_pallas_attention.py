"""Pallas fused window attention vs the XLA reference path (interpret mode
on CPU; the same kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.ops.pallas_attention import fused_window_attention
from credit_tpu.ops.window_attention import window_attention


@pytest.mark.parametrize("t,heads,dh", [(9, 2, 16), (16, 4, 8)])
def test_fused_matches_xla(rng, t, heads, dh):
    inner = heads * dh
    b, nwin = 2, 12
    q = jnp.asarray(rng.standard_normal((b, nwin, t, inner)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nwin, t, inner)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nwin, t, inner)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((t, t)), jnp.float32)
    ref = window_attention(q, k, v, bias, heads)
    out = fused_window_attention(q, k, v, bias, heads, block_windows=8,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_handles_nondivisible_blocks(rng):
    heads, dh, t = 2, 8, 4
    inner = heads * dh
    q = jnp.asarray(rng.standard_normal((1, 7, t, inner)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 7, t, inner)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 7, t, inner)), jnp.float32)
    bias = jnp.zeros((t, t), jnp.float32)
    ref = window_attention(q, k, v, bias, heads)
    out = fused_window_attention(q, k, v, bias, heads, block_windows=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grouped_flagship_shape_parity(rng, dtype):
    """Stage-0-like shape (T=100, dh=32) with the DEFAULT group size —
    the grouped block-diagonal form must match per-window attention."""
    heads, dh, t = 4, 32, 100
    inner = heads * dh
    b, nwin = 1, 18  # total = 72 problems, default g=7 -> pad path too
    q = jnp.asarray(rng.standard_normal((b, nwin, t, inner)), dtype)
    k = jnp.asarray(rng.standard_normal((b, nwin, t, inner)), dtype)
    v = jnp.asarray(rng.standard_normal((b, nwin, t, inner)), dtype)
    bias = jnp.asarray(rng.standard_normal((t, t)), jnp.float32)
    ref = window_attention(q, k, v, bias, heads)
    out = fused_window_attention(q, k, v, bias, heads, interpret=True)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_grouped_single_token_windows(rng):
    """T=1 (stage-3 long attention): softmax over one masked row must be
    exactly the identity on v."""
    heads, dh, t = 2, 16, 1
    inner = heads * dh
    q = jnp.asarray(rng.standard_normal((1, 5, t, inner)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 5, t, inner)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 5, t, inner)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((t, t)), jnp.float32)
    out = fused_window_attention(q, k, v, bias, heads, block_windows=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), rtol=1e-6,
                               atol=1e-6)
