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
