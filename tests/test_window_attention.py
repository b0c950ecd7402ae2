"""Window partition/attention unit tests (reference rearrange semantics:
credit/models/wxformer/crossformer.py:348-351)."""

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.ops.window_attention import (
    relative_position_index,
    window_attention,
    window_partition,
    window_unpartition,
)


def test_short_partition_matches_einops_semantics(rng):
    b, h, w, c = 2, 6, 8, 3
    wsz = 2
    x = np.arange(b * h * w * c, dtype=np.float32).reshape(b, h, w, c)
    out = np.asarray(window_partition(jnp.asarray(x), wsz, "short"))
    # window (wi, wj), token (s1, s2) should be pixel (wi*wsz+s1, wj*wsz+s2)
    nw = w // wsz
    for wi in range(h // wsz):
        for wj in range(nw):
            for s1 in range(wsz):
                for s2 in range(wsz):
                    np.testing.assert_array_equal(
                        out[0, wi * nw + wj, s1 * wsz + s2],
                        x[0, wi * wsz + s1, wj * wsz + s2],
                    )


def test_long_partition_is_dilated(rng):
    b, h, w, c = 1, 6, 6, 1
    wsz = 2  # stride = 3
    x = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
    out = np.asarray(window_partition(jnp.asarray(x), wsz, "long"))
    # token (l1, l2) of window (hi, wi) is pixel (l1*3 + hi, l2*3 + wi)
    stride_h, stride_w = h // wsz, w // wsz
    for hi in range(stride_h):
        for wi in range(stride_w):
            for l1 in range(wsz):
                for l2 in range(wsz):
                    np.testing.assert_array_equal(
                        out[0, hi * stride_w + wi, l1 * wsz + l2],
                        x[0, l1 * stride_h + hi, l2 * stride_w + wi],
                    )


def test_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 8, 5)), dtype=jnp.float32)
    for kind in ("short", "long"):
        y = window_partition(x, 4, kind)
        back = window_unpartition(y, 4, 12, 8, kind)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    wsz = 3
    idx = relative_position_index(wsz)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < (2 * wsz - 1) ** 2
    assert idx[0, 0] == idx[4, 4]  # zero offset shares one index


def test_window_attention_matches_dense_reference(rng):
    b, nwin, t, heads, dh = 2, 3, 4, 2, 8
    inner = heads * dh
    q = rng.standard_normal((b, nwin, t, inner)).astype(np.float32)
    k = rng.standard_normal((b, nwin, t, inner)).astype(np.float32)
    v = rng.standard_normal((b, nwin, t, inner)).astype(np.float32)
    bias = rng.standard_normal((t, t)).astype(np.float32)
    out = np.asarray(window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), heads))
    # dense numpy reference
    qh = q.reshape(b, nwin, t, heads, dh)
    kh = k.reshape(b, nwin, t, heads, dh)
    vh = v.reshape(b, nwin, t, heads, dh)
    sim = np.einsum("bnihd,bnjhd->bnhij", qh * dh**-0.5, kh) + bias
    a = np.exp(sim - sim.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    ref = np.einsum("bnhij,bnjhd->bnihd", a, vh).reshape(b, nwin, t, inner)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_bf16_attention_close_to_f32(rng):
    """The all-bf16 score path (used by bf16 compute models) must stay
    within bf16 rounding of the f32 reference."""
    b, nwin, t, heads, dh = 1, 4, 9, 2, 8
    inner = heads * dh
    q = rng.standard_normal((b, nwin, t, inner)).astype(np.float32)
    k = rng.standard_normal((b, nwin, t, inner)).astype(np.float32)
    v = rng.standard_normal((b, nwin, t, inner)).astype(np.float32)
    bias = rng.standard_normal((t, t)).astype(np.float32)
    f32 = np.asarray(window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        heads))
    bf = np.asarray(window_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias), heads)
    ).astype(np.float32)
    # attention outputs are O(1); bf16 relative precision ~2^-8
    np.testing.assert_allclose(bf, f32, rtol=0, atol=0.05)
    assert np.abs(bf - f32).mean() < 0.01


def test_vpu_tiny_t_matches_einsum_form(rng):
    """T<=32 dispatches to the VPU broadcast-multiply-reduce path (the
    measured 3-6x win for long/dilated attention at T=4..25); it must match
    the einsum formulation exactly."""
    import jax.numpy as jnp
    import numpy as np

    from credit_tpu.ops import window_attention as wa

    for t, heads, dh in [(4, 16, 32), (25, 8, 32)]:
        inner = heads * dh
        q = jnp.asarray(rng.standard_normal((1, 6, t, inner)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 6, t, inner)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 6, t, inner)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((t, t)), jnp.float32)
        assert t <= wa._VPU_MAX_T
        out = wa.window_attention(q, k, v, bias, heads)

        # einsum reference (the big-T formulation, inlined)
        qs = (q * dh ** -0.5).reshape(1, 6, t, heads, dh)
        ks = k.reshape(1, 6, t, heads, dh)
        vs = v.reshape(1, 6, t, heads, dh)
        sim = jnp.einsum("bnihd,bnjhd->bnhij", qs, ks) + bias
        ref = jnp.einsum("bnhij,bnjhd->bnihd",
                         jax.nn.softmax(sim, -1), vs).reshape(1, 6, t, inner)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
