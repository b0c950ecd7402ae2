"""Parity tests for the MXU fast paths in ops/conv.py.

Both rewrites (space-to-depth for stride-2 even-kernel convs; phase
conv + depth-to-space for stride-2 transposes) must be bit-faithful to the
generic lax lowering in fp32, which itself is torch-parity-tested through
the checkpoint-conversion suites (tests/test_torch_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.ops import conv as conv_ops


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("k,pad", [(8, 3), (16, 7), (32, 15), (8, 0)])
def test_conv_s2d_matches_direct(k, pad):
    x = _rand(0, (2, 26, 34, 5))
    w = _rand(1, (k, k, 5, 7))
    b = _rand(2, (7,))
    fast = conv_ops.conv2d(x, w, b, stride=2, padding=pad)
    # bypass the dispatch: generic path
    import jax.lax as lax

    ref = lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    assert fast.shape == ref.shape
    # fp32 accumulation order differs between the lowerings; k*k*cin-term
    # sums carry ~1e-4 absolute noise
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("k,pad", [(2, 0), (4, 1), (6, 2)])
def test_conv_transpose_d2s_matches_dilated(k, pad):
    x = _rand(3, (2, 9, 13, 6))
    w = _rand(4, (k, k, 6, 5))
    b = _rand(5, (5,))
    fast = conv_ops._conv_transpose2d_d2s(x, w, b, (pad, pad), None)
    import jax.lax as lax

    ref = lax.conv_general_dilated(
        x, jnp.flip(w, axis=(0, 1)), window_strides=(1, 1),
        padding=((k - 1 - pad,) * 2, (k - 1 - pad,) * 2),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    assert fast.shape == ref.shape == (2, 18, 26, 5)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_transpose_dispatches_fast_path():
    # public entry must produce the same values as the explicit rewrite
    x = _rand(6, (1, 7, 8, 3))
    w = _rand(7, (4, 4, 3, 4))
    out = conv_ops.conv_transpose2d(x, w, None, stride=2, padding=1)
    fast = conv_ops._conv_transpose2d_d2s(x, w, None, (1, 1), None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fast), rtol=0, atol=0)


def test_conv_transpose_torch_oracle():
    torch = pytest.importorskip("torch")
    x = _rand(8, (2, 6, 9, 4))
    for k, p in [(2, 0), (4, 1), (3, 0)]:  # last: generic (non-d2s) path
        w = _rand(k, (k, k, 4, 3))
        b = _rand(10 + k, (3,))
        ours = conv_ops.conv_transpose2d(x, w, b, stride=2, padding=p)
        with torch.no_grad():
            m = torch.nn.ConvTranspose2d(4, 3, k, stride=2, padding=p)
            # torch kernel layout (cin, cout, kh, kw)
            m.weight.copy_(torch.from_numpy(
                np.asarray(w).transpose(2, 3, 0, 1)))
            m.bias.copy_(torch.from_numpy(np.asarray(b)))
            ref = m(torch.from_numpy(
                np.asarray(x).transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref,
            rtol=1e-4, atol=1e-4)


def test_transpose_grad_flows_through_fast_path():
    x = _rand(11, (1, 5, 5, 2))
    w = _rand(12, (4, 4, 2, 3))

    def loss(w):
        return jnp.sum(conv_ops.conv_transpose2d(x, w, None, 2, 1) ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_cross_embed_merged_matches_per_scale():
    """The fused multi-scale embed conv must equal running each scale conv
    separately and concatenating (the pre-merge formulation)."""
    from credit_tpu.models.layers import CrossEmbedLayer
    from credit_tpu.ops import conv as conv_ops

    x = _rand(20, (1, 16, 20, 6))
    layer = CrossEmbedLayer(dim_out=16, kernel_sizes=(2, 4, 8), stride=2,
                            use_sn=False)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    # manual per-scale path from the same params
    p = variables["params"]
    dim_scales = [8, 4, 4]
    outs = []
    for i, k in enumerate((2, 4, 8)):
        kern = p[f"conv{i}"]["kernel"]
        bias = p[f"conv{i}"]["bias"]
        outs.append(conv_ops.conv2d(x, kern, bias, stride=2,
                                    padding=(k - 2) // 2))
    ref = jnp.concatenate(outs, axis=-1)
    assert out.shape == ref.shape == (1, 8, 10, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_cross_embed_quadrant_decomposition_matches_per_scale():
    """The quadrant-decomposed largest scale (kmax split into kb x kb blocks
    + shifted sums) must equal the per-scale convs exactly."""
    from credit_tpu.models.layers import CrossEmbedLayer
    from credit_tpu.ops import conv as conv_ops

    x = _rand(22, (2, 16, 20, 6))
    ks = (4, 8, 16)  # kb=8, kmax=16 -> 4 quadrants, offsets {0, 4}
    layer = CrossEmbedLayer(dim_out=16, kernel_sizes=ks, stride=2,
                            use_sn=False)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    p = variables["params"]
    outs = []
    for i, k in enumerate(ks):
        kern = p[f"conv{i}"]["kernel"]
        bias = p[f"conv{i}"]["bias"]
        outs.append(conv_ops.conv2d(x, kern, bias, stride=2,
                                    padding=(k - 2) // 2))
    ref = jnp.concatenate(outs, axis=-1)
    assert out.shape == ref.shape == (2, 8, 10, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_cross_embed_merged_spectral_state():
    """SN state exists per scale conv and updates in train mode even on the
    fused path (param/state tree identical to the per-scale formulation)."""
    from credit_tpu.models.layers import CrossEmbedLayer

    x = _rand(21, (1, 8, 12, 4))
    layer = CrossEmbedLayer(dim_out=8, kernel_sizes=(2, 4), stride=2,
                            use_sn=True)
    variables = layer.init(jax.random.PRNGKey(0), x)
    assert set(variables["spectral"].keys()) == {"conv0", "conv1"}
    out, updates = layer.apply(variables, x, True,
                               mutable=["spectral"])
    assert np.isfinite(np.asarray(out)).all()
    before = variables["spectral"]["conv0"]["u"]
    after = updates["spectral"]["conv0"]["u"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_s2d_conv_odd_dims_pallas_parity():
    """Odd padded dims (every 1-degree stage) route through s2d in pallas
    mode via the zero-extend+slice trick — exact vs the XLA stride-2 conv.
    Without this the 1-degree graph kept XLA stride-2 convs next to the
    fused FF and re-triggered the slow-emitter tax (docs/PERF.md)."""
    import numpy as np

    from credit_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(0)
    for (h, w, cin, k, ph) in [(241, 384, 16, 16, 0), (61, 97, 24, 4, 1),
                               (31, 49, 16, 2, 0), (60, 96, 16, 4, 1)]:
        x = jnp.asarray(rng.standard_normal((1, h, w, cin)) * .3, jnp.float32)
        kk = jnp.asarray(rng.standard_normal((k, k, cin, 8)) * .1, jnp.float32)
        ref = conv_ops.conv2d(x, kk, None, 2, ph)
        with conv_ops.pallas_convs(True):
            got = conv_ops.conv2d(x, kk, None, 2, ph)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_strided_im2col_odd_kernel_parity():
    """3x3 stride-2 (FuXi DownBlock) routes through the strided im2col GEMM
    in pallas mode — exact vs the XLA conv."""
    import numpy as np

    from credit_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(1)
    for (h, w, cin) in [(33, 49, 24), (32, 48, 16)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)) * .3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, 8)) * .1, jnp.float32)
        ref = conv_ops.conv2d(x, k, None, 2, 1)
        with conv_ops.pallas_convs(True):
            got = conv_ops.conv2d(x, k, None, 2, 1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_patch_conv3d_gemm_parity():
    """CubeEmbedding's Conv3d (stride == kernel) as one GEMM in pallas
    mode — exact vs lax.conv, incl. torch's truncation of non-divisible
    dims."""
    import numpy as np

    from credit_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(2)
    for (d, h, w) in [(2, 16, 24), (2, 17, 25)]:  # divisible + truncating
        x = jnp.asarray(rng.standard_normal((1, d, h, w, 6)) * .3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 4, 4, 6, 8)) * .1, jnp.float32)
        ref = conv_ops.conv3d(x, k, None, stride=(2, 4, 4), padding=0)
        with conv_ops.pallas_convs(True):
            got = conv_ops.conv3d(x, k, None, stride=(2, 4, 4), padding=0)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
