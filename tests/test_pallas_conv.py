"""Blocked Pallas stride-1 VALID conv (ops/pallas_conv.py): op parity vs
lax.conv, custom-VJP gradient parity, and full-model equivalence with
model.pallas_conv enabled (the conv-emitter-free graph that lets ff_fusion
turn on — docs/PERF.md). Interpret mode on CPU; real Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.ops import conv as conv_ops
from credit_tpu.ops import pallas_conv as pc


def _xla_valid(p, k):
    return jax.lax.conv_general_dilated(
        p, k.astype(p.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(p.dtype)


@pytest.mark.parametrize("shape", [
    (1, 37, 53, 32, 24, 8, 8),   # flagship stage-0 embed shape family
    (2, 20, 31, 16, 40, 2, 2),   # later-stage fused embeds after s2d
    (1, 15, 17, 16, 8, 3, 3),    # decoder residual convs
    (1, 9, 9, 16, 16, 1, 1),     # 1x1 (GEMM path in conv2d; kernel here)
    (2, 12, 19, 48, 8, 4, 4),
    (1, 14, 21, 20, 8, 3, 3),    # cin not sublane-aligned: zero-pad path
])
def test_op_parity(shape):
    n, hp, wp, cin, cout, kh, kw = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, hp, wp, cin)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.1,
                    jnp.bfloat16)
    assert pc.supports(x.shape, k.shape, x.dtype)
    y = np.asarray(pc.conv2d_valid(x, k), np.float32)
    r = np.asarray(_xla_valid(x, k), np.float32)
    assert y.shape == r.shape
    err = np.abs(y - r).max() / (np.abs(r).max() + 1e-6)
    assert err < 2e-2, err  # bf16 accumulation-order noise


def test_grad_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 18, 21, 16)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    g1 = jax.grad(lambda x, k: jnp.sum(jnp.sin(pc.conv2d_valid(x, k))),
                  (0, 1))(x, k)
    g2 = jax.grad(lambda x, k: jnp.sum(jnp.sin(_xla_valid(x, k))),
                  (0, 1))(x, k)
    for a, b in zip(g1, g2):
        e = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert e < 1e-4 * (np.abs(np.asarray(b)).max() + 1e-9), e


def test_conv2d_mode_routes_and_matches():
    """conv2d under pallas_convs(): stride-2 even kernels go s2d->pallas,
    1x1 goes GEMM, output identical to the XLA path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, 36, 20)) * 0.3, jnp.float32)
    cases = [
        (jnp.asarray(rng.standard_normal((4, 4, 20, 24)) * 0.1, jnp.float32),
         2, 1),                                     # fused later-stage embed
        (jnp.asarray(rng.standard_normal((3, 3, 20, 24)) * 0.1, jnp.float32),
         1, 1),                                     # decoder residual conv
        (jnp.asarray(rng.standard_normal((1, 1, 20, 24)) * 0.1, jnp.float32),
         1, 0),                                     # 1x1 GEMM
    ]
    for k, s, p in cases:
        bias = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
        ref = conv_ops.conv2d(x, k, bias, stride=s, padding=p)
        with conv_ops.pallas_convs(True):
            out = conv_ops.conv2d(x, k, bias, stride=s, padding=p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_conv_transpose_mode_matches():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 12, 18, 16)) * 0.3, jnp.float32)
    for k_sz, pad in [(2, 0), (4, 1)]:  # the decoder's two transpose combos
        k = jnp.asarray(rng.standard_normal((k_sz, k_sz, 16, 8)) * 0.1,
                        jnp.float32)
        ref = conv_ops.conv_transpose2d(x, k, None, stride=2, padding=pad)
        with conv_ops.pallas_convs(True):
            out = conv_ops.conv_transpose2d(x, k, None, stride=2, padding=pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_model_pallas_conv_parity():
    """Full CrossFormer with pallas_conv='force' (+ ff_fusion force) matches
    the XLA composition — the production conv-emitter-free inference graph."""
    from credit_tpu.models import load_model
    from credit_tpu.models.spectral_utils import converge_spectral

    base = {"model": {
        "type": "crossformer", "image_height": 64, "image_width": 128,
        "frames": 1, "patch_height": 1, "patch_width": 1, "channels": 2,
        "levels": 3, "surface_channels": 2, "input_only_channels": 1,
        "output_only_channels": 0, "dim": [16, 32, 64, 128],
        "depth": [1, 1, 1, 1], "global_window_size": [4, 2, 2, 1],
        "local_window_size": 4,
        "cross_embed_kernel_sizes": [[4, 8], [2, 4], [2, 4], [2, 4]],
        "cross_embed_strides": [2, 2, 2, 2], "dim_head": 16,
        "use_spectral_norm": True,
    }}
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 1, 64, 128, 9)) * 0.5, jnp.float32)

    model = load_model(base)
    v = model.init(jax.random.PRNGKey(0), x)
    v = converge_spectral(v)
    ref = np.asarray(model.apply(v, x), np.float32)

    import copy
    conf2 = copy.deepcopy(base)
    conf2["model"]["pallas_conv"] = "force"
    conf2["model"]["ff_fusion"] = "force"
    model2 = load_model(conf2)
    out = np.asarray(model2.apply(v, x), np.float32)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert err < 5e-3, err  # pallas FF accumulates LN/GELU in f32


class TestConvEmitterFreeBackward:
    """Round 5: conv2d_valid's VJP no longer lowers to XLA conv ops (they
    paid the slow-emitter tax in pallas training graphs). gx runs the
    blocked Pallas conv on the padded cotangent; gk runs the Pallas
    weight-grad kernel (large kernels) or strided-slice GEMMs (small).
    All paths must match the XLA conv-grad reference exactly."""

    def _ref_grads(self, x, kernel, gy):
        kh, kw, cin, cout = kernel.shape
        k_flip = jnp.flip(kernel, axis=(0, 1)).swapaxes(2, 3)
        gx = jax.lax.conv_general_dilated(
            gy, k_flip, window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        gk = jax.lax.conv_general_dilated(
            x.transpose(3, 1, 2, 0), gy.transpose(1, 2, 0, 3),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return gx, gk.transpose(1, 2, 0, 3)

    @pytest.mark.parametrize("kh,kw,cin,cout,hp,wp", [
        (8, 8, 16, 24, 21, 19),   # large kernel -> wgrad pallas kernel
        (3, 3, 8, 16, 14, 18),    # small -> tap-loop
        (2, 2, 8, 8, 10, 12),
        (1, 1, 8, 8, 9, 11),
    ])
    def test_wgrad_kernel_and_taploop_match_reference(self, kh, kw, cin,
                                                      cout, hp, wp):
        from credit_tpu.ops import pallas_conv as pc

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, hp, wp, cin)) * 0.3,
                        jnp.float32)
        gy = jnp.asarray(
            rng.standard_normal((2, hp - kh + 1, wp - kw + 1, cout)) * 0.3,
            jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.1,
                             jnp.float32)
        _, gk_ref = self._ref_grads(x, kernel, gy)

        gk_kernel = pc.conv2d_wgrad(x, gy, kh, kw)
        np.testing.assert_allclose(np.asarray(gk_kernel),
                                   np.asarray(gk_ref), rtol=2e-4, atol=2e-4)
        gk_tap = pc._taploop_gk(x, gy, kh, kw)
        np.testing.assert_allclose(np.asarray(gk_tap), np.asarray(gk_ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("kh,kw", [(3, 3), (2, 2), (8, 8)])
    def test_taploop_gx_matches_reference(self, kh, kw):
        from credit_tpu.ops import pallas_conv as pc

        rng = np.random.default_rng(5)
        cin, cout, hp, wp = 8, 12, 17, 15
        x = jnp.asarray(rng.standard_normal((1, hp, wp, cin)) * 0.3,
                        jnp.float32)
        gy = jnp.asarray(
            rng.standard_normal((1, hp - kh + 1, wp - kw + 1, cout)) * 0.3,
            jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.1,
                             jnp.float32)
        gx_ref, _ = self._ref_grads(x, kernel, gy)
        gx = pc._taploop_gx(gy, kernel)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_conv2d_valid_vjp_end_to_end(self):
        """jax.grad through conv2d_valid (the new conv-free backward) vs
        jax.grad through lax.conv — both operands."""
        from credit_tpu.ops import pallas_conv as pc

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((1, 15, 13, 8)) * 0.3,
                        jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1,
                             jnp.float32)

        def loss_ours(x_, k_):
            return jnp.sum(pc.conv2d_valid(x_, k_) ** 2)

        def loss_ref(x_, k_):
            y = jax.lax.conv_general_dilated(
                x_, k_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y ** 2)

        gx, gk = jax.grad(loss_ours, argnums=(0, 1))(x, kernel)
        gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r),
                                   rtol=1e-4, atol=1e-4)


def test_conv_small_pad4_matches_im2col():
    """Padded-to-4x4 blocked-kernel form of small convs (the Mosaic
    small-kernel crash workaround candidate, CREDIT_SMALL_CONV=pad4):
    zero taps contribute nothing, output must be bitwise-equal math."""
    import numpy as np

    from credit_tpu.ops import pallas_conv as pc

    rng = np.random.default_rng(21)
    for kshape in ((2, 2, 8, 16), (3, 3, 8, 8), (1, 3, 8, 8)):
        x = jnp.asarray(rng.standard_normal((1, 14, 18, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal(kshape) * 0.1, jnp.float32)
        y = pc.conv_small_pad4(x, k)
        ref = pc.im2col_conv(x, k)
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_im2col_custom_vjp_matches_autodiff(monkeypatch):
    """im2col_conv's MANUAL VJP branch (im2col-of-cotangent gx + taploop
    gk; measured slower on TPU, kept for A/B via CREDIT_IM2COL_GRAD) must
    equal XLA autodiff of the same composition."""
    import numpy as np

    from credit_tpu.ops import pallas_conv as pc

    monkeypatch.setenv("CREDIT_IM2COL_GRAD", "manual")

    rng = np.random.default_rng(31)
    for kshape in ((2, 2, 8, 16), (3, 3, 8, 8)):
        x = jnp.asarray(rng.standard_normal((2, 12, 14, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal(kshape) * 0.1, jnp.float32)

        def loss_custom(a, b):
            return jnp.sum(pc.im2col_conv(a, b) ** 2)

        def loss_ref(a, b):
            return jnp.sum(pc.im2col_conv_strided(a, b, (1, 1)) ** 2)

        gx, gk = jax.grad(loss_custom, argnums=(0, 1))(x, k)
        rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                                   rtol=1e-4, atol=1e-4)
