"""Fused FF Pallas kernel (ops/pallas_ff.py): interpret-mode value parity
vs the XLA composition, gradient parity through the custom VJP, and the
shape-gating predicate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.ops import pallas_ff


def _inputs(m=480, c=128, mult=4, dtype=jnp.float32, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 7)
    h = c * mult
    return (
        (jax.random.normal(ks[0], (m, c)) * 0.3).astype(dtype),
        jax.random.normal(ks[1], (c,)) * 0.1 + 1.0,
        jax.random.normal(ks[2], (c,)) * 0.1,
        (jax.random.normal(ks[3], (c, h)) * 0.05).astype(dtype),
        jax.random.normal(ks[4], (h,)) * 0.02,
        (jax.random.normal(ks[5], (h, c)) * 0.05).astype(dtype),
        jax.random.normal(ks[6], (c,)) * 0.02,
    )


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 0.05)])
def test_interpret_parity(dtype, tol):
    args = _inputs(dtype=dtype)
    out = pallas_ff.fused_ff(*args, interpret=True)
    ref = pallas_ff._xla_ff(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_vjp_matches_xla_composition():
    # off-TPU the primal auto-selects interpret mode (interpret=None)
    args = _inputs(m=64, c=128)

    def loss_fused(*a):
        return jnp.sum(pallas_ff.fused_ff_diff(*a) ** 2)

    def loss_ref(*a):
        return jnp.sum(pallas_ff._xla_ff(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 3))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ff_fits_gating():
    assert pallas_ff.ff_fits(288000, 128, 512)      # flagship stage-0
    assert pallas_ff.ff_fits(18000, 512, 2048)      # stage-2
    assert pallas_ff.ff_fits(4500, 1024, 4096)      # stage-3 (masked tail)
    assert pallas_ff.ff_fits(997, 128, 512)         # prime M: masked tail
    assert not pallas_ff.ff_fits(288000, 120, 512)  # C not lane-aligned
    assert not pallas_ff.ff_fits(4096, 8192, 32768)  # weights alone > VMEM


def test_non_divisible_m_masked_tail():
    """M that no aligned tile divides: the tail block is masked — values in
    the valid region must still match."""
    args = _inputs(m=500, c=128)
    out = pallas_ff.fused_ff(*args, interpret=True)
    ref = pallas_ff._xla_ff(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_4d_block_parity():
    """4-D (B,H,W,C) form blocks over (batch, lat rows) — same values as the
    flattened 2-D form, including a non-divisible H (masked tail)."""
    for hh in (12, 10):  # 12 divides evenly by most tiles; 10 forces a tail
        args = _inputs(m=2 * hh * 16, c=128)
        x4 = args[0].reshape(2, hh, 16, 128)
        out4 = pallas_ff.fused_ff(x4, *args[1:], interpret=True)
        ref = pallas_ff._xla_ff(*args)
        np.testing.assert_allclose(np.asarray(out4).reshape(-1, 128),
                                   np.asarray(ref), atol=1e-5)


def test_post_norm_interpret_parity():
    """SwinV2 post-norm variant: x + LN(fc2(gelu(fc1(x))))."""
    args = _inputs(m=480, c=128)
    out = pallas_ff.fused_ff(*args, interpret=True, post_norm=True)
    ref = pallas_ff._xla_ff(*args, post_norm=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_swin_block_fused_matches_unfused():
    """SwinBlockV2's fused MLP (mlp_fuse='force') matches the XLA
    composition in interpret mode."""
    from credit_tpu.models.swin import SwinBlockV2

    blk = SwinBlockV2(dim=128, num_heads=4, window_size=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 128)) * 0.3
    v = blk.init(jax.random.PRNGKey(1), x)
    y_ref = blk.apply(v, x)
    y_fused = SwinBlockV2(dim=128, num_heads=4, window_size=4,
                          mlp_fuse="force").apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_feedforward_fused_matches_unfused():
    """fuse='force' routes through the Pallas kernel (interpret mode on CPU)
    and must match the XLA composition, spectral norm included."""
    from credit_tpu.models.layers import FeedForward

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 128)) * 0.3
    ff_x = FeedForward(dim=128, use_sn=True, fuse="never")
    ff_p = FeedForward(dim=128, use_sn=True, fuse="force")
    v = ff_x.init(jax.random.PRNGKey(1), x)
    y_ref = ff_x.apply(v, x)
    y_fused = ff_p.apply(v, x)
    # fresh-init SN leaves activations O(1e3) (converge_spectral not run in
    # this unit test), which amplifies the kernel's 1.5e-7-abs erf
    # approximation; at converged O(1) activations the delta is ~1e-7
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-3, atol=1e-3)


def test_feedforward_module_unfused_cpu_includes_residual():
    """FeedForward now returns x + mlp(x); on CPU the fused path must not
    trigger (on_tpu() False) and the residual must be included."""
    from credit_tpu.models.layers import FeedForward

    ff = FeedForward(dim=32, use_sn=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 32))
    v = ff.init(jax.random.PRNGKey(1), x)
    y = ff.apply(v, x)
    assert y.shape == x.shape
    # zero-ing fc2 kernel makes mlp output == bias only; with bias also zero
    # the block must reduce to the identity (residual present)
    import flax

    flat = flax.traverse_util.flatten_dict(v["params"])
    flat = {k: jnp.zeros_like(val) if k[0] == "fc2" else val
            for k, val in flat.items()}
    v0 = {"params": flax.traverse_util.unflatten_dict(flat)}
    np.testing.assert_allclose(np.asarray(ff.apply(v0, x)), np.asarray(x),
                               atol=1e-6)


def test_fused_ff_gspmd_sharded_parity():
    """The custom_partitioning-wrapped FF runs per shard under a dp x domain
    mesh (batch + latitude sharded) and matches the XLA composition — the
    gate that let fuse_ok_auto stop requiring a single device."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from credit_tpu.ops import pallas_ff

    devs = jax.devices()
    if len(devs) < 4:
        import pytest

        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    mesh = Mesh(np.asarray(devs[:4]).reshape(2, 2), ("dp", "domain"))

    b_, h, w, c = 2, 8, 16, 128
    hid = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b_, h, w, c)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hid)) * 0.05, jnp.float32)
    b1 = jnp.zeros((hid,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, c)) * 0.05, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)

    ref = np.asarray(pallas_ff._xla_ff(x.reshape(-1, c), g, bb, w1, b1, w2, b2)
                     ).reshape(b_, h, w, c)

    xs = NamedSharding(mesh, P("dp", "domain"))
    rep = NamedSharding(mesh, P())
    with mesh:
        args = [jax.device_put(x, xs)] + [jax.device_put(v, rep)
                                          for v in (g, bb, w1, b1, w2, b2)]
        out = jax.jit(lambda *a: pallas_ff.fused_ff_gspmd(*a, False))(*args)
        # the result stays sharded like x (no gather around the kernel)
        assert out.sharding.spec == xs.spec, out.sharding
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_fused_ff_gspmd_sharded_weights_parity():
    """Round-4 advisor (medium): under the Shardy partitioner the sdy rule
    governs partitioning, and without need-replication on the c/j factors a
    channel-sharded activation or a sharded w1/w2 would LayerNorm/contract
    partial slices per device — silently wrong. Feed the kernel sharded
    weights and a channel-sharded x and require exact parity (the rule must
    force them whole)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from credit_tpu.ops import pallas_ff

    devs = jax.devices()
    if len(devs) < 4:
        import pytest

        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    mesh = Mesh(np.asarray(devs[:4]).reshape(2, 2), ("dp", "tensor"))

    b_, h, w, c = 2, 8, 16, 128
    hid = 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b_, h, w, c)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hid)) * 0.05, jnp.float32)
    b1 = jnp.zeros((hid,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, c)) * 0.05, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)

    ref = np.asarray(pallas_ff._xla_ff(x.reshape(-1, c), g, bb, w1, b1, w2,
                                       b2)).reshape(b_, h, w, c)

    with mesh:
        args = [
            jax.device_put(x, NamedSharding(mesh, P("dp", None, None,
                                                    "tensor"))),
            jax.device_put(g, NamedSharding(mesh, P("tensor"))),
            jax.device_put(bb, NamedSharding(mesh, P("tensor"))),
            # ZeRO/FSDP-style sharded weights: w1 split on c, w2 on j
            jax.device_put(w1, NamedSharding(mesh, P("tensor", None))),
            jax.device_put(b1, NamedSharding(mesh, P("tensor"))),
            jax.device_put(w2, NamedSharding(mesh, P("tensor", None))),
            jax.device_put(b2, NamedSharding(mesh, P("tensor"))),
        ]
        out = jax.jit(lambda *a: pallas_ff.fused_ff_gspmd(*a, False))(*args)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                                   atol=2e-5)


@pytest.mark.parametrize("post_norm", [False, True])
@pytest.mark.parametrize("form", ["2d", "4d"])
def test_fused_ff_bwd_kernel_matches_xla_vjp(post_norm, form):
    """The in-kernel backward (round 5 — the conv-emitter-free BACKWARDS
    lever) must match the gradient of the XLA composition for every input:
    dx, LN params, both GEMMs' weights and biases, pre- and post-norm."""
    import numpy as np

    from credit_tpu.ops import pallas_ff

    c, hid = 128, 256
    rng = np.random.default_rng(7)
    if form == "2d":
        x = jnp.asarray(rng.standard_normal((48, c)) * 0.4, jnp.float32)
    else:
        x = jnp.asarray(rng.standard_normal((2, 8, 16, c)) * 0.4,
                        jnp.float32)
    ct = jnp.asarray(rng.standard_normal(x.shape) * 0.3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hid)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((hid,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)

    def ref_fn(x_, g_, b_, w1_, b1_, w2_, b2_):
        x2 = x_.reshape(-1, c)
        return pallas_ff._xla_ff(x2, g_, b_, w1_, b1_, w2_, b2_,
                                 post_norm=post_norm).reshape(x_.shape)

    _, vjp = jax.vjp(ref_fn, x, g, b, w1, b1, w2, b2)
    refs = vjp(ct)

    outs = pallas_ff.fused_ff_bwd(x, ct, g, b, w1, b1, w2, b2,
                                  interpret=True, post_norm=post_norm)
    names = ["dx", "dg", "db", "dw1", "db1", "dw2", "db2"]
    for name, got, want in zip(names, outs, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_ff_diff_bwd_dispatch_fallback(monkeypatch):
    """Off-TPU the custom VJP falls back to the XLA recompute (exact) —
    and CREDIT_FF_BWD=xla forces it everywhere."""
    import numpy as np

    from credit_tpu.ops import pallas_ff

    c, hid = 128, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((32, c)) * 0.4, jnp.float32)
    g = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hid)) * 0.05, jnp.float32)
    b1 = jnp.zeros((hid,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, c)) * 0.05, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)

    def loss(fn):
        def inner(*a):
            return jnp.sum(fn(*a, False) ** 2)
        return inner

    monkeypatch.setenv("CREDIT_FF_BWD", "xla")
    ref = jax.grad(
        lambda *a: jnp.sum(pallas_ff._xla_ff(*a, post_norm=False) ** 2),
        argnums=(0, 3, 5))(x, g, b, w1, b1, w2, b2)
    got = jax.grad(loss(pallas_ff.fused_ff_diff),
                   argnums=(0, 3, 5))(x, g, b, w1, b1, w2, b2)
    for a, bb in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-5)
