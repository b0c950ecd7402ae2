"""Round-5 regression tests: flatten-vs-ZeRO config trap, the explicit-halo
production toggle, and the FF backward-kernel tiling rules.

VERDICT round-4 asks #7 (config validator for flatten_optimizer on a dp>1
mesh) and #8 (trainer.parallelism.halo config flip), plus the bwd-tile
divisor rule that protects the accumulating Pallas backward kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.config import validate


BASE_CONF = {
    "model": {"type": "debugger", "image_height": 8, "image_width": 16},
    "data": {"source": {"ERA5": {"variables": {
        "prognostic": {"vars_2D": ["T2M"]}}}}},
}


def test_flatten_optimizer_rejected_on_dp_mesh():
    """flatten_optimizer concatenates moments into one vector with no
    param axes for ZeRO to shard — on a dp>1 mesh the moments would
    silently replicate (2x param HBM per chip). The validator must reject
    the combination (round-4 VERDICT weak #6)."""
    conf = {**BASE_CONF, "trainer": {"flatten_optimizer": True,
                                     "parallelism": {"data": 2}}}
    with pytest.raises(ValueError, match="flatten_optimizer"):
        validate(conf)


@pytest.mark.parametrize("data", ["none", 1, None])
def test_flatten_optimizer_allowed_single_dp(data):
    conf = {**BASE_CONF, "trainer": {"flatten_optimizer": True,
                                     "parallelism": {"data": data}}}
    validate(conf)  # no error


def test_halo_mode_validated():
    conf = {**BASE_CONF, "trainer": {"parallelism": {"domain": 2,
                                                     "halo": "manual"}}}
    with pytest.raises(ValueError, match="halo"):
        validate(conf)
    conf["trainer"]["parallelism"]["halo"] = "explicit"
    validate(conf)


def test_explicit_halo_conv_matches_gspmd():
    """conv2d under explicit_halo(mesh) — shard_map + the parallel/halo.py
    ppermute ring — must match the plain (GSPMD / single-device) conv in
    values AND gradients (x and kernel), on the 8-virtual-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from credit_tpu.ops import conv as conv_ops
    from credit_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(dp=2, tp=1, domain=4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)

    def f(x, k):
        return conv_ops.conv2d(x, k, stride=1, padding=1)

    ref = jax.jit(f)(x, k)
    g_ref = jax.grad(lambda a, b: jnp.sum(f(a, b) ** 2), argnums=(0, 1))(
        x, k)

    def f_halo(x, k):
        with conv_ops.explicit_halo(mesh):
            return conv_ops.conv2d(x, k, stride=1, padding=1)

    xs = jax.device_put(x, NamedSharding(
        mesh, P("dp", "domain", None, None)))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    got = jax.jit(f_halo)(xs, ks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_got = jax.jit(jax.grad(lambda a, b: jnp.sum(f_halo(a, b) ** 2),
                             argnums=(0, 1)))(xs, ks)
    np.testing.assert_allclose(np.asarray(g_got[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-4)


def test_explicit_halo_ignores_non_stencil_convs():
    """Strided embeds / non-size-preserving convs must NOT take the halo
    path (their lat halo is not a (kh-1)/2 ring); they stay on GSPMD."""
    from credit_tpu.ops import conv as conv_ops
    from credit_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(dp=1, tp=1, domain=4)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 4, 4, 8)) * 0.1, jnp.float32)
    ref = conv_ops.conv2d(x, k, stride=2, padding=1)
    with conv_ops.explicit_halo(mesh):
        got = conv_ops.conv2d(x, k, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_trainer_halo_toggle_sets_context():
    """trainer.parallelism: {halo: explicit} wires the context factory;
    the default (gspmd) leaves it off."""
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import Trainer

    conf = {
        "model": {"type": "debugger", "image_height": 16, "image_width": 24,
                  "channels": 0, "surface_channels": 2, "levels": 0,
                  "input_only_channels": 0, "output_only_channels": 0},
        "data": {"source": {"ERA5": {"variables": {
            "prognostic": {"vars_2D": ["T2M", "SP"]}}}}},
        "trainer": {"train_batch_size": 2, "log_variable_metrics": False,
                    "parallelism": {"data": 2, "domain": 4,
                                    "halo": "explicit"}},
    }
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    tr = Trainer(conf, model, WeightedLoss(base="mse"),
                 WeightedLoss(base="mse"), schema, dataset=None)
    assert tr._halo_ctx is not None
    conf2 = {**conf, "trainer": {**conf["trainer"],
                                 "parallelism": {"data": 2, "domain": 4}}}
    tr2 = Trainer(conf2, model, WeightedLoss(base="mse"),
                  WeightedLoss(base="mse"), schema, dataset=None)
    assert tr2._halo_ctx is None


def test_ff_bwd_flattens_oversize_rows(monkeypatch):
    """4-D shapes whose full-width row tile busts VMEM (FuXi 320-wide rows
    at c=1024/h=4096 on the v5e) must flatten to the 2-D row-tiled kernel
    — exact, verified against the XLA VJP."""
    from credit_tpu.ops import pallas_ff

    # shrink the budget so the small test shape reproduces the FuXi case:
    # row tiles (w=160 wide) fail, flat 2-D tiles fit
    monkeypatch.setattr(pallas_ff, "_VMEM_BUDGET", 600_000)
    c, hid = 128, 256
    assert pallas_ff._pick_rows_bwd(4, 160, c, hid, 4) is None
    assert pallas_ff._pick_tile_bwd(640, c, hid, 4) is not None
    assert pallas_ff.bwd_fits_shape((1, 4, 160, c), hid, itemsize=4)

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 4, 160, c)) * 0.4, jnp.float32)
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
                                 post_norm=False).reshape(x_.shape)

    _, vjp = jax.vjp(ref_fn, x, g, b, w1, b1, w2, b2)
    refs = vjp(ct)
    outs = pallas_ff.fused_ff_bwd(x, ct, g, b, w1, b1, w2, b2,
                                  interpret=True)
    for name, got, want in zip(["dx", "dg", "db", "dw1", "db1", "dw2",
                                "db2"], outs, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def _mesh_pallas_parity(fn, x, k, spec_batch="dp"):
    """Run fn once plain and once pallas+mesh-sharded; assert allclose."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from credit_tpu.ops import conv as conv_ops
    from credit_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(dp=2, tp=1, domain=4)
    ref = jax.jit(fn)(x, k)

    def f_mesh(x, k):
        with conv_ops.explicit_halo(mesh), conv_ops.pallas_convs(True):
            return fn(x, k)

    xs = jax.device_put(x, NamedSharding(
        mesh, P(spec_batch, "domain", None, None)))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    got = jax.jit(f_mesh)(xs, ks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mesh_pallas_s2d_embed_parity():
    """Stride-2 even-kernel embeds (the CrossFormer patch embeds) under the
    explicit-halo mesh: per-shard s2d phase conv on the halo-extended block
    must equal the unsharded conv (VERDICT round-4 ask #5 — pallas convs
    composing with the sharded mesh)."""
    from credit_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 4)), jnp.float32)
    for kk in (4, 8):
        k = jnp.asarray(rng.standard_normal((kk, kk, 4, 8)) * 0.1,
                        jnp.float32)
        _mesh_pallas_parity(
            lambda a, b: conv_ops.conv2d(a, b, stride=2,
                                         padding=(kk - 2) // 2), x, k)


def test_mesh_pallas_stencil_parity():
    from credit_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    _mesh_pallas_parity(
        lambda a, b: conv_ops.conv2d(a, b, stride=1, padding=1), x, k)


def test_mesh_pallas_d2s_transpose_parity():
    """Decoder up-blocks (ConvTranspose2d k=2/s=2 and k=4/s=2/p=1) under
    the explicit-halo mesh."""
    from credit_tpu.ops import conv as conv_ops

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)), jnp.float32)
    for kk, pp in ((2, 0), (4, 1)):
        k = jnp.asarray(rng.standard_normal((kk, kk, 8, 4)) * 0.1,
                        jnp.float32)
        _mesh_pallas_parity(
            lambda a, b, pp=pp: conv_ops.conv_transpose2d(
                a, b, stride=2, padding=pp), x, k)


def test_bwd_tile_pickers_divisor_only():
    """The bwd kernels accumulate weight-grad blocks across grid steps with
    no tail masking — a non-dividing tile would fold out-of-bounds rows
    into dw. The pickers must return dividing tiles or None, and the gate
    must fall back to the XLA VJP for shapes nothing divides."""
    from credit_tpu.ops import pallas_ff

    th = pallas_ff._pick_rows_bwd(100, 180, 512, 2048, 2)
    assert th is not None and 100 % th == 0
    tm = pallas_ff._pick_tile_bwd(51200, 1024, 4096, 2)
    assert tm is not None and 51200 % tm == 0
    # prime row count with an over-VMEM full-width tile: nothing divides
    assert pallas_ff._pick_tile_bwd(97, 1024, 4096, 2) in (None,)


def test_scan_rollout_mesh_seam_parity():
    """make_scan_rollout(mesh=...) — the domain-sharded inference seam —
    must reproduce the single-device trajectory (CPU-mesh analogue of the
    multichip dryrun gate)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model
    from credit_tpu.parallel.mesh import build_mesh
    from credit_tpu.rollout import make_scan_rollout

    conf = {
        "model": {"type": "debugger", "image_height": 16, "image_width": 24,
                  "channels": 0, "surface_channels": 2, "levels": 0,
                  "input_only_channels": 0, "output_only_channels": 0},
        "data": {"source": {"ERA5": {"variables": {
            "prognostic": {"vars_2D": ["T2M", "SP"]}}}}},
    }
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    rng = np.random.default_rng(17)
    x0 = jnp.asarray(rng.standard_normal((2, 1, 16, 24, schema.n_input)),
                     jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    roll = make_scan_rollout(model, schema, 3, history_len=1,
                             with_forcing=False)
    ref, _ = jax.jit(roll)(variables, x0)

    mesh = build_mesh(dp=2, tp=1, domain=4)
    roll_m = make_scan_rollout(model, schema, 3, history_len=1,
                               with_forcing=False, mesh=mesh)
    xs = jax.device_put(x0, NamedSharding(
        mesh, P("dp", None, "domain", None, None)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    got, _ = jax.jit(roll_m)(vs, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bench_param_cache_roundtrip(tmp_path, monkeypatch):
    """The rollout bench's folded-param disk cache (skips the 170-470 s
    init+converge on warm runs) must round-trip the param tree exactly,
    preserving non-float dtypes, and key distinct configs apart."""
    import numpy as onp

    import bench

    monkeypatch.setenv("BENCH_PARAM_CACHE", str(tmp_path))
    tree = {"params": {
        "enc": {"kernel": onp.ones((3, 3, 4, 8), onp.float32),
                "bias": onp.zeros((8,), onp.float32)},
        "table": {"idx": onp.arange(6, dtype=onp.int32)},
    }}
    conf_a = {"model": {"type": "crossformer", "dim": [8]}}
    conf_b = {"model": {"type": "crossformer", "dim": [16]}}
    pa = bench._param_cache_path("tiny", conf_a)
    pb = bench._param_cache_path("tiny", conf_b)
    assert pa != pb
    assert bench._param_cache_load(pa) is None
    bench._param_cache_save(pa, tree)
    got = bench._param_cache_load(pa)
    assert got is not None
    assert got["params"]["table"]["idx"].dtype == onp.int32
    onp.testing.assert_array_equal(got["params"]["enc"]["kernel"],
                                   tree["params"]["enc"]["kernel"])
    assert set(got["params"]) == {"enc", "table"}
    # corrupt file -> load degrades to None (bench re-derives)
    with open(pa, "wb") as f:
        f.write(b"junk")
    assert bench._param_cache_load(pa) is None
