"""Round-4 regression tests.

bench.py's training bench crashed AFTER its measurement in round 3 (a local
dict rebound the int `batch` parameter), losing the JSON metric line the
driver records. These tests drive the bench plumbing end-to-end on CPU tiny
shapes so the JSON-emission path is regression-tested like everything else.
"""

import io
import json
import sys

sys.path.insert(0, "/root/repo")


def _run_to_json(monkeypatch, **kw):
    import bench

    # the module-size guard protects the remote-compile tunnel; these tests
    # compile locally on CPU, so lift it (debug locations alone push the
    # tiny module past the 3.5 MB flight limit)
    monkeypatch.setenv("BENCH_MODULE_LIMIT", str(50_000_000))
    buf = io.StringIO()
    real = sys.stdout
    sys.stdout = buf
    try:
        bench.run_train_bench(**kw)
    finally:
        sys.stdout = real
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert lines, buf.getvalue()
    return json.loads(lines[-1])


def test_train_bench_emits_json_batch1(monkeypatch):
    out = _run_to_json(monkeypatch, bf16=False, kind="tiny", steps=1)
    assert out["metric"] == "wxformer_tinydeg_train_step"
    assert out["unit"] == "steps/s"
    assert out["value"] > 0
    assert "batch" not in out


def test_train_bench_emits_json_batch_gt1(monkeypatch):
    # exercises the exact `if batch > 1:` tail that raised TypeError in
    # round 3 when the dict shadowed the int parameter (bench.py:406)
    out = _run_to_json(monkeypatch, bf16=False, kind="tiny", steps=1, batch=2,
                       spectral_norm=False)
    assert out["batch"] == 2
    assert out["note"].startswith("spectral_norm off")
    assert out["value"] > 0


def _two_train_steps(sn_external: bool, flatten: bool, scan_blocks=False,
                     forecast_len=1, sn_iters=None):
    """Two optimizer steps on the tiny crossformer; returns (losses, params).

    sn_external=True runs the torch-semantics split: u/v power iteration in a
    separate jitted program (spectral_utils.power_iter_spectral) + a step
    built with make_train_step(sn_external=True) whose sigma is computed
    in-graph from the frozen vectors.
    """
    import jax
    import jax.numpy as jnp

    from bench import _bench_conf
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.models.spectral_utils import power_iter_spectral
    from credit_tpu.trainers.trainer import (TrainState, make_optimizer,
                                             make_train_step)

    conf, h, w, frames = _bench_conf("tiny", bf16=False)
    conf["trainer"] = {"learning_rate": 1e-3, "flatten_optimizer": flatten}
    if scan_blocks:
        conf["model"]["scan_blocks"] = True
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    assert model.base_output_channels == schema.n_target

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (1, frames, h, w, schema.n_input), jnp.float32)
    y = jax.random.normal(ky, (1, forecast_len, h, w, schema.n_target),
                          jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    optimizer = make_optimizer(conf, lambda _: 1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       spectral=variables.get("spectral", {}),
                       opt_state=optimizer.init(variables["params"]))
    step = jax.jit(make_train_step(model, WeightedLoss(base="mse"), optimizer,
                                   schema, forecast_len=forecast_len,
                                   history_len=frames,
                                   sn_external=sn_external))
    sn_up = jax.jit(power_iter_spectral, static_argnames="n_iter")
    losses = []
    for i in range(2):
        if sn_external:
            state = state.replace(spectral=sn_up(
                state.params, state.spectral,
                n_iter=sn_iters or forecast_len))
        state, m = step(state, {"x": x, "y": y},
                        jax.random.fold_in(jax.random.PRNGKey(2), i))
        losses.append(float(m["loss"]))
    return losses, state


def test_sn_external_matches_in_graph():
    """External SN (hoisted power iteration + differentiable frozen-vector
    sigma) reproduces the in-graph update exactly: same losses, same params,
    same u/v after 2 optimizer steps."""
    import numpy as np
    import jax

    l_ref, s_ref = _two_train_steps(sn_external=False, flatten=False)
    l_ext, s_ext = _two_train_steps(sn_external=True, flatten=False)
    np.testing.assert_allclose(l_ext, l_ref, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_ext.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.spectral),
                    jax.tree_util.tree_leaves(s_ext.spectral)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sn_external_matches_in_graph_multistep():
    """forecast_len=2: the in-graph path updates u/v once per FORWARD (twice
    per step), so external SN passes n_iter=forecast_len (round-4 advisor
    finding). END-OF-STEP u/v then match exactly; within-step sigmas differ
    by a one-iteration lag per forward (forward #2 in-graph sees u/v after
    its own update — unreproducible outside the graph without splitting the
    step), so losses agree only to ~1%. Both assertions are the contract."""
    import numpy as np
    import jax

    l_ref, s_ref = _two_train_steps(sn_external=False, flatten=False,
                                    forecast_len=2)
    l_ext, s_ext = _two_train_steps(sn_external=True, flatten=False,
                                    forecast_len=2)
    l_one, s_one = _two_train_steps(sn_external=True, flatten=False,
                                    forecast_len=2, sn_iters=1)
    np.testing.assert_allclose(l_ext, l_ref, rtol=2e-2)

    def drift(s):
        return max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                   for a, b in zip(jax.tree_util.tree_leaves(s_ref.spectral),
                                   jax.tree_util.tree_leaves(s.spectral)))

    d_match, d_single = drift(s_ext), drift(s_one)
    assert d_match < 2e-2, d_match
    # the discriminating claim: matching the per-forward iteration count
    # tracks the in-graph trajectory strictly closer than one iteration
    assert d_match < 0.5 * d_single, (d_match, d_single)


def test_flatten_optimizer_matches_per_leaf():
    """optax.flatten'd AdamW (trainer.flatten_optimizer — the module-size
    lever that fits the SN-on flagship step under the tunnel body limit) is
    the identical update, modulo f32 reassociation."""
    import numpy as np
    import jax

    l_ref, s_ref = _two_train_steps(sn_external=False, flatten=False)
    l_flat, s_flat = _two_train_steps(sn_external=False, flatten=True)
    np.testing.assert_allclose(l_flat, l_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_flat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_sn_external_scan_blocks():
    """power_iter_spectral vmaps over scan-stacked u/v (depth-leading axes)
    and matches the in-graph update under scan_blocks."""
    import numpy as np

    l_ref, _ = _two_train_steps(sn_external=False, flatten=False,
                                scan_blocks=True)
    l_ext, _ = _two_train_steps(sn_external=True, flatten=False,
                                scan_blocks=True)
    np.testing.assert_allclose(l_ext, l_ref, rtol=1e-6)


def test_diff_rollout_match_and_mismatch(tmp_path):
    """rollout --diff-against's comparator (the HF parity acceptance,
    docs/HF_PARITY.md): identical trees PASS, a perturbed variable FAILs
    with its per-variable error reported."""
    import numpy as np

    from credit_tpu.applications.experiment import diff_rollout
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.grid import Grid
    from credit_tpu.output import save_netcdf_increment

    conf = {"data": {"source": {"ERA5": {
        "levels": [0.0, 1.0],
        "variables": {"prognostic": {"vars_3D": ["T"], "vars_2D": ["SP"]}},
    }}}}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(4, 8, levels=[0.0, 1.0])
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((1, 4, 8, schema.n_target)).astype(np.float32)
    p_ours = save_netcdf_increment(flat, schema, grid,
                                   str(tmp_path / "ours"), "init", 6)
    p_ref = save_netcdf_increment(flat, schema, grid,
                                  str(tmp_path / "ref"), "init", 6)
    rep = diff_rollout([p_ours], str(tmp_path / "ref"))
    assert rep[0]["ok"], rep
    assert all(v["rel"] == 0.0 for v in rep[0]["vars"].values())

    flat2 = flat.copy()
    flat2[..., 0] += 0.1  # perturb T only
    p_bad = save_netcdf_increment(flat2, schema, grid,
                                  str(tmp_path / "bad"), "init", 6)
    rep = diff_rollout([p_bad], str(tmp_path / "ref"))
    assert not rep[0]["ok"]
    assert not rep[0]["vars"]["T"]["ok"]
    assert rep[0]["vars"]["SP"]["ok"]
    # missing reference file reports, not crashes
    rep = diff_rollout([p_ours], str(tmp_path / "nowhere"))
    assert not rep[0]["ok"] and rep[0]["error"]


def test_train_bench_noremat_smoke(monkeypatch):
    out = _run_to_json(monkeypatch, bf16=False, kind="tiny", steps=1,
                       remat=False)
    assert out["value"] > 0
    assert "remat off" in out["note"]


def test_train_step_pallas_force_parity():
    """The conv-emitter-free TRAINING path (pallas_conv + ff_fusion force,
    interpret mode on CPU): full train-step losses match the XLA path —
    gates the custom VJPs (Pallas conv XLA-grad backward, fused-FF
    recompute backward) composed through value_and_grad + the scan."""
    import numpy as np

    def steps(pallas):
        import jax
        import jax.numpy as jnp

        from bench import _bench_conf
        from credit_tpu.data.channels import ChannelSchema
        from credit_tpu.losses import WeightedLoss
        from credit_tpu.models import load_model
        from credit_tpu.trainers.trainer import (TrainState, make_optimizer,
                                                 make_train_step)

        conf, h, w, frames = _bench_conf("tiny", bf16=False)
        conf["trainer"] = {"learning_rate": 1e-3}
        if pallas:
            conf["model"]["pallas_conv"] = "force"
            conf["model"]["ff_fusion"] = "force"
        schema = ChannelSchema.from_config(conf)
        model = load_model(conf)
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (1, frames, h, w, schema.n_input),
                              jnp.float32)
        y = jax.random.normal(ky, (1, 1, h, w, schema.n_target), jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), x)
        optimizer = make_optimizer(conf, lambda _: 1e-3)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           spectral=variables.get("spectral", {}),
                           opt_state=optimizer.init(variables["params"]))
        step = jax.jit(make_train_step(model, WeightedLoss(base="mse"),
                                       optimizer, schema, forecast_len=1,
                                       history_len=frames))
        out = []
        for i in range(2):
            state, m = step(state, {"x": x, "y": y},
                            jax.random.fold_in(jax.random.PRNGKey(2), i))
            out.append(float(m["loss"]))
        return out

    l_ref = steps(False)
    l_pal = steps(True)
    # FF kernel accumulates LN/GELU in f32 where XLA may not — small drift,
    # compounding once through the first optimizer update
    np.testing.assert_allclose(l_pal, l_ref, rtol=5e-3)
