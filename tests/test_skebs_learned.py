"""Learned SKEBS backscatter networks + training integration.

VERDICT round-1 item 7: FCNN/CNN/Unet/FixedCol backscatter nets as flax
modules with trainable params flowing through the train step, and an
ensemble-training test where SKEBS state threads through the rollout.
Reference: credit/skebs.py:37-242 (nets), :553-760 (training forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.grid import Grid
from credit_tpu.physics.skebs_nets import (BackscatterCNN, BackscatterFCNN,
                                           BackscatterFCNNWide,
                                           BackscatterFixedCol,
                                           BackscatterUnet,
                                           build_backscatter_net)

H, W, NLEV = 16, 32, 3


@pytest.mark.parametrize("cls,kw", [
    (BackscatterFCNN, {}), (BackscatterFCNNWide, {}), (BackscatterCNN, {}),
    (BackscatterUnet, {"width": 8}), (BackscatterFixedCol, {}),
])
def test_backscatter_net_shapes_and_positivity(cls, kw):
    net = cls(levels=NLEV, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 7))
    params = net.init(jax.random.PRNGKey(1), x)["params"]
    rate = net.apply({"params": params}, x)
    assert rate.shape == (2, H, W, NLEV)
    assert bool(jnp.all(rate >= 0.0)), cls.__name__


def test_fixed_col_initial_value():
    net = BackscatterFixedCol(levels=NLEV)
    x = jnp.zeros((1, H, W, 4))
    p = net.init(jax.random.PRNGKey(0), x)["params"]
    np.testing.assert_allclose(np.asarray(p["backscatter_array"]), 2.5)


def test_build_dispatch():
    for kind in ("fcnn", "fcnn_wide", "cnn", "unet", "fixed_column",
                 "prescribed"):
        net = build_backscatter_net({"type": kind}, NLEV)
        assert net.levels == NLEV


# ---------------------------------------------------------------------------
CONF = {
    "seed": 0,
    "data": {
        "source": {"ERA5": {
            "levels": [0.0, 1.0, 2.0],
            "variables": {"prognostic": {"vars_3D": ["U", "V"],
                                         "vars_2D": ["SP"]}},
        }},
        "history_len": 1, "forecast_len": 2,
    },
    "trainer": {
        "type": "era5-v2", "learning_rate": 1e-3, "train_batch_size": 2,
        "valid_batch_size": 2, "batches_per_epoch": 2,
        "valid_batches_per_epoch": 1, "num_epoch": 1, "preflight": False,
        "ensemble_size": 2,
    },
    "model": {
        "type": "debugger", "image_height": H, "image_width": W,
        "levels": NLEV, "channels": 2, "surface_channels": 1,
        "input_only_channels": 0, "output_only_channels": 0,
        "frames": 1, "output_frames": 1,
        "post_conf": {
            "activate": True,
            "skebs": {"activate": True, "U_var": "U", "V_var": "V",
                      "backscatter_net": {"type": "fcnn"},
                      "max_pattern_wavenum": 8,
                      "pattern_filter_anneal_start": 4,
                      "max_backscatter_wavenum": 8,
                      "backscatter_filter_anneal_start": 4},
        },
    },
    "loss": {"training_loss": "almost-fair-crps"},
}


def test_skebs_learned_trains_in_ensemble_step(tmp_path):
    """SKEBS with a trainable FCNN backscatter net inside a 2-member,
    2-rollout-step CRPS training run: the net's params receive gradient
    updates and the loss stays finite (the AR(1) state threads through the
    unrolled steps inside the jitted train step)."""
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import Trainer

    conf = {**CONF, "save_loc": str(tmp_path)}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(H, W, levels=[0.0, 1.0, 2.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=24, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    trainer = Trainer(conf, model, loss, loss, schema, dataset,
                      save_loc=str(tmp_path))
    assert any(getattr(b, "is_trainable", False)
               for b in trainer.train_postblocks)

    state = trainer.init_state(jax.random.PRNGKey(0))
    assert "_postblocks" in state.params
    net0 = jax.tree_util.tree_map(np.array, state.params["_postblocks"])

    batch = {k: jnp.asarray(v) for k, v in dataset.batch([2, 3], 2).items()
             if v is not None}
    state2, metrics = trainer._train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    net1 = state2.params["_postblocks"]
    diffs = [float(np.abs(np.asarray(b) - np.asarray(a)).max())
             for a, b in zip(jax.tree_util.tree_leaves(net0),
                             jax.tree_util.tree_leaves(net1))]
    assert max(diffs) > 0.0, "backscatter net params did not update"

    # checkpoint round-trips the postblock params
    trainer.save_checkpoint(state2, 0)
    restored = trainer.load_checkpoint(trainer.init_state(jax.random.PRNGKey(5)))
    l0 = jax.tree_util.tree_leaves(state2.params["_postblocks"])[0]
    l1 = jax.tree_util.tree_leaves(restored.params["_postblocks"])[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))


def test_skebs_learned_in_rollout_engine(tmp_path):
    """RolloutEngine splits '_postblocks' from the checkpoint params and the
    learned rate shapes the wind perturbation during a scan rollout."""
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.postblock import build_postblocks
    from credit_tpu.rollout import RolloutEngine
    from credit_tpu.trainers.trainer import Trainer

    conf = {**CONF, "save_loc": str(tmp_path)}
    conf["trainer"] = {**conf["trainer"], "ensemble_size": 1}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(H, W, levels=[0.0, 1.0, 2.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=24, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    trainer = Trainer(conf, model, loss, loss, schema, dataset,
                      save_loc=str(tmp_path))
    state = trainer.init_state(jax.random.PRNGKey(0))

    post = build_postblocks(conf, schema, grid)
    engine = RolloutEngine(model, {"params": state.params,
                                   "spectral": state.spectral},
                           schema, history_len=1, postblocks=post)
    assert engine.pb_params is not None
    x0 = jnp.asarray(dataset.input_at(2)[None])
    ys = engine.run(x0, 3)
    assert len(ys) == 3 and all(np.isfinite(np.asarray(y)).all() for y in ys)
