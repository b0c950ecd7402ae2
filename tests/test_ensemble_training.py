"""Ensemble (CRPS) training path: noise-injection model + KCRPS loss
(reference: trainerERA5_ensemble + trainer_gen2 batch-axis ensembles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.synthetic import SyntheticDataset
from credit_tpu.grid import Grid
from credit_tpu.losses import WeightedLoss, kcrps, almost_fair_crps
from credit_tpu.models import load_model
from credit_tpu.trainers.trainer import Trainer

CONF = {
    "save_loc": None,
    "data": {"source": {"E": {"levels": [0.0], "variables": {
        "prognostic": {"vars_2D": ["T", "SP"]}}}},
        "history_len": 1, "forecast_len": 1},
    "trainer": {"learning_rate": 1e-3, "train_batch_size": 2,
                "batches_per_epoch": 2, "num_epoch": 1,
                "ensemble_size": 3, "grad_max_norm": 1.0},
    "model": {"type": "crossformer-ensemble", "image_height": 16,
              "image_width": 32, "levels": 1, "channels": 0,
              "surface_channels": 2, "input_only_channels": 0,
              "output_only_channels": 0, "dim": [8, 16, 32, 64],
              "depth": [1, 1, 1, 1], "dim_head": 8,
              "global_window_size": [2, 1, 1, 1], "local_window_size": 2,
              "cross_embed_kernel_sizes": [[2, 4], [2, 4], [2, 4], [2, 4]],
              "cross_embed_strides": [2, 2, 2, 2],
              "use_spectral_norm": False,
              "padding_conf": {"activate": True, "mode": "earth",
                               "pad_lat": [8, 8], "pad_lon": [0, 0]}},
    "loss": {"training_loss": "almost-fair-crps"},
}


def test_crps_losses_prefer_calibrated_ensembles(rng):
    t = jnp.asarray(rng.standard_normal((4, 8, 8)), jnp.float32)
    good = t[:, None] + 0.1 * jnp.asarray(rng.standard_normal((4, 5, 8, 8)), jnp.float32)
    bad = t[:, None] + 2.0 + 0.01 * jnp.asarray(rng.standard_normal((4, 5, 8, 8)), jnp.float32)
    for fn in (kcrps, almost_fair_crps):
        assert float(fn(t, good).mean()) < float(fn(t, bad).mean())


def test_ensemble_crps_training_step(tmp_path, rng):
    conf = {**CONF, "save_loc": str(tmp_path)}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(16, 32)
    ds = SyntheticDataset(schema, grid, n_times=12, seed=0)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    assert loss.is_ensemble
    trainer = Trainer(conf, model, loss, loss, schema, ds, save_loc=str(tmp_path))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in ds.batch([2, 3], 1).items()
             if v is not None}
    # snapshot BEFORE the step: _train_step donates its input state
    l0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state2, metrics = trainer._train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["finite"]) == 1.0
    # params actually moved
    l1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(l0, np.asarray(l1))
