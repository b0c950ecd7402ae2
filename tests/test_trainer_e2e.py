"""End-to-end trainer + rollout tests on the cheap debugger model
(reference analogue: tests/test_trainer_components.py + the smoke configs —
train a few epochs, assert loss drops, checkpoint/resume, rollout to netCDF)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.normalize import Normalizer
from credit_tpu.data.synthetic import SyntheticDataset
from credit_tpu.grid import Grid
from credit_tpu.losses import WeightedLoss
from credit_tpu.models import load_model
from credit_tpu.trainers.trainer import Trainer

CONF = {
    "save_loc": None,  # filled by fixture
    "seed": 42,
    "data": {
        "source": {
            "ERA5": {
                "levels": [0.0, 1.0, 2.0],
                "variables": {
                    "prognostic": {"vars_3D": ["U", "T"], "vars_2D": ["SP"]},
                    "dynamic_forcing": {"vars_2D": ["TISR"]},
                    "static": {"vars_2D": ["LSM"]},
                    "diagnostic": {"vars_2D": ["PRECIP"]},
                },
            }
        },
        "history_len": 1,
        "forecast_len": 2,
    },
    "trainer": {
        "type": "era5-v2",
        "learning_rate": 2e-3,
        "weight_decay": 0.0,
        "train_batch_size": 2,
        "valid_batch_size": 2,
        "batches_per_epoch": 4,
        "valid_batches_per_epoch": 2,
        "num_epoch": 3,
        "grad_max_norm": 1.0,
        "use_ema": True,
        "ema_decay": 0.99,
    },
    "model": {
        "type": "debugger",
        "image_height": 16,
        "image_width": 32,
        "levels": 3,
        "channels": 2,
        "surface_channels": 1,
        "input_only_channels": 2,
        "output_only_channels": 1,
        "frames": 1,
        "output_frames": 1,
    },
    "loss": {"training_loss": "mse", "use_latitude_weights": True},
}


@pytest.fixture
def setup(tmp_path):
    conf = {**CONF, "save_loc": str(tmp_path)}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(16, 32, levels=[0.0, 1.0, 2.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=40, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    vloss = WeightedLoss.from_config(conf, grid, validation=True)
    trainer = Trainer(conf, model, loss, vloss, schema, dataset, save_loc=str(tmp_path))
    return conf, schema, grid, dataset, model, trainer


def test_schema_layout(setup):
    _, schema, *_ = setup
    # prognostic: 2 vars x 3 levels + 1 2D = 7; static 1; dyn 1 -> 9 inputs
    assert schema.n_input == 9
    assert schema.n_prognostic == 7
    # target: prognostic 7 + diagnostic 1 = 8
    assert schema.n_target == 8
    assert schema.input_slices["prognostic"] == slice(0, 7)
    assert schema.input_slices["static"] == slice(7, 8)
    assert schema.input_slices["dynamic_forcing"] == slice(8, 9)


def test_update_x_splice(setup):
    _, schema, *_ = setup
    x = jnp.arange(9, dtype=jnp.float32)[None, None, None, None, :].repeat(2, 0)
    y = 100.0 + jnp.arange(8, dtype=jnp.float32)[None, None, None, None, :].repeat(2, 0)
    f = 555.0 * jnp.ones((2, 1, 1, 1, 1))
    out = schema.update_x(x, y, f)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]),
                               [100, 101, 102, 103, 104, 105, 106, 7, 555])
    # without new forcing: forcing carried from x_prev
    out2 = schema.update_x(x, y, None)
    assert float(out2[0, 0, 0, 0, 8]) == 8.0


def test_training_reduces_loss_and_resumes(setup):
    conf, schema, grid, dataset, model, trainer = setup
    state = trainer.fit(seed=0)
    log = os.path.join(trainer.save_loc, "training_log.csv")
    assert os.path.exists(log)
    import csv

    with open(log) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train_loss"]) for r in rows]
    assert len(losses) == 3
    assert losses[-1] < losses[0], losses
    # checkpoint exists and resumes
    state2 = trainer.init_state(jax.random.PRNGKey(9))
    restored = trainer.load_checkpoint(state2)
    assert int(restored.step) == int(state.step)
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))


def test_rollout_to_netcdf(setup, tmp_path):
    conf, schema, grid, dataset, model, trainer = setup
    from credit_tpu.output import save_netcdf_increment
    from credit_tpu.rollout import RolloutEngine

    state = trainer.init_state(jax.random.PRNGKey(0))
    variables = {"params": state.params, "spectral": state.spectral}
    norm = Normalizer.identity(schema)
    engine = RolloutEngine(model, variables, schema, norm, history_len=1)

    x0 = jnp.asarray(dataset.input_at(2)[None])  # (1, T, H, W, C)
    forcing = lambda s: dataset.forcing_at(2 + s)[None]
    paths = []

    def writer(step, y):
        p = save_netcdf_increment(y[0], schema, grid, str(tmp_path / "fc"),
                                  "2020-01-01T00", (step + 1) * 6)
        paths.append(p)

    outs = engine.run(x0, 4, forcing_provider=forcing, on_step=writer)
    assert len(paths) == 4
    from credit_tpu.utils.ncio import open_dataset

    ds = open_dataset(paths[0])
    assert "U" in ds and ds["U"].shape == (1, 3, 16, 32)
    assert "PRECIP" in ds and ds["PRECIP"].shape == (1, 16, 32)
    assert np.isfinite(ds["U"].values).all()


def test_scan_rollout_matches_loop(setup):
    conf, schema, grid, dataset, model, trainer = setup
    from credit_tpu.rollout import RolloutEngine, make_scan_rollout

    state = trainer.init_state(jax.random.PRNGKey(0))
    variables = {"params": state.params, "spectral": state.spectral}
    engine = RolloutEngine(model, variables, schema, None, history_len=1)
    x0 = jnp.asarray(dataset.input_at(2)[None])
    outs = engine.run(x0, 3, denormalize=False)

    scan = jax.jit(make_scan_rollout(model, schema, 3, history_len=1))
    final_x, stats = scan(variables, x0)
    # stats are per-step channel means of y_pred
    loop_means = np.stack([o.mean(axis=(0, 1, 2, 3)) for o in outs])
    np.testing.assert_allclose(np.asarray(stats), loop_means, rtol=1e-4, atol=1e-5)


def test_checkpoint_restores_optimizer_state(setup):
    conf, schema, grid, dataset, model, trainer = setup
    state = trainer.fit(seed=0)
    state2 = trainer.init_state(jax.random.PRNGKey(9))
    restored = trainer.load_checkpoint(state2)
    # adam moments restored (non-zero and matching)
    import optax

    def mu_leaves(s):
        leaves = [l for l in jax.tree_util.tree_leaves(s)
                  if hasattr(l, "shape") and l.ndim > 0]
        return leaves

    a = mu_leaves(state.opt_state)
    b = mu_leaves(restored.opt_state)
    assert len(a) == len(b) and len(a) > 0
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
    assert float(np.abs(np.asarray(b[0])).max()) > 0


def test_backprop_on_timestep_subset(setup):
    """Loss/grad only on selected rollout steps (reference
    trainer_gen2 backprop_on_timestep; config is 1-based)."""
    conf, schema, grid, dataset, model, trainer = setup
    import copy

    conf2 = copy.deepcopy(conf)
    conf2["trainer"]["backprop_on_timestep"] = [2]  # only the 2nd step
    t2 = Trainer(conf2, model, trainer.loss_fn, trainer.valid_loss_fn, schema,
                 dataset, save_loc=conf2["save_loc"])
    assert t2.backprop_on == [1]
    state = t2.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in
             dataset.batch([2, 3], t2.forecast_len).items() if v is not None}
    # snapshot BEFORE the step: _train_step donates its input state
    l0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state2, metrics = t2._train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    l1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(l0, np.asarray(l1))
