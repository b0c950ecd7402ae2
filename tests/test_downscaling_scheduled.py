"""DownscalingLoss dispatch + scheduled-rollout (annealed forecast length)
training (reference: credit/losses/downscaling_loss.py:63 DownscalingLoss,
credit/scheduler.py:220 annealed_probability)."""

import copy

import numpy as np

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.synthetic import SyntheticDataset
from credit_tpu.grid import Grid
from credit_tpu.losses import DownscalingLoss, WeightedLoss
from credit_tpu.models import load_model
from credit_tpu.trainers.scheduler import annealed_probability
from credit_tpu.trainers.trainer import Trainer

from tests.test_trainer_e2e import CONF


def _downscaling_conf():
    conf = copy.deepcopy(CONF)
    conf["data"]["datasets"] = {"era5": {}, "conus404": {}}
    return conf


def test_downscaling_loss_dispatch():
    """`data.datasets` present -> DownscalingLoss, no latitude weights
    (reference: losses/__init__.py:217 is_downscaling)."""
    conf = _downscaling_conf()
    grid = Grid.regular(16, 32, levels=[0.0, 1.0, 2.0])
    loss = WeightedLoss.from_config(conf, grid)
    assert isinstance(loss, DownscalingLoss)
    assert loss.lat_weights is None  # lat weights warned away
    # validation defaults to L1 when no validation_loss configured
    vloss = WeightedLoss.from_config(conf, grid, validation=True)
    assert vloss.base_name == "mae"
    # CRPS training losses are reused for validation (ensemble parity)
    conf2 = _downscaling_conf()
    conf2["loss"]["training_loss"] = "KCRPS"
    vloss2 = WeightedLoss.from_config(conf2, grid, validation=True)
    assert vloss2.base_name == "KCRPS" and vloss2.is_ensemble


def test_downscaling_loss_value():
    conf = _downscaling_conf()
    loss = WeightedLoss.from_config(conf, None)
    t = np.zeros((1, 1, 4, 8, 3), np.float32)
    p = np.full_like(t, 2.0)
    assert np.isclose(float(loss(t, p)), 4.0)  # plain-mean mse, unweighted


def test_annealed_probability_endpoints():
    assert annealed_probability(0, 10) == 1.0
    assert np.isclose(annealed_probability(10, 10, 0.01), 0.01)
    assert np.isclose(annealed_probability(99, 10, 0.01), 0.01)  # clamped


def test_scheduled_rollout_lengths_deterministic():
    conf = copy.deepcopy(CONF)
    conf["data"]["forecast_len"] = 3
    conf["trainer"]["rollout_schedule"] = {
        "type": "annealed", "max_epochs": 4, "min_probability": 0.05}
    conf["trainer"]["num_epoch"] = 1
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(16, 32, levels=[0.0, 1.0, 2.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=40, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    tr = Trainer(conf, model, loss, loss, schema, dataset, save_loc="/tmp/x")
    # epoch 0: termination probability 1.0 -> always length 1
    assert tr._scheduled_forecast_len(0, seed=0) == 1
    # deterministic per (seed, epoch): same draw every call (multi-host lockstep)
    draws = [tr._scheduled_forecast_len(e, seed=0) for e in range(8)]
    assert draws == [tr._scheduled_forecast_len(e, seed=0) for e in range(8)]
    assert all(1 <= d <= 3 for d in draws)
    # late epochs (p -> 0.05) reach the full length with high probability
    late = [tr._scheduled_forecast_len(e, seed=0) for e in range(4, 40)]
    assert max(late) == 3


def test_replay_training_runs(tmp_path):
    """trainer.replay: model-predicted states flow into the buffer during
    fit() and get re-served as inputs (reference: credit/replay_buffer.py
    ReplayBuffer:77 + Trainer:384)."""
    conf = copy.deepcopy(CONF)
    conf["save_loc"] = str(tmp_path)
    conf["trainer"].update({
        "num_epoch": 2, "batches_per_epoch": 3, "use_ema": False,
        "replay": {"capacity": 8, "probability": 1.0},
    })
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(16, 32, levels=[0.0, 1.0, 2.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=40, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    tr = Trainer(conf, model, loss, loss, schema, dataset, save_loc=str(tmp_path))
    assert tr.replay is not None and len(tr.replay) == 0
    state = tr.fit(seed=0)
    assert state is not None
    # every train batch deposited its predicted states (2 epochs x 3 batches
    # x batch 2 = 12 adds into a capacity-8 pool)
    assert len(tr.replay) == 8
    log = (tmp_path / "training_log.csv").read_text().strip().splitlines()
    assert np.isfinite(float(log[-1].split(",")[1]))


def test_scheduled_rollout_training_runs(tmp_path):
    """fit() with rollout_schedule: short-rollout epochs compile their own
    cached step and the loss still drops."""
    conf = copy.deepcopy(CONF)
    conf["save_loc"] = str(tmp_path)
    conf["data"]["forecast_len"] = 2
    conf["trainer"].update({
        "num_epoch": 3, "batches_per_epoch": 3,
        "rollout_schedule": {"max_epochs": 2, "min_probability": 0.01},
        "use_ema": False,
    })
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(16, 32, levels=[0.0, 1.0, 2.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=40, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    tr = Trainer(conf, model, loss, loss, schema, dataset, save_loc=str(tmp_path))
    state = tr.fit(seed=0)
    assert state is not None
    log = (tmp_path / "training_log.csv").read_text().strip().splitlines()
    assert len(log) == 4  # header + 3 epochs
    first = float(log[1].split(",")[1])
    last = float(log[-1].split(",")[1])
    assert np.isfinite(first) and np.isfinite(last) and last < first
