"""Experiment construction: config -> (schema, grid, model, datasets,
trainer) and the train / rollout entry points.

This is the gen2 application layer (reference:
credit/applications/train_gen2.py:57 main_cli wiring and
credit/applications/rollout_to_netcdf.py:195 predict) re-expressed for the
single-process-per-host JAX runtime: no process-group bootstrap — the jax
distributed runtime + mesh replaces torchrun/MPI rank discovery.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def build_experiment(conf: dict) -> Dict[str, Any]:
    import jax

    from credit_tpu.config import model_channel_check
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.data.local import load_dataset
    from credit_tpu.data.normalize import Normalizer
    from credit_tpu.grid import grid_from_conf
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.registry import load_custom_objects

    load_custom_objects(conf)
    schema = ChannelSchema.from_config(conf)
    grid = grid_from_conf(conf)
    model_channel_check(conf, schema)
    model = load_model(conf)

    data = conf.get("data", {}) or {}
    if data.get("mean_path") and data.get("std_path") and os.path.exists(data["mean_path"]):
        normalizer = Normalizer.from_netcdf(schema, data["mean_path"], data["std_path"])
    else:
        normalizer = Normalizer.identity(schema)

    dataset = load_dataset(conf, schema, grid, "train")
    valid = load_dataset(conf, schema, grid, "valid") if conf.get("data_valid") else None

    loss = WeightedLoss.from_config(conf, grid)
    vloss = WeightedLoss.from_config(conf, grid, validation=True)
    return {
        "schema": schema, "grid": grid, "model": model, "normalizer": normalizer,
        "dataset": dataset, "valid_dataset": valid, "loss": loss, "valid_loss": vloss,
    }


def run_training(conf: dict, seed: Optional[int] = None):
    """credit-tpu train (reference: applications/train_gen2.py)."""
    import jax

    from credit_tpu.trainers.trainer import load_trainer

    exp = build_experiment(conf)
    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"], exp["schema"],
                  exp["dataset"], exp["valid_dataset"],
                  save_loc=conf.get("save_loc", "./ckpt"),
                  normalizer=exp["normalizer"])
    state = None
    if conf.get("trainer", {}).get("load_weights"):
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = trainer.load_checkpoint(state)
        logger.info("resumed from checkpoint at step %d", int(state.step))
    return trainer.fit(state, seed=seed if seed is not None else int(conf.get("seed", 0)))


def run_rollout(conf: dict, n_steps: Optional[int] = None,
                save_dir: Optional[str] = None, use_ema: bool = False):
    """credit-tpu rollout (reference: applications/rollout_to_netcdf.py:195
    predict): init -> autoregressive steps -> per-step netCDF files."""
    import jax
    import jax.numpy as jnp

    from credit_tpu.models.spectral_utils import converge_spectral
    from credit_tpu.output import save_netcdf_increment
    from credit_tpu.rollout import RolloutEngine
    from credit_tpu.trainers.trainer import Trainer, load_trainer

    exp = build_experiment(conf)
    pconf = conf.get("predict", {}) or {}
    n_steps = n_steps or int(pconf.get("forecast_steps", 4))
    save_dir = save_dir or pconf.get("save_forecast") or os.path.join(
        conf.get("save_loc", "."), "forecasts")
    lead_hours = int(conf.get("data", {}).get("lead_time_periods", 6))

    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"], exp["schema"],
                  exp["dataset"], exp["valid_dataset"],
                  save_loc=conf.get("save_loc", "./ckpt"),
                  normalizer=exp["normalizer"])
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = os.path.join(trainer.save_loc, "checkpoint")
    if os.path.exists(ckpt):
        state = trainer.load_checkpoint(state)
        logger.info("loaded weights from %s", ckpt)
    else:
        logger.warning("no checkpoint at %s — rolling out with fresh init", ckpt)
    variables = converge_spectral({"params": state.params, "spectral": state.spectral})

    from credit_tpu.postblock import build_postblocks

    postblocks = build_postblocks(conf, exp["schema"], exp["grid"], exp["normalizer"])
    engine = RolloutEngine(exp["model"], variables, exp["schema"], exp["normalizer"],
                           history_len=trainer.history_len, postblocks=postblocks,
                           use_ema=use_ema)

    dataset = exp["dataset"]
    t0 = dataset.history_len
    x0 = jnp.asarray(dataset.input_at(t0)[None])
    init_label = pconf.get("init_label", f"init{t0:04d}")
    written = []

    def forcing(s):
        f = dataset.forcing_at(t0 + s) if hasattr(dataset, "forcing_at") else None
        return None if f is None else f[None]

    def writer(step, y):
        p = save_netcdf_increment(y[0], exp["schema"], exp["grid"], save_dir,
                                  init_label, (step + 1) * lead_hours)
        written.append(p)

    engine.run(x0, n_steps, forcing_provider=forcing, on_step=writer)
    logger.info("wrote %d forecast files to %s", len(written), save_dir)
    return written
