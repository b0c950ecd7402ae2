"""Ensemble rollout verification harness.

Re-implements the reference's metrics-only rollouts with noisy ICs
(reference: credit/applications/rollout_metrics*.py and ensemble_eval.py):
build an ensemble of perturbed initial conditions (gaussian / spherical /
bred vectors), roll every member forward, and score lat-weighted ensemble
metrics (RMSE/ACC of the mean, spread, spread-skill, CRPS) per lead time
against the dataset truth. No netCDF round-trip — metrics stream out.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def run_rollout_metrics(conf: dict, n_steps: Optional[int] = None,
                        n_members: Optional[int] = None,
                        perturbation: Optional[str] = None) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from credit_tpu.applications.experiment import build_experiment
    from credit_tpu.ensemble.bred_vector import generate_bred_vectors
    from credit_tpu.ensemble.noise import GaussianNoise, SphericalNoise
    from credit_tpu.losses import kcrps
    from credit_tpu.metrics import LatWeightedMetrics
    from credit_tpu.models.spectral_utils import converge_spectral
    from credit_tpu.rollout import RolloutEngine
    from credit_tpu.trainers.trainer import load_trainer

    exp = build_experiment(conf)
    pconf = conf.get("predict", {}) or {}
    econf = pconf.get("ensemble", {}) or {}
    n_steps = n_steps or int(pconf.get("forecast_steps", 8))
    n_members = n_members or int(econf.get("size", pconf.get("ensemble_size", 4)))
    perturbation = perturbation or econf.get("perturbation", "gaussian")
    amplitude = float(econf.get("amplitude", 0.01))

    import os

    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"],
                  exp["schema"], exp["dataset"], exp["valid_dataset"],
                  save_loc=conf.get("save_loc", "./ckpt"),
                  normalizer=exp["normalizer"])
    state = trainer.init_state(jax.random.PRNGKey(0))
    if os.path.exists(os.path.join(trainer.save_loc, "checkpoint")):
        state = trainer.load_checkpoint(state)
    variables = converge_spectral(
        {"params": state.params, "spectral": state.spectral})
    engine = RolloutEngine(exp["model"], variables, exp["schema"],
                           exp["normalizer"], history_len=trainer.history_len)

    dataset = exp["dataset"]
    t0 = dataset.history_len
    x0 = jnp.asarray(exp["normalizer"].normalize_input(
        jnp.asarray(dataset.input_at(t0)[None])))
    key = jax.random.PRNGKey(int(conf.get("seed", 0)))

    if perturbation == "model":
        # noisy-MODEL ensembles (reference:
        # applications/rollout_metrics_noisy_model.py:333 repeat_interleave):
        # every member starts from the SAME x0; spread comes from the model's
        # own stochasticity (SDL noise layers / stochastic postblocks), seeded
        # differently per member below.
        members = [x0 for _ in range(n_members)]
    elif perturbation == "spherical":
        noise = SphericalNoise(exp["grid"], std=amplitude)
        members = [noise(k, x0) for k in jax.random.split(key, n_members)]
    elif perturbation == "bred":
        def step_fn(x):
            y, x_next = engine.step(x)
            return x_next

        members = [x0 + bv for bv in [m - x0 for m in generate_bred_vectors(
            step_fn, x0, key, n_members, amplitude)]]
    else:
        noise = GaussianNoise(std=amplitude)
        members = [noise(k, x0) for k in jax.random.split(key, n_members)]

    metrics = LatWeightedMetrics(exp["grid"], exp["schema"].target_names)
    norm = exp["normalizer"]
    # roll each member; stack predictions per step
    per_member = []
    for m, xm in enumerate(members):
        engine.reset(batch_size=xm.shape[0],
                     seed=int(conf.get("seed", 0)) * 1000 + m + 1)
        outs = engine.run(xm, n_steps,
                          forcing_provider=lambda s: None
                          if dataset.forcing_at(t0 + s) is None
                          else norm.normalize_forcing(
                              jnp.asarray(dataset.forcing_at(t0 + s)[None]),
                              exp["schema"]),
                          denormalize=True)
        per_member.append(outs)
    rows = []
    for s in range(n_steps):
        ens = jnp.asarray(np.stack([per_member[m][s] for m in range(n_members)],
                                   axis=1))  # (1, E, T, H, W, C)
        truth = jnp.asarray(dataset.target_at(t0 + 1 + s)[None])
        out = metrics.ensemble(truth, ens)
        crps_field = kcrps(truth, ens)  # (B, T, H, W, C)
        crps = float(crps_field.mean())
        # per-channel CRPS columns (reference:
        # rollout_metrics_noisy_model.py calculate_crps_per_channel)
        per_var = np.asarray(crps_field.mean(axis=tuple(
            range(crps_field.ndim - 1))))
        row = {"step": s + 1,
               "lead_hours": (s + 1) * int(conf.get("data", {}).get("lead_time_periods", 6)),
               "crps": crps,
               **{f"crps_{name}": float(v) for name, v in
                  zip(exp["schema"].target_names, per_var)},
               **{k: float(v) for k, v in out.items()
                  if k in ("rmse", "acc", "spread", "spread_skill_ratio")}}
        rows.append(row)
        logger.info("rollout-metrics %s", row)
    return rows
