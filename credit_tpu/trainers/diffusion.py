"""Diffusion trainer: conditional denoising training + DDIM sampling eval.

Re-designs the reference's TrainerERA5Diffusion
(reference: credit/trainers/trainerERA5_Diffusion.py, registered
'era5-diffusion' in trainers/__init__.py:29): per optimizer step, sample a
random diffusion time t, noise the target with the forward process, and
regress the chosen objective (pred_v default) conditioned on the input
state. Validation draws a short DDIM trajectory and scores the generated
state against the target — all inside jit.

Uses the shared Trainer fit loop (checkpointing, CSV, EMA, multi-host);
only the step functions are swapped.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from credit_tpu import registry
from credit_tpu.diffusion import GaussianDiffusion
from credit_tpu.trainers.trainer import Trainer, TrainState

import optax


@registry.register("trainer", "era5-diffusion")
class DiffusionTrainer(Trainer):
    def __init__(self, conf, model, loss_fn, valid_loss_fn, schema, dataset,
                 valid_dataset=None, save_loc=None, normalizer=None):
        super().__init__(conf, model, loss_fn, valid_loss_fn, schema, dataset,
                         valid_dataset, save_loc, normalizer)
        d = conf.get("diffusion", {}) or {}

        def backbone(variables, cond, y_noisy, t_frac):
            return model.apply(variables, cond, y_noisy=y_noisy,
                               t_frac=t_frac)

        self.gd = GaussianDiffusion(
            backbone,
            timesteps=int(d.get("timesteps", 1000)),
            sampling_timesteps=int(d.get("sampling_timesteps", 20)),
            beta_schedule=d.get("beta_schedule", "sigmoid"),
            objective=d.get("objective", "pred_v"),
            ddim_eta=float(d.get("ddim_eta", 0.0)))
        self._train_step = jax.jit(self._make_diffusion_train_step())
        # fit() dispatches via _train_step_for/_step_cache (seeded by the base
        # __init__ with the gen2 regression step); re-seed so the denoising
        # objective actually trains (advisor round-2 high finding)
        self._step_cache = {self.forecast_len: self._train_step}
        self._eval_step = jax.jit(self._make_diffusion_eval_step())

    def _train_step_for(self, flen: int):
        """Diffusion trains single-step denoising regardless of any scheduled
        rollout length — always dispatch the denoising step."""
        return self._train_step

    # ------------------------------------------------------------------
    def _make_diffusion_train_step(self):
        gd, normalizer, schema = self.gd, self.normalizer, self.schema
        optimizer = self.optimizer
        ema_decay = self.ema_decay if self.use_ema else 0.0

        def step(state: TrainState, batch: Dict[str, jnp.ndarray],
                 rng: jax.Array):
            x, y = batch["x"], batch["y"]
            if normalizer is not None:
                x = normalizer.normalize_input(x)
                y = normalizer.normalize_target(y)

            def loss_of(p):
                variables = {"params": p, "spectral": state.spectral}
                return gd.loss(variables, x, y[:, :1], rng)

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            finite = jnp.isfinite(loss)
            safe = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, opt_state = optimizer.update(safe, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), params,
                state.params)
            new_ema = state.ema_params
            if state.ema_params is not None:
                dcy = jnp.minimum(ema_decay,
                                  (1.0 + state.step) / (10.0 + state.step))
                new_ema = jax.tree_util.tree_map(
                    lambda e, q: e * dcy + q.astype(e.dtype) * (1 - dcy),
                    state.ema_params, params)
            metrics = {"loss": loss, "grad_norm": optax.global_norm(safe),
                       "finite": finite.astype(jnp.float32)}
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state, ema_params=new_ema), metrics

        return step

    def _make_diffusion_eval_step(self):
        gd, normalizer = self.gd, self.normalizer

        def step(state: TrainState, batch, rng: jax.Array):
            x, y = batch["x"], batch["y"]
            if normalizer is not None:
                x = normalizer.normalize_input(x)
                y = normalizer.normalize_target(y)
            params = (state.ema_params if state.ema_params is not None
                      else state.params)
            variables = {"params": params, "spectral": state.spectral}
            # per-(epoch, batch) key from fit — a fixed key would sample the
            # same DDIM trajectory every epoch
            sample = gd.sample(variables, x, rng, y[:, :1].shape)
            return {"loss": jnp.mean((sample - y[:, :1]) ** 2)}

        return step
