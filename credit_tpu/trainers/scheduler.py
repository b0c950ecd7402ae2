"""Learning-rate schedules (optax) mirroring the reference scheduler set
(reference: credit/scheduler.py — LinearWarmupCosineScheduler:12,
CosineAnnealingWarmupRestarts:115, lambda/phased:91-113, plateau,
annealed_probability:220)."""

from __future__ import annotations

from typing import Optional

import optax


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  min_lr: float = 0.0) -> optax.Schedule:
    """Linear warmup then cosine anneal (reference LinearWarmupCosineScheduler)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr)


def cosine_warmup_restarts(base_lr: float, first_cycle_steps: int,
                           cycle_mult: float = 1.0, warmup_steps: int = 0,
                           gamma: float = 1.0, min_lr: float = 0.0,
                           n_cycles: int = 8) -> optax.Schedule:
    """Cosine annealing with warm restarts + per-cycle peak decay gamma
    (reference CosineAnnealingWarmupRestarts)."""
    schedules, boundaries = [], []
    t = 0
    steps = first_cycle_steps
    peak = base_lr
    for _ in range(n_cycles):
        schedules.append(optax.warmup_cosine_decay_schedule(
            init_value=min_lr, peak_value=peak, warmup_steps=max(warmup_steps, 1),
            decay_steps=steps, end_value=min_lr))
        t += steps
        boundaries.append(t)
        steps = int(steps * cycle_mult)
        peak *= gamma
    return optax.join_schedules(schedules, boundaries[:-1])


def lambda_phased(base_lr: float, warmup_steps: int = 1000,
                  phase1_steps: int = 100000, decay: float = 0.5) -> optax.Schedule:
    """Phased lambda schedule: warmup, hold, stepwise decay (reference
    scheduler.py:91-113 lr_lambda_phase)."""

    def fn(step):
        import jax.numpy as jnp

        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        phase = jnp.floor(jnp.maximum(step - phase1_steps, 0) / max(phase1_steps, 1))
        return base_lr * warm * decay**phase

    return fn


def constant(base_lr: float) -> optax.Schedule:
    return optax.constant_schedule(base_lr)


def annealed_probability(epoch: int, max_epochs: int = 100,
                         min_probability: float = 0.01,
                         max_probability: float = 1.0) -> float:
    """Scheduled-rollout sampling probability annealed over epochs
    (reference scheduler.py:220)."""
    frac = min(max(epoch / max(max_epochs, 1), 0.0), 1.0)
    return max_probability - frac * (max_probability - min_probability)


def load_scheduler(conf: dict) -> Optional[optax.Schedule]:
    """Build a schedule from the trainer config section; None -> constant lr."""
    t = conf.get("trainer", {})
    lr = float(t.get("learning_rate", 1e-4))
    if not t.get("use_scheduler"):
        return constant(lr)
    sconf = t.get("scheduler", {}) or {}
    kind = sconf.get("scheduler_type", "cosine-annealing")
    if kind in ("cosine-annealing", "warmup-cosine"):
        return warmup_cosine(
            lr, int(sconf.get("warmup_steps", sconf.get("first_cycle_steps", 1000) // 20)),
            int(sconf.get("total_steps", sconf.get("first_cycle_steps", 100000))),
            float(sconf.get("min_lr", 0.0)))
    if kind in ("cosine-annealing-restarts",):
        return cosine_warmup_restarts(
            lr, int(sconf.get("first_cycle_steps", 10000)),
            float(sconf.get("cycle_mult", 1.0)), int(sconf.get("warmup_steps", 500)),
            float(sconf.get("gamma", 1.0)), float(sconf.get("min_lr", 0.0)))
    if kind == "lambda":
        return lambda_phased(lr)
    return constant(lr)
