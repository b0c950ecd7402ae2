"""Training engine: optax-based trainer with multi-step truncated-BPTT
rollout, EMA, checkpointing, schedulers."""

from credit_tpu.trainers.trainer import Trainer, TrainState, load_trainer  # noqa: F401
