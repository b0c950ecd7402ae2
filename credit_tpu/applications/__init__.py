"""Application glue: build + run training and rollout from a config."""

from credit_tpu.applications.experiment import (  # noqa: F401
    build_experiment, run_rollout, run_training)
