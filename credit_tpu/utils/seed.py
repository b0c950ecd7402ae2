"""Deterministic seeding (reference: credit/seed.py:7 seed_everything).

In JAX, determinism flows from explicit PRNG keys; this seeds the host-side
generators (python, numpy) used by samplers/datasets and returns the root
jax key. dp-rank divergence mirrors the reference's two-phase seeding
(train_gen2.py:209,230: identical seed pre-build, +data_rank after)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int, data_rank: int = 0):
    import jax

    random.seed(seed + data_rank)
    np.random.seed((seed + data_rank) % 2**32)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed + data_rank)


def parse_dtype(name):
    """'float32'|'bfloat16'|'float16' -> jnp dtype (reference:
    credit/mixed_precision.py:4)."""
    import jax.numpy as jnp

    table = {"float32": jnp.float32, "fp32": jnp.float32,
             "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
             "float16": jnp.float16, "fp16": jnp.float16,
             "float64": jnp.float64}
    if isinstance(name, str):
        return table[name.lower()]
    return name
