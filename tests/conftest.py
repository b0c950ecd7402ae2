"""Test config: force CPU with 8 virtual devices so parallelism tests can
exercise a real multi-device mesh without TPU hardware (the reference's
analogue: single-process simulated shards + gated multi-GPU tests,
reference tests/test_domain_parallel.py:1-35).

NOTE on this environment: a sitecustomize hook registers the 'axon' TPU
tunnel backend in every interpreter and force-sets jax_platforms='axon,cpu'
(overriding the JAX_PLATFORMS env var). Tests must run on local CPU — the
tunnel serializes processes and host<->device transfers take ~30s — so we
override the config *after* import, which wins because backends initialize
lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
