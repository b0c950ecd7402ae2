"""Ensemble generation: IC/model noise, bred vectors, ensemble metrics."""

from credit_tpu.ensemble.noise import (  # noqa: F401
    ColorNoise, GaussianNoise, SphericalNoise, TemporalNoise)
from credit_tpu.ensemble.bred_vector import generate_bred_vectors  # noqa: F401
