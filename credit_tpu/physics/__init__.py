"""Physics & grid numerics: pressure integrals, conservation fixers, SHT,
polar filtering, stochastic physics."""

from credit_tpu.physics import constants  # noqa: F401
