"""credit-tpu command line interface."""

from credit_tpu.cli.main import main  # noqa: F401
