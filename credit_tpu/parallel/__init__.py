"""Parallelism: device mesh, GSPMD shardings, halo exchange, collectives."""

from credit_tpu.parallel.mesh import build_mesh, parse_parallelism_conf  # noqa: F401
