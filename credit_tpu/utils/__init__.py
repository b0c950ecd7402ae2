"""Shared utilities: netCDF IO, seeding, dtype parsing."""
