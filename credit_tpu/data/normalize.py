"""Per-channel z-score normalization aligned to a ChannelSchema.

Re-designs the reference's Normalize_ERA5_and_Forcing transform and the gen2
era5_normalizer preblock (reference: credit/transforms/transforms_global.py:21,
credit/preblock/norm.py:35): mean/std per variable (per level for 3-D vars),
loaded from netCDF mean/std files or given directly, applied on flat
channels-last tensors fully on device.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from credit_tpu.data.channels import ChannelSchema


class Normalizer:
    def __init__(self, input_mean, input_std, target_mean, target_std):
        self.input_mean = jnp.asarray(input_mean, jnp.float32)
        self.input_std = jnp.asarray(input_std, jnp.float32)
        self.target_mean = jnp.asarray(target_mean, jnp.float32)
        self.target_std = jnp.asarray(target_std, jnp.float32)

    # channels-last: stats broadcast over (..., C)
    def normalize_input(self, x):
        return (x - self.input_mean) / self.input_std

    def normalize_target(self, y):
        return (y - self.target_mean) / self.target_std

    def denormalize_target(self, y):
        return y * self.target_std + self.target_mean

    def denormalize_input(self, x):
        """Inverse of normalize_input (replay training stores model states
        back in physical units so they mix with fresh dataset samples)."""
        return x * self.input_std + self.input_mean

    def normalize_forcing(self, f, schema):
        """Normalize a dynamic-forcing slice with its input-channel stats
        (forcing splices into the normalized input at rollout time)."""
        idx = schema.dynamic_forcing_indices()
        if not idx:
            return f
        idx = jnp.asarray(idx)
        return (f - self.input_mean[idx]) / self.input_std[idx]

    @classmethod
    def identity(cls, schema: ChannelSchema) -> "Normalizer":
        return cls(
            np.zeros(schema.n_input), np.ones(schema.n_input),
            np.zeros(schema.n_target), np.ones(schema.n_target),
        )

    @classmethod
    def from_stats_dict(cls, schema: ChannelSchema,
                        mean: Dict[str, np.ndarray],
                        std: Dict[str, np.ndarray]) -> "Normalizer":
        """mean/std keyed by base variable name; 3-D variables map level-wise
        arrays, 2-D scalars. Channels not present in the dicts (e.g. static
        masks already normalized) get (0, 1)."""

        def stat(entries, table, default):
            out = np.full(len(entries), default, np.float32)
            for e in entries:
                base, _, lev = e.name.rpartition("_L")
                if base and lev.isdigit() and base in table:
                    arr = np.atleast_1d(np.asarray(table[base], np.float32))
                    out[e.index] = arr[int(lev)] if arr.size > 1 else arr[0]
                elif e.name in table:
                    out[e.index] = np.asarray(table[e.name], np.float32).reshape(-1)[0]
            return out

        return cls(
            stat(schema.input_entries, mean, 0.0),
            stat(schema.input_entries, std, 1.0),
            stat(schema.target_entries, mean, 0.0),
            stat(schema.target_entries, std, 1.0),
        )

    @classmethod
    def from_netcdf(cls, schema: ChannelSchema, mean_path: str, std_path: str,
                    level_coord: str = "level") -> "Normalizer":
        """Load mean/std from the reference's mean/std netCDF files
        (reference: conf data.mean_path/std_path)."""
        from credit_tpu.utils.ncio import open_dataset

        ds_m = open_dataset(mean_path)
        ds_s = open_dataset(std_path)
        mean = {v: np.asarray(ds_m[v].values) for v in ds_m.data_vars}
        std = {v: np.asarray(ds_s[v].values) for v in ds_s.data_vars}
        return cls.from_stats_dict(schema, mean, std)
