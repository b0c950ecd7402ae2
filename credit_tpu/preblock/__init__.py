"""Preblock pipeline: composable input processors applied before the model.

Re-design of the reference's gen2 preblocks (reference:
credit/preblock/__init__.py:134 build_preblocks / :271 apply_preblocks;
blocks log/sqrt transforms, era5_normalizer preblock/norm.py:35, fill_values,
concat, regrid, hybrid_level_interp, semilagrangian_advection) on flat
channels-last tensors: blocks are callables x -> x with static schema
addressing, built per phase ('ic_only' runs once at t=1, 'per_step' every
rollout step — same phase contract as the reference).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp

from credit_tpu import registry
from credit_tpu.data.channels import ChannelSchema
from credit_tpu.postblock import _VarView


class BasePreblock:
    phase = "per_step"

    def __call__(self, x):
        raise NotImplementedError


@registry.register("preblock", "era5_normalizer")
class NormalizePreblock(BasePreblock):
    """z-score normalize the flat input tensor (reference preblock/norm.py)."""

    def __init__(self, schema=None, normalizer=None, **_):
        self.norm = normalizer

    def __call__(self, x):
        return self.norm.normalize_input(x)


@registry.register("preblock", "log_transform")
class LogTransform(BasePreblock):
    """log1p on selected variables (inverse pairs with postblock 'exp')."""

    def __init__(self, schema: ChannelSchema, variables: Sequence[str],
                 epsilon: float = 0.0, **_):
        self.views = [_VarView(schema, v, target=False) for v in variables]
        self.eps = epsilon

    def __call__(self, x):
        for view in self.views:
            x = view.set(x, jnp.log1p(jnp.clip(view.get(x) + self.eps, 0.0)))
        return x


@registry.register("preblock", "sqrt_transform")
class SqrtTransform(BasePreblock):
    def __init__(self, schema: ChannelSchema, variables: Sequence[str], **_):
        self.views = [_VarView(schema, v, target=False) for v in variables]

    def __call__(self, x):
        for view in self.views:
            x = view.set(x, jnp.sqrt(jnp.clip(view.get(x), 0.0)))
        return x


@registry.register("preblock", "fill_values")
class FillValues(BasePreblock):
    """Replace NaN/inf (reference preblock fill_values)."""

    def __init__(self, schema=None, fill_value: float = 0.0, **_):
        self.fill = fill_value

    def __call__(self, x):
        return jnp.where(jnp.isfinite(x), x, self.fill)


@registry.register("preblock", "clamp")
class Clamp(BasePreblock):
    """IC clamp (the trainer-side clamp in trainer_gen2)."""

    def __init__(self, schema=None, min: float = -1e4, max: float = 1e4, **_):
        self.lo, self.hi = min, max

    def __call__(self, x):
        return jnp.clip(x, self.lo, self.hi)


def build_preblocks(conf: dict, schema: ChannelSchema, normalizer=None,
                    phase: str = "per_step") -> List[Callable]:
    """Build from conf['preblocks'] = [{type:..., phase:..., args...}]."""
    blocks = []
    for entry in (conf.get("preblocks") or []):
        entry = dict(entry)
        btype = entry.pop("type")
        if entry.pop("phase", "per_step") != phase:
            continue
        cls = registry.get("preblock", btype)
        blocks.append(cls(schema=schema, normalizer=normalizer, **entry))
    return blocks


def apply_preblocks(blocks: Sequence[Callable], x):
    for b in blocks:
        x = b(x)
    return x
