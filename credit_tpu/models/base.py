"""Base model utilities.

The reference's BaseModel (credit/models/base_model.py:12) supplies checkpoint
load/save and concat/split reshape helpers on top of nn.Module. In JAX those
concerns live outside the module (orbax checkpointing, functional params), so
our base class only standardizes construction-from-config and the
(B, T, H, W, C) <-> flat-channel reshapes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn


class BaseModel(nn.Module):
    """Common config-construction contract for all credit-tpu models."""

    @classmethod
    def from_config(cls, conf: Dict[str, Any]) -> "BaseModel":
        """Build from a gen2-style config dict; subclasses map model-section
        keys onto constructor fields."""
        mconf = dict(conf["model"])
        mconf.pop("type", None)
        fields = {f for f in cls.__dataclass_fields__}  # flax modules are dataclasses
        kwargs = {k: v for k, v in mconf.items() if k in fields}
        if isinstance(kwargs.get("compute_dtype"), str):
            kwargs["compute_dtype"] = jnp.dtype(kwargs["compute_dtype"])
        return cls(**kwargs)


def frames_to_channels(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H, W, C*T) with channel-major ordering
    (index = c*T + t), matching the reference's reshape of (B, C, T, H, W)
    to (B, C*T, H, W) (crossformer.py:696-701)."""
    b, t, h, w, c = x.shape
    if t == 1:  # pure reshape — keep XLA from emitting a transpose copy
        return x.reshape(b, h, w, c)
    return jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, h, w, c * t)


def channels_to_frames(x: jnp.ndarray, out_frames: int) -> jnp.ndarray:
    """(B, H, W, C*T) -> (B, T, H, W, C), inverse convention of the
    reference's view(b, c_base, t_out, h, w) (crossformer.py:726)."""
    b, h, w, ct = x.shape
    c = ct // out_frames
    if out_frames == 1:  # pure reshape — no transpose copy
        return x.reshape(b, 1, h, w, c)
    x = x.reshape(b, h, w, c, out_frames)
    return jnp.transpose(x, (0, 4, 1, 2, 3))
