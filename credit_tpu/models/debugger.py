"""Shape-echo debugger model (reference: credit/models/debugger_model.py).

Maps (B, T, H, W, C_in) -> (B, T_out, H, W, C_out) with a single 1x1 linear
layer so the full data/trainer/rollout pipeline can be exercised cheaply.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry
from credit_tpu.models.base import BaseModel, channels_to_frames, frames_to_channels


@registry.register("model", "debugger")
class DebuggerModel(BaseModel):
    image_height: int = 181
    image_width: int = 360
    frames: int = 1
    output_frames: int = 1
    channels: int = 4
    surface_channels: int = 4
    input_only_channels: int = 4
    output_only_channels: int = 0
    levels: int = 18
    compute_dtype: Any = jnp.float32

    @property
    def base_input_channels(self) -> int:
        return self.channels * self.levels + self.surface_channels + self.input_only_channels

    @property
    def base_output_channels(self) -> int:
        return self.channels * self.levels + self.surface_channels + self.output_only_channels

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = frames_to_channels(x)
        out_ch = self.base_output_channels * self.output_frames
        y = nn.Dense(out_ch, dtype=self.compute_dtype, name="proj")(x)
        return channels_to_frames(y, self.output_frames)
