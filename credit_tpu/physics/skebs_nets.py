"""Learned SKEBS backscatter-rate networks (flax).

Re-designs the reference's backscatter predictors
(reference: credit/skebs.py:37 BackscatterFCNN, :64 BackscatterFCNNWide,
:110 BackscatterCNN, :174 BackscatterUnet, :225 BackscatterFixedCol,
:242 BackscatterPrescribed) as channels-last flax modules: input is the
flat physical input state (B, lat, lon, C_in), output a non-negative
per-level backscatter rate (B, lat, lon, L). Trainable parameters flow
through the train step under params['_postblocks'] so AdamW updates them
with the model (the reference trains them inside the model's postblock).

The reference's smp (segmentation-models-pytorch) pretrained-encoder Unet
is replaced by a small from-scratch conv U-Net — pretrained ImageNet
encoders are neither available offline nor meaningful for TPU-native
training from scratch.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from credit_tpu import registry


def _earth_pad(x, p: int = 1):
    """Circular lon + 180-shifted replication lat (reference
    BackscatterCNN.pad, skebs.py:131): cross-pole columns wrap halfway
    around in longitude."""
    nlon = x.shape[-2]
    top = jnp.roll(x[:, :1], nlon // 2, axis=-2)
    bot = jnp.roll(x[:, -1:], nlon // 2, axis=-2)
    x = jnp.concatenate([top, x, bot], axis=1)
    return jnp.concatenate([x[:, :, -p:], x, x[:, :, :p]], axis=2)


@registry.register("skebs_net", "fcnn")
class BackscatterFCNN(nn.Module):
    """Two-layer pointwise MLP (reference skebs.py:37)."""

    levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.relu(nn.Dense(max(c // 2, 1), dtype=self.dtype, name="fc1")(x))
        return nn.relu(nn.Dense(self.levels, dtype=self.dtype, name="fc2")(x))


@registry.register("skebs_net", "fcnn_wide")
class BackscatterFCNNWide(nn.Module):
    """Four-layer wide MLP, output clamped at 1000 (reference skebs.py:64)."""

    levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        for i, width in enumerate((2 * c, 4 * c, 2 * c)):
            x = nn.relu(nn.Dense(width, dtype=self.dtype, name=f"fc{i + 1}")(x))
        x = nn.relu(nn.Dense(self.levels, dtype=self.dtype, name="fc4")(x))
        return jnp.minimum(x, 1000.0)


@registry.register("skebs_net", "cnn")
class BackscatterCNN(nn.Module):
    """3x3 conv with earth padding + sigmoid (reference skebs.py:110)."""

    levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _earth_pad(x, 1)
        x = nn.Conv(self.levels, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv")(x)
        return nn.sigmoid(x)


@registry.register("skebs_net", "unet")
class BackscatterUnet(nn.Module):
    """Small 2-level conv U-Net + relu output (replaces the reference's
    smp pretrained-encoder Unet, skebs.py:174)."""

    levels: int
    width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        ph, pw = (-h) % 4, (-w) % 4
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        c1 = nn.relu(nn.Conv(self.width, (3, 3), dtype=self.dtype,
                             name="enc1")(x))
        d1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = nn.relu(nn.Conv(2 * self.width, (3, 3), dtype=self.dtype,
                             name="enc2")(d1))
        d2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
        b = nn.relu(nn.Conv(4 * self.width, (3, 3), dtype=self.dtype,
                            name="mid")(d2))
        u2 = jax.image.resize(b, (b.shape[0], c2.shape[1], c2.shape[2],
                                  b.shape[3]), "nearest")
        c3 = nn.relu(nn.Conv(2 * self.width, (3, 3), dtype=self.dtype,
                             name="dec2")(jnp.concatenate([u2, c2], -1)))
        u1 = jax.image.resize(c3, (c3.shape[0], c1.shape[1], c1.shape[2],
                                   c3.shape[3]), "nearest")
        c4 = nn.relu(nn.Conv(self.width, (3, 3), dtype=self.dtype,
                             name="dec1")(jnp.concatenate([u1, c1], -1)))
        out = nn.Conv(self.levels, (1, 1), dtype=self.dtype, name="head")(c4)
        return nn.relu(out)[:, :h, :w]


@registry.register("skebs_net", "fixed_column")
class BackscatterFixedCol(nn.Module):
    """Trainable uniform-in-space column rate, init 2.5
    (reference skebs.py:225)."""

    levels: int

    @nn.compact
    def __call__(self, x):
        col = self.param("backscatter_array",
                         nn.initializers.constant(2.5), (self.levels,))
        shape = (1,) * (x.ndim - 1) + (self.levels,)
        return jnp.broadcast_to(col.reshape(shape),
                                x.shape[:-1] + (self.levels,))


@registry.register("skebs_net", "prescribed")
class BackscatterPrescribed(nn.Module):
    """Fixed (non-trainable by convention: exclude '_postblocks' from the
    optimizer mask to freeze) column profile (reference skebs.py:242)."""

    levels: int
    profile: Sequence[float] = None

    @nn.compact
    def __call__(self, x):
        init = (nn.initializers.constant(2.5) if self.profile is None else
                lambda *_: jnp.asarray(self.profile, jnp.float32))
        col = self.param("backscatter_array", init, (self.levels,))
        shape = (1,) * (x.ndim - 1) + (self.levels,)
        return jnp.broadcast_to(col.reshape(shape),
                                x.shape[:-1] + (self.levels,))


def build_backscatter_net(conf: dict, levels: int):
    """conf: {'type': fcnn|fcnn_wide|cnn|unet|fixed_column|prescribed, ...}
    (reference dispatch skebs.py:361-396)."""
    conf = dict(conf)
    kind = conf.pop("type", "fcnn")
    cls = registry.get("skebs_net", kind)
    return cls(levels=levels, **conf)
