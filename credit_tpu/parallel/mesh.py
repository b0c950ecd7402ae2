"""Logical device mesh: (dp, tp, domain).

TPU-native replacement for the reference's torch DeviceMesh builder
(reference: credit/parallel/mesh.py:58 build_device_mesh,
:163 parse_parallelism_conf): one jax.sharding.Mesh whose axes are
  dp     — data parallel (batch + optionally fully-sharded params, the
           FSDP/ZeRO analogue via NamedSharding)
  tp     — tensor parallel (attention heads / FFN channels)
  domain — spatial (latitude) decomposition, the reference's
           credit/domain_parallel analogue; XLA GSPMD inserts halo
           exchanges for sharded-spatial convs automatically.

Sampler contract carried over: datasets shard by dp coordinate only; tp and
domain peers receive identical batches (reference: mesh.py:115
data_parallel_coords).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "tp", "domain")


def parse_parallelism_conf(conf: dict, n_devices: Optional[int] = None) -> Tuple[int, int, int]:
    """trainer.parallelism: {data: D|'none', tensor: T, domain: S}.
    data='none'/0 -> dp inferred as n_devices // (tp * domain)."""
    p = (conf.get("trainer", {}) or {}).get("parallelism", {}) or {}
    n = n_devices if n_devices is not None else len(jax.devices())
    tp = int(p.get("tensor", 1) or 1)
    dom = int(p.get("domain", 1) or 1)
    data = p.get("data", "none")
    if data in ("none", None, 0):
        if n % (tp * dom) != 0:
            raise ValueError(f"devices={n} not divisible by tensor*domain={tp * dom}")
        dp = n // (tp * dom)
    else:
        dp = int(data)
        if dp * tp * dom != n:
            raise ValueError(
                f"parallelism {dp}x{tp}x{dom} != device count {n} "
                f"(set data: none to infer)")
    return dp, tp, dom


def build_mesh(dp: int = 1, tp: int = 1, domain: int = 1,
               devices: Optional[Sequence] = None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    need = dp * tp * domain
    if devs.size < need:
        raise ValueError(f"need {need} devices, have {devs.size}")
    grid = devs[:need].reshape(dp, tp, domain)
    return Mesh(grid, AXES)


def data_parallel_coords(mesh: Mesh) -> Tuple[int, int]:
    """(dp_rank, dp_size) for the current process — which slice of the
    dataset this host feeds. With a single-process mesh this is (0, dp)."""
    dp = mesh.shape["dp"]
    # multi-host: processes own contiguous blocks of the device grid; the dp
    # coordinate of this process's first addressable device decides its shard.
    local = mesh.local_devices[0] if mesh.local_devices.size else mesh.devices.flat[0]
    idx = list(mesh.devices.flat).index(local)
    tp_dom = mesh.shape["tp"] * mesh.shape["domain"]
    return idx // tp_dom, dp
