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
    dataset this host feeds (reference: credit/parallel/mesh.py:115
    data_parallel_coords: dataset shards by the dp coordinate only; tp and
    domain peers read identical batches).

    Multi-host semantics: every dp row a process owns a device in counts as
    "fed by this process"; with one process the set is all rows and the
    caller should iterate the full dp range (rank 0 of size dp feeds
    everything — the single-host case collapses to (0, dp) handled by the
    trainer's in-step batch sharding). With multiple processes, each process
    feeds the dp rows of its addressable devices — contiguous-by-construction
    when the mesh grid lists devices in process order.
    """
    dp = mesh.shape["dp"]
    local = list(mesh.local_devices)  # Mesh.local_devices is a plain list
    if not local:
        return 0, dp
    flat = list(mesh.devices.flat)
    tp_dom = mesh.shape["tp"] * mesh.shape["domain"]
    rows = sorted({flat.index(d) // tp_dom for d in local if d in flat})
    return (rows[0] if rows else 0), dp


def local_dp_rows(mesh: Mesh) -> Tuple[int, ...]:
    """All dp rows this process owns a device of (multi-host feed contract:
    the process must supply batch shards for exactly these rows)."""
    flat = list(mesh.devices.flat)
    tp_dom = mesh.shape["tp"] * mesh.shape["domain"]
    return tuple(sorted({flat.index(d) // tp_dom
                         for d in mesh.local_devices if d in flat}))
