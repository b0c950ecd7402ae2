"""Multi-process bootstrap for multi-host TPU pods (and CPU test rigs).

TPU-native redesign of the reference's process-group setup
(reference: credit/distributed.py:32 setup / :135 distributed_model_wrapper
bootstrap; resolve_master_addr :56): instead of torch.distributed
init_process_group + NCCL, one `jax.distributed.initialize` call wires every
process into a single GSPMD runtime — afterwards `jax.devices()` is the
GLOBAL device list and one jitted step spans all hosts, with XLA inserting
ICI/DCN collectives from the NamedShardings.

Entry contract (flag/env driven, used by `credit-tpu train` and the
submit-generated launch scripts):
  CREDIT_COORDINATOR   host:port of process 0 (or conf trainer.coordinator)
  CREDIT_NUM_PROCESSES total process count   (or conf trainer.num_processes)
  CREDIT_PROCESS_ID    this process's id     (or conf trainer.process_id)
On a Cloud TPU pod slice none are needed: `jax.distributed.initialize()`
autodetects from the TPU metadata service — set trainer.distributed: auto.
"""

from __future__ import annotations

import logging
import os
import socket
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def resolve_coordinator(port: int = 29500) -> str:
    """Best-effort non-loopback rendezvous address for this host
    (reference: credit/distributed.py:56 resolve_master_addr)."""
    try:
        addr = socket.gethostbyname(socket.gethostname())
        if not addr.startswith("127."):
            return f"{addr}:{port}"
    except OSError:
        pass
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.connect(("8.8.8.8", 80))  # no packets sent; sets source addr
        return f"{s.getsockname()[0]}:{port}"
    except OSError:
        return f"127.0.0.1:{port}"
    finally:
        s.close()


def maybe_initialize(conf: Optional[dict] = None) -> bool:
    """Initialize jax.distributed when configured; idempotent.

    Returns True when running multi-process after the call. Reads (in
    priority order) explicit env vars, then trainer.{coordinator,
    num_processes, process_id}, then trainer.distributed: auto for TPU-pod
    autodetection. Single-process configs are a no-op.
    """
    global _initialized
    # do NOT call jax.process_count() here — it would initialize the XLA
    # backend, after which jax.distributed.initialize refuses to run
    already = (_initialized
               or getattr(jax.distributed, "global_state", None) is not None
               and jax.distributed.global_state.client is not None)
    if already:
        return jax.process_count() > 1
    t = (conf or {}).get("trainer", {}) or {}

    coord = os.environ.get("CREDIT_COORDINATOR") or t.get("coordinator")
    nproc = os.environ.get("CREDIT_NUM_PROCESSES") or t.get("num_processes")
    pid = os.environ.get("CREDIT_PROCESS_ID")
    if pid is None:
        pid = t.get("process_id")

    if coord and nproc is not None and pid is not None:
        n, p = int(nproc), int(pid)
        logger.info("jax.distributed.initialize(%s, num_processes=%d, "
                    "process_id=%d)", coord, n, p)
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n, process_id=p)
        _initialized = True
        return n > 1
    if os.environ.get("CREDIT_DISTRIBUTED") == "auto" or t.get("distributed") == "auto":
        logger.info("jax.distributed.initialize() [TPU pod autodetect]")
        jax.distributed.initialize()
        _initialized = True
        return jax.process_count() > 1
    return False


def is_primary() -> bool:
    """True on the process that should own host-side singleton work
    (CSV/TB logs, epoch bookkeeping, checkpoint metadata)."""
    return jax.process_index() == 0


def barrier(name: str = "credit_barrier"):
    """TRUE cross-process sync point: a psum over a GLOBAL mesh spanning
    every process's devices — each process contributes its local shard, so
    the reduction cannot complete until all processes arrive (a pmap/psum
    over local devices only would return without waiting for peers).
    Reference analogue: dist.barrier() epoch sync (credit/distributed.py)."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("all",))
    sh = NamedSharding(mesh, P("all"))
    local = np.ones((jax.local_device_count(),), np.float32)
    x = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    got = float(jax.block_until_ready(total))
    assert got == jax.device_count(), (name, got, jax.device_count())
