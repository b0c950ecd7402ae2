"""Preflight checks run before training starts.

Re-implements the reference's preflight suite (reference:
credit/trainers/preflight.py — dataloader RAM estimate :36, first-batch
latency watchdog :109, synthetic fwd/bwd/optimizer memory probe :223) for
the JAX runtime: HBM estimates come from jitted-computation memory analyses
instead of CUDA allocator probes.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


def estimate_batch_ram(dataset, batch_size: int, forecast_len: int = 1) -> Dict[str, float]:
    """Host RAM per batch (GB) from one sample's arrays (reference :36)."""
    s = dataset.sample(dataset.history_len, forecast_len)
    nbytes = sum(v.nbytes for v in s.values() if v is not None)
    per_batch = nbytes * batch_size
    out = {"sample_mb": nbytes / 2**20, "batch_gb": per_batch / 2**30}
    logger.info("preflight: ~%.1f MB/sample, ~%.2f GB/batch host RAM",
                out["sample_mb"], out["batch_gb"])
    return out


def first_batch_watchdog(fn, timeout_s: float = 120.0, name: str = "first batch"):
    """Run fn() with a watchdog that logs if it exceeds timeout (reference
    :109 — the reference raises; we warn and keep going since JAX first-call
    time is dominated by compilation, which is expected to be slow)."""
    done = threading.Event()

    def bark():
        if not done.wait(timeout_s):
            logger.warning("preflight: %s still not ready after %.0fs "
                           "(likely XLA compilation; will keep waiting)",
                           name, timeout_s)

    t = threading.Thread(target=bark, daemon=True)
    t.start()
    t0 = time.time()
    out = fn()
    done.set()
    logger.info("preflight: %s took %.1fs", name, time.time() - t0)
    return out


def estimate_train_memory(train_step, state, batch, rng) -> Optional[Dict[str, float]]:
    """Compile the train step and read XLA's memory analysis — the TPU
    analogue of the reference's synthetic VRAM probe (:223)."""
    import jax

    try:
        lowered = jax.jit(train_step).lower(state, batch, rng)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        out = {
            "temp_gb": getattr(ma, "temp_size_in_bytes", 0) / 2**30,
            "argument_gb": getattr(ma, "argument_size_in_bytes", 0) / 2**30,
            "output_gb": getattr(ma, "output_size_in_bytes", 0) / 2**30,
        }
        logger.info("preflight: HBM estimate temp=%.2f args=%.2f out=%.2f GB",
                    out["temp_gb"], out["argument_gb"], out["output_gb"])
        return out
    except Exception as e:  # noqa: BLE001 — preflight must never block training
        logger.warning("preflight: memory analysis unavailable (%s)", e)
        return None
