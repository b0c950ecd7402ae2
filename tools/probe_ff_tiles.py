"""Sweep the fused-FF kernel's tile knobs (_TM_MAX, _VMEM_BUDGET) on the
real TPU at the flagship stage shapes — the kernel holds 19.2 ms/step of
the 113.6 ms rollout at ~40% MXU efficiency, so tile tuning is the live
question. Times a 20x on-device scan per setting (tunnel-safe scalar
fetch, differenced against a 10x scan).

Usage: python tools/probe_ff_tiles.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [  # (B,H,W,C) per stage, hidden = 4C
    (1, 400, 720, 128),
    (1, 200, 360, 256),
    (1, 100, 180, 512),
    (1, 50, 90, 1024),
]
SETTINGS = [  # (tm_max, vmem_budget_mb)
    (1024, 48),   # shipped default
    (2048, 48),
    (4096, 48),
    (2048, 80),
    (4096, 80),
    (512, 48),
]


def bench_shape(shape):
    from credit_tpu.ops import pallas_ff as pf

    b, h, w, c = shape
    hid = 4 * c
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, shape) * 0.3).astype(jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    bb = jnp.zeros((c,), jnp.float32)
    w1 = (jax.random.normal(key, (c, hid)) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((hid,), jnp.float32)
    w2 = (jax.random.normal(key, (hid, c)) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.float32)

    for tm_max, vmem_mb in SETTINGS:
        pf._TM_MAX = tm_max
        pf._VMEM_BUDGET = vmem_mb * 1024 * 1024
        th = pf._pick_rows(h, w, c, hid, 2)
        if th is None:
            print(f"  tm_max={tm_max} vmem={vmem_mb}M: no tile", flush=True)
            continue

        def loop(n):
            def run(x0):
                def body(z, _):
                    return pf.fused_ff(z, g, bb, w1, b1, w2, b2), None
                out, _ = jax.lax.scan(body, x0, None, length=n)
                return jnp.sum(out.astype(jnp.float32))
            return jax.jit(run)

        fa, fb = loop(10), loop(30)
        try:
            t0 = time.time()
            float(fa(x))
            compile_s = time.time() - t0
            ta = tb = float("inf")
            for _ in range(2):
                t0 = time.time(); float(fa(x)); ta = min(ta, time.time() - t0)
            float(fb(x))
            for _ in range(2):
                t0 = time.time(); float(fb(x)); tb = min(tb, time.time() - t0)
            per = (tb - ta) / 20 * 1e3
            print(f"  tm_max={tm_max} vmem={vmem_mb}M th={th} "
                  f"({th * w} rows): {per:.3f} ms/call "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"  tm_max={tm_max} vmem={vmem_mb}M th={th}: "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    for shape in SHAPES:
        print(f"shape {shape} hidden={4 * shape[-1]}", flush=True)
        bench_shape(shape)


if __name__ == "__main__":
    main()
