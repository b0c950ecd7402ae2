"""Probe conv_small_pad4 on the real TPU at exactly the small-kernel
flagship shapes that crash the blocked Mosaic kernel un-padded
(docs/PERF.md: 2x2 at 201x361x512 and 101x181x1024, 3x3 at 202x362x256 —
no geometry discriminator found across 16 un-padded variants). If the
padded-to-4x4 forms run, CREDIT_SMALL_CONV=pad4 eliminates im2col's
patch-concat materialization (~8.8 ms/step flagship).

Usage: python tools/probe_small_pad4.py [--only N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CASES = [
    ((1, 201, 361, 512), (2, 2, 512, 256)),
    ((1, 101, 181, 1024), (2, 2, 1024, 512)),
    ((1, 202, 362, 256), (3, 3, 256, 256)),
    ((1, 403, 723, 128), (3, 3, 128, 128)),   # decoder-head-ish
]


def run_case(idx: int):
    from credit_tpu.ops import pallas_conv as pc

    xshape, kshape = CASES[idx]
    print(f"[{idx}] x{xshape} k{kshape} ...", flush=True)
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, xshape) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(key, kshape) * 0.05).astype(jnp.bfloat16)
    t0 = time.time()
    y = pc.conv_small_pad4(x, k)
    if y is None:
        print(f"[{idx}] UNSUPPORTED (tile does not fit)", flush=True)
        return
    s = float(jnp.sum(y.astype(jnp.float32)))
    ref = pc.im2col_conv(x, k)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    # timing: best of 3 fetches of a jitted 20x scan sum (tunnel-safe
    # scalar; the scan amortizes dispatch+fetch overhead)
    def reps(fn):
        def run(a, b):
            def body(c, _):
                return c + fn(a, b), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=20)
            return out
        return jax.jit(run)

    f = reps(lambda a, b: jnp.sum(pc.conv_small_pad4(a, b)
                                  .astype(jnp.float32)))
    g = reps(lambda a, b: jnp.sum(pc.im2col_conv(a, b).astype(jnp.float32)))

    def timed(fn):
        float(fn(x, k))  # compile
        best = float("inf")
        for _ in range(3):
            t = time.time()
            float(fn(x, k))
            best = min(best, time.time() - t)
        return best / 20

    tp, ti = timed(f), timed(g)
    print(f"[{idx}] OK in {time.time() - t0:.1f}s sum={s:.3e} "
          f"maxerr_vs_im2col={err:.2e} pad4={tp * 1e3:.2f}ms "
          f"im2col={ti * 1e3:.2f}ms", flush=True)


def main():
    only = None
    if "--only" in sys.argv:
        only = int(sys.argv[sys.argv.index("--only") + 1])
    print("devices:", jax.devices(), flush=True)
    for i in range(len(CASES)):
        if only is not None and i != only:
            continue
        run_case(i)


if __name__ == "__main__":
    main()
