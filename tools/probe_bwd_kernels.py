"""Probe the round-5 backward kernels (fused-FF VJP, conv weight-grad) on
the real TPU at flagship shapes — each probe in THIS process; run one
`--only N` per process when hunting a crash (a failed Mosaic kernel
poisons its own process; tpu-tunnel lore in docs/PERF.md).

Usage: python tools/probe_bwd_kernels.py [--only N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CASES = [
    # (name, fn_builder) — flagship stage shapes (docs/PERF.md attribution)
    ("ff_bwd s0 400x720x128h512", ("ff", (1, 400, 720, 128), 512, False)),
    ("ff_bwd s1 200x360x256h1024", ("ff", (1, 200, 360, 256), 1024, False)),
    ("ff_bwd s2 100x180x512h2048", ("ff", (1, 100, 180, 512), 2048, False)),
    ("ff_bwd s3 50x90x1024h4096", ("ff", (1, 50, 90, 1024), 4096, False)),
    ("ff_bwd fuxi 160x320x1024h4096 postnorm",
     ("ff", (1, 160, 320, 1024), 4096, True)),
    ("wgrad 8x8 415x735x240->176", ("wg", (1, 415, 735, 240),
                                    (8, 8, 240, 176))),
]


def run_case(idx: int):
    name, spec = CASES[idx]
    print(f"[{idx}] {name} ...", flush=True)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    if spec[0] == "ff":
        from credit_tpu.ops import pallas_ff

        _, shape, hidden, post = spec
        c = shape[-1]
        x = (jax.random.normal(key, shape) * 0.3).astype(jnp.bfloat16)
        ct = (jax.random.normal(key, shape) * 0.3).astype(jnp.bfloat16)
        g = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        w1 = (jax.random.normal(key, (c, hidden)) * 0.02).astype(jnp.bfloat16)
        b1 = jnp.zeros((hidden,), jnp.float32)
        w2 = (jax.random.normal(key, (hidden, c)) * 0.02).astype(jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.float32)
        outs = pallas_ff.fused_ff_bwd(x, ct, g, b, w1, b1, w2, b2,
                                      post_norm=post)
        s = float(jnp.sum(outs[0].astype(jnp.float32)))
        ok = all(bool(jnp.all(jnp.isfinite(o.astype(jnp.float32))))
                 for o in outs)
    else:
        from credit_tpu.ops import pallas_conv

        _, xshape, kshape = spec
        kh, kw = kshape[0], kshape[1]
        x = (jax.random.normal(key, xshape) * 0.3).astype(jnp.bfloat16)
        gy_shape = (xshape[0], xshape[1] - kh + 1, xshape[2] - kw + 1,
                    kshape[3])
        gy = (jax.random.normal(key, gy_shape) * 0.3).astype(jnp.bfloat16)
        gk = pallas_conv.conv2d_wgrad(x, gy, kh, kw)
        s = float(jnp.sum(gk))
        ok = bool(jnp.all(jnp.isfinite(gk)))
    print(f"[{idx}] OK in {time.time() - t0:.1f}s sum={s:.3e} "
          f"finite={ok}", flush=True)


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
