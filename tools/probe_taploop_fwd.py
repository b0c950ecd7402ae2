"""Forward small-conv probe: im2col (patch concat + one GEMM) vs tap-loop
(kh*kw accumulating GEMMs, NO patch tensor) at the exact flagship shapes
that materialize patches (HLO census of the 113.6 ms rollout: the cel1-3
phase-stacked embeds and the decoder up_block 3x3s — the patch tensors
round-trip ~2 extra activation volumes per conv).

Usage: python tools/probe_taploop_fwd.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# (x shape, kernel shape) — from the rollout HLO census
CASES = [
    ((1, 402, 722, 256), (3, 3, 256, 128)),    # up_block4 head
    ((1, 202, 362, 256), (3, 3, 256, 256)),    # up_block res convs
    ((1, 201, 361, 512), (1, 2, 512, 256)),    # cel1 s2d phases (2-wide)
    ((1, 201, 362, 512), (2, 2, 512, 256)),    # cel s2d phases (2x2)
    ((1, 101, 182, 1024), (2, 2, 1024, 512)),  # cel2 s2d phases
]


def taploop_conv(x, kernel):
    kh, kw, cin, cout = kernel.shape
    n, hp, wp, _ = x.shape
    ho, wo = hp - kh + 1, wp - kw + 1
    out = None
    for di in range(kh):
        for dj in range(kw):
            xs = x[:, di:di + ho, dj:dj + wo, :].reshape(-1, cin)
            y = jnp.dot(xs, kernel[di, dj],
                        preferred_element_type=jnp.float32)
            out = y if out is None else out + y
    return out.astype(x.dtype).reshape(n, ho, wo, cout)


def run_case(xshape, kshape):
    from credit_tpu.ops import pallas_conv as pc

    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, xshape) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(key, kshape) * 0.05).astype(jnp.bfloat16)

    def reps(fn):
        def run(a, b):
            def body(c, _):
                return c + jnp.sum(fn(a, b).astype(jnp.float32)), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=20)
            return out
        return jax.jit(run)

    fi = reps(pc.im2col_conv)
    ft = reps(taploop_conv)
    err = float(jnp.max(jnp.abs(
        pc.im2col_conv(x, k).astype(jnp.float32)
        - taploop_conv(x, k).astype(jnp.float32))))

    def timed(fn):
        float(fn(x, k))
        best = float("inf")
        for _ in range(3):
            t = time.time()
            float(fn(x, k))
            best = min(best, time.time() - t)
        return best / 20

    ti, tt = timed(fi), timed(ft)
    print(f"x{xshape} k{kshape}: im2col={ti * 1e3:.3f}ms "
          f"taploop={tt * 1e3:.3f}ms maxerr={err:.1e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    for xs, ks in CASES:
        run_case(xs, ks)


if __name__ == "__main__":
    main()
