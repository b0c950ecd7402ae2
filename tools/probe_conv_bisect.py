"""Bisect the Pallas conv2d_valid TPU-runtime failure.

The flagship's 2x2-kernel convs die with `INTERNAL: TPU backend error` at
runtime (the 8x8 stage-0 embed works). Each invocation of this script runs
ONE variant in a fresh process (failed kernels poison the process, not the
machine — probe entry [3] passed right after [2] failed).

Usage: python tools/probe_conv_bisect.py <variant-name>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: (x_shape, k_shape, dtype)
    "orig": ((1, 201, 361, 512), (2, 2, 512, 256), "bf16"),
    "f32": ((1, 201, 361, 512), (2, 2, 512, 256), "f32"),
    "cin240": ((1, 201, 361, 240), (2, 2, 240, 256), "bf16"),
    "k8": ((1, 207, 367, 512), (8, 8, 512, 256), "bf16"),
    "k3": ((1, 202, 362, 512), (3, 3, 512, 256), "bf16"),
    "narrow": ((1, 201, 105, 512), (2, 2, 512, 256), "bf16"),
    "tiny": ((1, 33, 65, 512), (2, 2, 512, 256), "bf16"),
    "k2cout176": ((1, 201, 361, 512), (2, 2, 512, 176), "bf16"),
    "k2w736": ((1, 201, 736, 512), (2, 2, 512, 256), "bf16"),
    "h415": ((1, 415, 361, 512), (2, 2, 512, 256), "bf16"),
}


def main():
    name = sys.argv[1]
    xs, ks, dt = VARIANTS[name]
    import jax
    import jax.numpy as jnp

    from credit_tpu.ops import pallas_conv as pc

    dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
    th = pc.pick_tile(xs[1] - ks[0] + 1, xs[2], xs[3], ks[3], ks[0], ks[1],
                      dtype)
    print(f"[{name}] x={xs} k={ks} {dt} -> th={th}", flush=True)
    x = (jax.random.normal(jax.random.PRNGKey(0), xs, jnp.float32) * 0.1
         ).astype(dtype)
    k = (jax.random.normal(jax.random.PRNGKey(1), ks, jnp.float32) * 0.1
         ).astype(dtype)
    fn = jax.jit(lambda a, b: pc.conv2d_valid(a, b).sum().astype(jnp.float32))
    t0 = time.time()
    try:
        val = float(fn(x, k))
        print(f"[{name}] OK value={val:.4e} ({time.time() - t0:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"[{name}] FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
