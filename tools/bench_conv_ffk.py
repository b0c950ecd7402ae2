"""Micro-repro: stage-0 cross-embed conv followed by pallas fused-FF blocks.

Measures whether the pallas custom call's default-layout demand degrades the
conv emitter (observed at the flagship: 29 -> 115 ms/step), and whether a
layout firewall (transpose -> optimization_barrier -> transpose, unfoldable)
insulates the conv.

Run on TPU: python tools/bench_conv_ffk.py
"""

import time
import sys

import jax
import jax.numpy as jnp

from credit_tpu.ops.conv import conv2d
from credit_tpu.ops.pallas_ff import fused_ff


def log(m):
    print(m, flush=True)


import os

_COPTS = ({"xla_tpu_scoped_vmem_limit_kib":
           os.environ["SCOPED_VMEM_KIB"]}
          if os.environ.get("SCOPED_VMEM_KIB") else None)


def timed(fn, x, reps_a=6, reps_b=18):
    def loop(n):
        def run(x0):
            def body(c, _):
                return fn(c), ()
            y, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(run).lower(x).compile(compiler_options=_COPTS)

    ca, cb = loop(reps_a), loop(reps_b)
    float(ca(x)); float(cb(x))
    t0 = time.time(); float(ca(x)); ta = time.time() - t0
    t0 = time.time(); float(cb(x)); tb = time.time() - t0
    return (tb - ta) / (reps_b - reps_a) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    h, w, cin, c = 800, 1440, 60, 128
    # kmax-fused cross-embed-style kernel: 32x32 stride-2 (s2d path)
    kern = (jax.random.normal(key, (32, 32, cin, c)) * 0.02).astype(jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    bb = jnp.zeros((c,), jnp.float32)
    w1 = (jax.random.normal(key, (c, 4 * c)) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((4 * c,), jnp.float32)
    w2 = (jax.random.normal(key, (4 * c, c)) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.float32)

    def head(x, mode):
        y = conv2d(x, kern, None, (2, 2), 15)  # (1, 400, 720, 128)
        if mode == "firewall":
            y = y.transpose(0, 2, 1, 3)
            y = jax.lax.optimization_barrier(y)
            y = y.transpose(0, 2, 1, 3)
        return y

    def pallas_identity(y):
        import jax.experimental.pallas as pl

        def k(i_ref, o_ref):
            o_ref[...] = i_ref[...]

        b, hh, ww, cc = y.shape
        return pl.pallas_call(
            k, grid=(hh // 8,),
            in_specs=[pl.BlockSpec((1, 8, ww, cc), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, ww, cc), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype))(y)

    def make(mode, ff):
        def f(x):
            if ff == "identity-input":
                x = pallas_identity(x)
            y = head(x, mode)
            if ff == "identity":
                # trivial pallas kernel + XLA FFs: isolates "presence of a
                # custom call" from the fused-FF kernel's footprint
                y = pallas_identity(y)
            for _ in range(4):
                if ff == "pallas-t":
                    # run the kernel in transposed orientation: the conv's
                    # consumer becomes a transpose (layout-flexible copy),
                    # not the custom call
                    yt = y.transpose(0, 2, 1, 3)
                    yt = fused_ff(yt, g, bb, w1, b1, w2, b2)
                    y = yt.transpose(0, 2, 1, 3)
                elif ff == "pallas":
                    y = fused_ff(y, g, bb, w1, b1, w2, b2)
                else:
                    z = y.astype(jnp.float32)
                    mu = z.mean(-1, keepdims=True)
                    var = ((z - mu) ** 2).mean(-1, keepdims=True)
                    z = ((z - mu) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)
                    hdn = jnp.matmul(z.reshape(-1, c), w1,
                                     preferred_element_type=y.dtype)
                    hdn = jax.nn.gelu(hdn, approximate=False)
                    o = jnp.matmul(hdn, w2, preferred_element_type=y.dtype)
                    y = y + o.reshape(y.shape)
            if ff == "identity-end":
                y = pallas_identity(y)
            # keep the carry shape: reduce back to input-shaped noise
            return x + jnp.mean(y) * 0
        return f

    x = (jax.random.normal(key, (1, h, w, cin)) * 0.3).astype(jnp.bfloat16)
    which = sys.argv[1:] or ["xla", "pallas", "pallas-t"]
    for name in which:
        if name == "pallas-tiny":
            from credit_tpu.ops import pallas_ff as pf
            pf._VMEM_BUDGET = 3 * 1024 * 1024
            jax.clear_caches()
            name = "pallas"
            label = "pallas-tiny"
        else:
            label = name
        mode = "firewall" if name.endswith("firewall") else "plain"
        ff = name.split("-firewall")[0] if "-firewall" in name else name
        ms = timed(make(mode, ff), x)
        log(f"{label:18s}: {ms:7.2f} ms per (conv + 4 FF)")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
