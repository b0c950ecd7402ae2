"""Microbenchmarks for the flagship hot path on the real TPU.

Times candidate implementations of the FF (LN->fc1->gelu->fc2) chain and the
windowed-attention chain at flagship stage shapes. Uses the N-vs-2N scan
differencing protocol (the axon tunnel returns from block_until_ready at
enqueue, so only host fetches synchronize).

Run:  python tools/bench_micro.py [ff|attn]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from credit_tpu.ops import window_attention as wa


def timed(fn, carry0, reps_a=10, reps_b=30):
    """Wall-clock per-rep via scan-differencing: time(reps_b) - time(reps_a).

    fn: carry -> carry (same shape/dtype)."""

    def loop(n):
        def run(x0):
            y, _ = jax.lax.scan(lambda c, _: (fn(c), ()), x0, None, length=n)
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(run).lower(carry0).compile()

    ca = loop(reps_a)
    cb = loop(reps_b)
    float(ca(carry0))  # warm
    float(cb(carry0))
    t0 = time.time(); sa = float(ca(carry0)); ta = time.time() - t0
    t0 = time.time(); _ = float(cb(carry0)); tb = time.time() - t0
    per = (tb - ta) / (reps_b - reps_a) * 1e3
    return per, sa


# ---------------- FF chain ----------------

def ln(x, barrier: bool):
    if barrier:
        x = jax.lax.optimization_barrier(x)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return y.astype(x.dtype)


def ff_chain(w1, w2, barrier, x):
    # 4 sequential FF blocks with residuals, like one transformer depth's
    # worth of FFs at a stage
    for _ in range(4):
        y = ln(x, barrier)
        m = x.shape[-1]
        y2 = jnp.matmul(y.reshape(-1, m), w1, preferred_element_type=y.dtype)
        y2 = jax.nn.gelu(y2, approximate=False)
        y3 = jnp.matmul(y2, w2, preferred_element_type=y2.dtype)
        x = x + y3.reshape(x.shape)
    return x


def bench_ff():
    key = jax.random.PRNGKey(0)
    for (h, w, c) in [(400, 720, 128), (200, 360, 256)]:
        x = (jax.random.normal(key, (1, h, w, c)) * 0.1).astype(jnp.bfloat16)
        w1 = (jax.random.normal(key, (c, 4 * c)) * 0.02).astype(jnp.bfloat16)
        w2 = (jax.random.normal(key, (4 * c, c)) * 0.02).astype(jnp.bfloat16)
        for barrier in (False, True):
            per, s = timed(partial(ff_chain, w1, w2, barrier), x)
            gf = 4 * 2 * 2 * h * w * c * 4 * c / 1e9  # 4 blocks x 2 GEMMs
            print(f"FF {h}x{w}x{c} barrier={barrier}: {per:7.3f} ms "
                  f"({gf / per:6.1f} TF/s) sum={s:.3e}", flush=True)


# ---------------- attention chain ----------------

def attn_chain_base(wqkv, wout, bias, heads, variant, x):
    """x: (b, nwin, t, c). qkv proj -> attention -> out proj, residual."""
    b, n, t, c = x.shape
    dh = 32
    inner = heads * dh
    x2d = x.reshape(-1, c)
    f = inner
    qh, kh, vh = [jnp.matmul(x2d, wqkv[:, i * f:(i + 1) * f],
                             preferred_element_type=x.dtype)
                  .reshape(b, n, t, inner) for i in range(3)]
    if variant == "einsum":  # current production path
        out = wa.window_attention(qh, kh, vh, bias, heads)
    elif variant == "pretranspose":
        def tr(z):
            return z.reshape(b, n, t, heads, dh).transpose(0, 1, 3, 2, 4)
        q, k, v = tr(qh) * (dh ** -0.5), tr(kh), tr(vh)
        sim = jnp.einsum("bnhid,bnhjd->bnhij", q, k,
                         preferred_element_type=jnp.bfloat16)
        attn = jax.nn.softmax(sim + bias.astype(sim.dtype), axis=-1)
        o = jnp.einsum("bnhij,bnhjd->bnhid", attn, v,
                       preferred_element_type=x.dtype)
        out = o.transpose(0, 1, 3, 2, 4).reshape(b, n, t, inner)
    elif variant == "headmajor":
        # keep heads MAJOR through the whole chain: one transpose in, one out
        def tr(z):  # (b,n,t,h,d) -> (h, b, n, t, d)
            return z.reshape(b, n, t, heads, dh).transpose(3, 0, 1, 2, 4)
        q, k, v = tr(qh) * (dh ** -0.5), tr(kh), tr(vh)
        sim = jnp.einsum("hbnid,hbnjd->hbnij", q, k,
                         preferred_element_type=jnp.bfloat16)
        attn = jax.nn.softmax(sim + bias.astype(sim.dtype), axis=-1)
        o = jnp.einsum("hbnij,hbnjd->hbnid", attn, v,
                       preferred_element_type=x.dtype)
        out = o.transpose(1, 2, 3, 0, 4).reshape(b, n, t, inner)
    elif variant == "grouped":
        # round-5 grouped block-diagonal Pallas kernel
        from credit_tpu.ops.pallas_attention import fused_window_attention

        out = fused_window_attention(qh, kh, vh, bias, heads)
    elif variant == "vpu":
        # tiny-T reformulation: scores as broadcast-multiply-reduce (VPU
        # elementwise) instead of tens of thousands of latency-bound tiny
        # batched matmuls. Only sane when t*t*dh per window is small.
        def tr(z):
            return z.reshape(b, n, t, heads, dh)
        q, k, v = tr(qh) * (dh ** -0.5), tr(kh), tr(vh)
        sim = (q[:, :, :, None] * k[:, :, None, :, :]).sum(-1)  # (b,n,i,j,h)
        sim = sim + bias[None, None, :, :, None].astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=3)
        o = (attn[..., None] * v[:, :, None]).sum(3)            # (b,n,i,h,d)
        out = o.reshape(b, n, t, inner)
    elif variant == "flat3d":
        # flatten the batch dims so XLA sees ONE 3-D batched matmul
        def tr(z):
            return (z.reshape(b * n, t, heads, dh)
                    .transpose(0, 2, 1, 3).reshape(b * n * heads, t, dh))
        q, k, v = tr(qh) * (dh ** -0.5), tr(kh), tr(vh)
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)
        attn = jax.nn.softmax(sim + bias.astype(sim.dtype), axis=-1)
        o = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(v.dtype)
        out = (o.reshape(b * n, heads, t, dh).transpose(0, 2, 1, 3)
               .reshape(b, n, t, inner))
    else:
        raise ValueError(variant)
    y = jnp.matmul(out.reshape(-1, inner), wout,
                   preferred_element_type=x.dtype).reshape(b, n, t, c)
    return x + y


def bench_attn():
    key = jax.random.PRNGKey(0)
    cases = [
        # flagship 0.25-deg stage shapes: (name, nwin, T, C, heads)
        ("stage0-short", 2880, 100, 128, 4),
        ("stage1-short", 720, 100, 256, 8),
        ("stage2-short", 180, 100, 512, 16),
        ("stage3-short", 45, 100, 1024, 32),
        ("stage1-long", 2880, 25, 256, 8),
        ("stage2-long", 4500, 4, 512, 16),
    ]
    variants = ("einsum", "vpu", "flat3d") if "-v" not in sys.argv else (
        "einsum", "pretranspose", "headmajor", "grouped", "vpu", "flat3d")
    for name, n, t, c, heads in cases:
        inner = heads * 32
        x = (jax.random.normal(key, (1, n, t, c)) * 0.1).astype(jnp.bfloat16)
        wqkv = (jax.random.normal(key, (c, inner * 3)) * 0.02).astype(jnp.bfloat16)
        wout = (jax.random.normal(key, (inner, c)) * 0.02).astype(jnp.bfloat16)
        bias = (jax.random.normal(key, (t, t)) * 0.1).astype(jnp.float32)
        for variant in variants:
            per, s = timed(partial(attn_chain_base, wqkv, wout, bias, heads,
                                   variant), x)
            print(f"attn {name} {variant:13s}: {per:7.3f} ms sum={s:.3e}",
                  flush=True)


def bench_ffk():
    """Fused Pallas FF kernel vs the XLA chain at flagship stage shapes."""
    from credit_tpu.ops.pallas_ff import ff_fits, fused_ff

    key = jax.random.PRNGKey(0)
    for (h, w, c) in [(400, 720, 128), (200, 360, 256), (100, 180, 512), (50, 90, 1024)]:
        m = h * w
        x = (jax.random.normal(key, (1, h, w, c)) * 0.1).astype(jnp.bfloat16)
        g = jnp.ones((c,), jnp.float32)
        bb = jnp.zeros((c,), jnp.float32)
        w1 = (jax.random.normal(key, (c, 4 * c)) * 0.02).astype(jnp.bfloat16)
        b1 = jnp.zeros((4 * c,), jnp.float32)
        w2 = (jax.random.normal(key, (4 * c, c)) * 0.02).astype(jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.float32)
        print(f"fits({m},{c}): {ff_fits(m, c, 4 * c)}", flush=True)

        def chain_pallas(x_):
            y = x_.reshape(m, c)
            for _ in range(4):
                y = fused_ff(y, g, bb, w1, b1, w2, b2)
            return y.reshape(x_.shape)

        per, s = timed(chain_pallas, x)
        gf = 4 * 2 * 2 * m * c * 4 * c / 1e9
        print(f"FFK {h}x{w}x{c} pallas : {per:7.3f} ms ({gf / per:6.1f} TF/s) "
              f"sum={s:.3e}", flush=True)
        per, s = timed(partial(ff_chain, w1, w2, False), x)
        print(f"FFK {h}x{w}x{c} xla    : {per:7.3f} ms ({gf / per:6.1f} TF/s) "
              f"sum={s:.3e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if which in ("ff", "all"):
        bench_ff()
    if which in ("attn", "all"):
        bench_attn()
    if which == "ffk":
        bench_ffk()
