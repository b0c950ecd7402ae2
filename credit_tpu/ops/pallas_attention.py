"""Pallas TPU kernel: fused windowed multi-head attention, grouped form.

The CrossFormer hot loop is thousands of tiny attention problems (window
token counts T = w^2 of 1..100, reference crossformer.py:254-403). Two
things make the XLA composition (ops.window_attention) slow at flagship
scale:

1. HBM traffic: XLA materializes the (nWin, heads, T, T) score tensor
   between the qk^T, +bias/softmax and @v HLOs — ~576 MB per stage-2
   attention layer at 0.25 deg, by far the largest single traffic term in
   the rollout (docs/PERF.md round-4 attribution: ~33 ms/step).
2. MXU shape: each per-(window, head) matmul is (T<=100, dh=32) — far
   below the 128x128 systolic array, and a batched dot_general serializes
   them. The round-2 fused kernel hit exactly this: 3.47 ms vs XLA's
   2.36 ms at stage-0 shapes, LOSING to the HBM-bound einsum.

This kernel fixes both with a GROUPED BLOCK-DIAGONAL formulation: G
windows are concatenated along the token axis into one (G*T, dh) block,
and attention runs as ONE pair of MXU-shaped matmuls per group —
(G*T, dh) @ (dh, G*T) -> softmax -> @ (G*T, dh) — with the (T, T)
relative-position bias tiled into a (G*T, G*T) block-diagonal additive
mask whose off-diagonal blocks are -1e9. exp(-1e9 + finite) == 0, so the
full-row softmax IS the per-window softmax, and the @v contraction keeps
cross-window terms at exactly zero weight. The score tensor lives only in
VMEM; the G-fold FLOP waste is cheap because the chain is bandwidth-bound
(score FLOPs at G=8 are still < 5% of a rollout step's total).

Heads are split OUTSIDE the kernel (a lane-preserving transpose XLA
usually fuses): Mosaic cannot reshape the lane dim, and the bias table is
head-independent (the reference's DynamicPositionBias emits one scalar
per offset), so (window x head) problems group freely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One grid step: one group's (G*T, dh) q/k/v + (G*T, G*T) masked bias.

    Both dots are single 2-D matmuls — no batched serialization. Softmax
    is a lane-axis reduce; scores stay f32 in VMEM throughout.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scale = q.shape[-1] ** -0.5
    sim = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (GT, GT) f32
    sim = sim + bias_ref[:]
    m = jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (GT, dh)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_windows",
                                             "interpret"))
def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, num_heads: int,
                           block_windows: int | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, nWin, T, inner); bias: (T, T) -> (B, nWin, T, inner).

    Drop-in replacement for ops.window_attention.window_attention.
    `block_windows` is the group size G (default: targets G*T ~ 768
    tokens, a full-lane-width score matrix that fits VMEM at f32).
    """
    b, nwin, t, inner = q.shape
    dh = inner // num_heads
    total = b * nwin * num_heads
    g = block_windows or max(1, 768 // t)
    g = max(1, min(g, total))
    gt = g * t

    def split(x):
        # (B, nWin, T, H*dh) -> (B*nWin*H, T, dh); the transpose keeps dh
        # in the lane dim, so XLA lowers it as a cheap sublane shuffle
        # (usually fused into the qkv GEMM's output layout).
        x = x.reshape(b * nwin, t, num_heads, dh)
        return x.transpose(0, 2, 1, 3).reshape(total, t, dh)

    qf, kf, vf = split(q), split(k), split(v)
    pad = (-total) % g
    if pad:
        # padded problems see the same finite diagonal bias; their outputs
        # are sliced off below (no NaN path: scores are 0 + finite bias)
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    ngroups = (total + pad) // g
    qg = qf.reshape(ngroups, gt, dh)
    kg = kf.reshape(ngroups, gt, dh)
    vg = vf.reshape(ngroups, gt, dh)

    # block-diagonal bias: tile[i, j] = bias[i % T, j % T] on same-window
    # blocks, -1e9 elsewhere. Loop-invariant given bias, built in XLA once
    # per call (fuses to a tiny broadcast+select; ~GT^2 f32 of traffic).
    big = jnp.tile(bias.astype(jnp.float32), (g, g))
    row_w = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 0) // t
    col_w = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 1) // t
    big = jnp.where(row_w == col_w, big, _NEG)

    gspec = pl.BlockSpec((1, gt, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attn_kernel,
        grid=(ngroups,),
        in_specs=[gspec, gspec, gspec,
                  pl.BlockSpec((gt, gt), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=gspec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * ngroups * gt * gt * dh),
            bytes_accessed=int(4 * ngroups * gt * dh * q.dtype.itemsize),
            transcendentals=int(ngroups * gt * gt),
        ),
        interpret=interpret,
    )(qg, kg, vg, big)

    out = out.reshape(ngroups * g, t, dh)
    if pad:
        out = out[:total]
    # inverse of split: (B*nWin*H, T, dh) -> (B, nWin, T, H*dh)
    out = out.reshape(b * nwin, num_heads, t, dh).transpose(0, 2, 1, 3)
    return out.reshape(b, nwin, t, inner)
