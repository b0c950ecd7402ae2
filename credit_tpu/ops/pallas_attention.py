"""Pallas TPU kernel: fused windowed multi-head attention.

The CrossFormer hot loop is thousands of tiny attention problems (window
token counts T = w^2 of 9..100, reference crossformer.py:348-403). XLA
executes the qk^T -> +bias -> softmax -> @v chain as separate HLOs with HBM
round-trips of the (nWin, H, T, T) score tensor between them; this kernel
fuses the whole chain in VMEM, tiling the (batch x window x head) axis
across the grid so each program handles a block of per-head windows.

Mosaic layout rules shape the design: the head split (a lane-dim shape
cast) is NOT representable inside a TPU kernel, so heads are split in XLA
*outside* the kernel — the kernel sees (blockWH, T, dh) refs and runs two
batched `dot_general`s + a lane-axis softmax with no reshapes at all.

Falls back to the XLA path (ops.window_attention) for shapes that don't
tile; both paths are numerically interchangeable (see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One grid step: per-head q/k/v block (BWH, T, dh) + bias (T, T).

    The qk^T contraction is dh-deep (narrow for the MXU) but everything
    stays resident in VMEM; the score tensor never touches HBM. Softmax is
    a lane-axis reduce (T in lanes). The @v dot contracts T (full-ish
    lanes) so the second matmul runs near MXU rate.
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scale = q.shape[-1] ** -0.5
    sim = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                   # (BWH, T, T) f32
    sim = sim + bias_ref[:][None, :, :]
    m = jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                           # (BWH, T, dh)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_windows",
                                             "interpret"))
def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, num_heads: int,
                           block_windows: int = 128,
                           interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, nWin, T, inner); bias: (T, T) -> (B, nWin, T, inner).

    Drop-in replacement for ops.window_attention.window_attention. The
    head split/merge happens here in XLA (where it is a cheap — usually
    fused — transpose); the kernel grid runs over blocks of the combined
    (head, batch*window) axis, sharing the (T, T) relative-position bias.
    """
    b, nwin, t, inner = q.shape
    dh = inner // num_heads
    total = b * nwin * num_heads

    def split(x):
        # (B, nWin, T, H*dh) -> (H * B*nWin, T, dh): heads become the
        # major axis so each kernel block is one head-slice of windows.
        x = x.reshape(b * nwin, t, num_heads, dh)
        return x.transpose(2, 0, 1, 3).reshape(total, t, dh)

    qf, kf, vf = split(q), split(k), split(v)

    bw = min(block_windows, total)
    pad = (-total) % bw
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    nblocks = qf.shape[0] // bw

    spec = pl.BlockSpec((bw, t, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attn_kernel,
        grid=(nblocks,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((t, t), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * total * t * t * dh),
            bytes_accessed=int(4 * total * t * dh * q.dtype.itemsize),
            transcendentals=int(total * t * t),
        ),
        interpret=interpret,
    )(qf, kf, vf, bias.astype(jnp.float32))
    if pad:
        out = out[:total]
    # inverse of split: (H * B*nWin, T, dh) -> (B, nWin, T, H*dh)
    out = out.reshape(num_heads, b * nwin, t, dh).transpose(1, 2, 0, 3)
    return out.reshape(b, nwin, t, inner)
