"""Pallas TPU kernel: fused windowed multi-head attention.

The CrossFormer hot loop is thousands of tiny attention problems (window
token counts T = w^2 of 9..100, reference crossformer.py:348-403). XLA
executes the qk^T -> +bias -> softmax -> @v chain as separate HLOs with HBM
round-trips between them; this kernel fuses the whole chain in VMEM, tiling
the (batch x window) axis across the grid so each program handles a block of
windows with all heads resident.

Falls back to the XLA path (ops.window_attention) for shapes that don't
tile; both paths are numerically interchangeable (see tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads: int,
                 scale: float):
    """One grid step: q/k/v block (BW, T, H*dh) + bias (T, T) -> out block.

    The head dim is folded in the last axis; we unfold inside and run the
    chain per block. T and dh are tiny, so everything lives in registers/VMEM
    and the matmuls hit the MXU batched over (BW, H).
    """
    q = q_ref[:]  # (BW, T, H*dh)
    k = k_ref[:]
    v = v_ref[:]
    bias = bias_ref[:]  # (T, T)
    bw, t, inner = q.shape
    dh = inner // num_heads
    qh = q.reshape(bw, t, num_heads, dh).astype(jnp.float32) * scale
    kh = k.reshape(bw, t, num_heads, dh).astype(jnp.float32)
    vh = v.reshape(bw, t, num_heads, dh).astype(jnp.float32)
    sim = jax.lax.dot_general(
        qh.transpose(0, 2, 1, 3).reshape(bw * num_heads, t, dh),
        kh.transpose(0, 2, 1, 3).reshape(bw * num_heads, t, dh),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BW*H, T, T)
    sim = sim + bias[None, :, :]
    m = jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, vh.transpose(0, 2, 1, 3).reshape(bw * num_heads, t, dh),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BW*H, T, dh)
    out = out.reshape(bw, num_heads, t, dh).transpose(0, 2, 1, 3)
    o_ref[:] = out.reshape(bw, t, inner).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_windows",
                                             "interpret"))
def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, num_heads: int,
                           block_windows: int = 128,
                           interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, nWin, T, inner); bias: (T, T) -> (B, nWin, T, inner).

    Drop-in replacement for ops.window_attention.window_attention.
    """
    b, nwin, t, inner = q.shape
    dh = inner // num_heads
    scale = dh ** -0.5
    total = b * nwin
    qf = q.reshape(total, t, inner)
    kf = k.reshape(total, t, inner)
    vf = v.reshape(total, t, inner)

    bw = min(block_windows, total)
    # pad the window axis to a block multiple
    pad = (-total) % bw
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0), (0, 0)))
    nblocks = qf.shape[0] // bw

    spec = pl.BlockSpec((bw, t, inner), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, scale=scale),
        grid=(nblocks,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((t, t), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * total * num_heads * t * t * dh),
            bytes_accessed=int(4 * total * t * inner * 4),
            transcendentals=int(total * num_heads * t * t),
        ),
        interpret=interpret,
    )(qf, kf, vf, bias.astype(jnp.float32))
    if pad:
        out = out[:total]
    return out.reshape(b, nwin, t, inner)
