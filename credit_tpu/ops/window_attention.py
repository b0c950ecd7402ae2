"""Windowed (short) and dilated-grid (long) attention for lat-lon feature maps.

TPU-native re-design of the reference CrossFormer attention
(reference: credit/models/wxformer/crossformer.py:254-403): instead of
rearranging NCHW activations into a huge batch of tiny images and running 1x1
convs + einsums, we keep channels-last, partition windows with pure reshapes
(free at the XLA level), and run attention as one batched einsum chain that
XLA maps onto the MXU. Window token counts are tiny (w^2 = 9..100), so the
whole (qk^T -> +bias -> softmax -> @v) chain fits in VMEM and fuses.

Window semantics (matching the reference rearranges):
  short: non-overlapping w x w spatial windows  — "b (h s1) (w s2) c"
  long:  dilated grid, stride (H/w, W/w)        — "b (l1 h) (l2 w) c"
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, wsz: int, kind: str) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nWin, w*w, C).

    kind='short': contiguous windows; kind='long': dilated windows where
    window element (i, j) sits at pixel (i * H//w + h, j * W//w + w_).
    """
    b, h, w, c = x.shape
    if h % wsz or w % wsz:
        raise ValueError(
            f"window size {wsz} must divide the padded feature map ({h}x{w}) "
            f"at every stage — adjust model.local/global_window_size or "
            f"padding_conf so each stage's H and W are multiples "
            f"(see config/smoke_1deg.yml for a worked example)")
    nh, nw = h // wsz, w // wsz
    if kind == "short":
        x = x.reshape(b, nh, wsz, nw, wsz, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)        # (b, nh, nw, s1, s2, c)
    elif kind == "long":
        x = x.reshape(b, wsz, nh, wsz, nw, c)
        x = x.transpose(0, 2, 4, 1, 3, 5)        # (b, nh, nw, l1, l2, c)
    else:
        raise ValueError(kind)
    return x.reshape(b, nh * nw, wsz * wsz, c)


def window_unpartition(x: jnp.ndarray, wsz: int, h: int, w: int, kind: str) -> jnp.ndarray:
    """Inverse of window_partition: (B, nWin, w*w, C) -> (B, H, W, C)."""
    b, nwin, toks, c = x.shape
    nh, nw = h // wsz, w // wsz
    x = x.reshape(b, nh, nw, wsz, wsz, c)
    if kind == "short":
        x = x.transpose(0, 1, 3, 2, 4, 5)
    elif kind == "long":
        x = x.transpose(0, 3, 1, 4, 2, 5)
    else:
        raise ValueError(kind)
    return x.reshape(b, h, w, c)


def relative_position_index(wsz: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative-position bias table.

    Same indexing contract as the reference's rel_pos_indices buffer
    (crossformer.py:316-322).
    """
    pos = np.arange(wsz)
    grid = np.stack(np.meshgrid(pos, pos, indexing="ij"))  # (2, w, w)
    grid = grid.reshape(2, -1).T                            # (w*w, 2)
    rel = grid[:, None] - grid[None, :]                     # (w*w, w*w, 2)
    rel += wsz - 1
    return (rel[..., 0] * (2 * wsz - 1) + rel[..., 1]).astype(np.int32)


def relative_position_grid(wsz: int) -> np.ndarray:
    """((2w+1)^2, 2) float relative-offset inputs for DynamicPositionBias.

    Note the reference feeds offsets in [-w, w] — a (2w+1)^2 table — but
    indexes only the (2w-1)^2 sub-block (crossformer.py:356-361); we keep the
    identical table so converted checkpoints match bit-for-bit.
    """
    pos = np.arange(-wsz, wsz + 1, dtype=np.float32)
    g = np.stack(np.meshgrid(pos, pos, indexing="ij"))
    return g.reshape(2, -1).T  # ((2w+1)^2, 2)


# Below this token count the batched score/AV matmuls are latency-bound —
# tens of thousands of (T, dh) x (dh, T) problems far under the 128x128 MXU
# serialize per-matmul — and a VPU broadcast-multiply-reduce formulation
# wins instead. Measured on one v5e at flagship long-attention shapes
# (tools/bench_micro.py attn): T=25 4.28 -> 1.32 ms, T=4 1.80 -> 0.30 ms
# per layer; T=100 the MXU einsum stays 3.5x faster than the VPU form.
_VPU_MAX_T = 32


def _vpu_window_attention(q, k, v, bias, num_heads):
    """Tiny-T path: scores/AV as elementwise-multiply + reduce (no batched
    matmuls). Layouts keep heads in the lane dim; softmax reduces over a
    sublane axis. Exact same math as the einsum path (f32 scores)."""
    b, nwin, t, inner = q.shape
    dh = inner // num_heads
    scale = dh ** -0.5

    def split(x):
        return x.reshape(b, nwin, t, num_heads, dh)

    q, k, v = split(q * jnp.asarray(scale, q.dtype)), split(k), split(v)
    sim = (q[:, :, :, None].astype(jnp.float32)
           * k[:, :, None].astype(jnp.float32)).sum(-1)  # (b, n, i, j, h)
    sim = sim + bias[None, None, :, :, None].astype(sim.dtype)
    attn = jax.nn.softmax(sim, axis=3).astype(v.dtype)
    out = (attn[..., None] * v[:, :, None]).sum(3)       # (b, n, i, h, dh)
    return out.reshape(b, nwin, t, inner)


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, num_heads: int,
                     softmax_dtype=jnp.float32) -> jnp.ndarray:
    """Batched multi-head attention over windows.

    q, k, v: (B, nWin, T, inner) with inner = heads * dh; bias: (T, T) shared
    across batch/heads/windows (the dynamic relative-position bias).
    Returns (B, nWin, T, inner).
    """
    b, nwin, t, inner = q.shape
    dh = inner // num_heads
    if t <= _VPU_MAX_T and t > 1:
        return _vpu_window_attention(q, k, v, bias, num_heads)
    q = q.reshape(b, nwin, t, num_heads, dh)
    k = k.reshape(b, nwin, t, num_heads, dh)
    v = v.reshape(b, nwin, t, num_heads, dh)
    scale = dh ** -0.5
    if v.dtype == jnp.bfloat16:
        # bf16 models: keep the whole score path in bf16 — the MXU still
        # accumulates in f32 internally, softmax subtracts the row max for
        # stability, and the (nWin, T, T) score tensor (the dominant HBM
        # traffic of attention) is half width end-to-end. Measured 23%
        # faster than a f32-softmax variant at flagship stage-0 shapes;
        # rollout parity vs the f32 path is covered by
        # tests/test_window_attention.py.
        sim = jnp.einsum("bnihd,bnjhd->bnhij", q * scale, k,
                         preferred_element_type=jnp.bfloat16)
        sim = sim + bias.astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=-1)
        acc = v.dtype
    else:
        sim = jnp.einsum("bnihd,bnjhd->bnhij", q * scale, k,
                         preferred_element_type=softmax_dtype)
        sim = sim + bias.astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        acc = jnp.float32
    out = jnp.einsum("bnhij,bnjhd->bnihd", attn, v,
                     preferred_element_type=acc).astype(v.dtype)
    return out.reshape(b, nwin, t, inner)
