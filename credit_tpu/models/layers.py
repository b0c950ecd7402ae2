"""Shared flax building blocks: spectrally-normalized conv/dense layers,
conv-channel LayerNorm, dynamic position bias, transformer blocks, decoder
up-blocks.

Design notes vs the reference (credit/models/wxformer/crossformer.py):
  - channels-last everywhere; 1x1 convs become Dense (identical math, better
    MXU mapping).
  - spectral norm is explicit state: `u`/`v` vectors live in the 'spectral'
    variable collection; one power iteration runs per forward when train=True
    (torch nn.utils.spectral_norm semantics: iterate in train, reuse stored
    vectors in eval — reference applies it to every conv/linear via
    apply_spectral_norm, crossformer.py:23).
  - params are fp32; compute dtype is a module attribute (bf16 for speed).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from credit_tpu.ops import conv as conv_ops
from credit_tpu.ops import window_attention as wa
from credit_tpu.ops.upsample import icnr_kernel_init, pixel_shuffle

Dtype = Any


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


# External spectral-norm mode: the u/v power-iteration update is hoisted out
# of the training graph into a separate jitted program
# (spectral_utils.power_iter_spectral) run once per optimizer step; layer
# forwards then compute sigma = u . (W v) from the FROZEN stored vectors —
# sigma stays differentiable w.r.t. W, which is exactly torch
# nn.utils.spectral_norm semantics (the hook updates u/v under no_grad, sigma
# carries grad). Motivation: the per-layer update subgraphs put the flagship
# training module over the remote-compile tunnel's ~3.7 MB body limit
# (docs/PERF.md); hoisting them removes ~0.6 MB while changing no math.
_SN_FREEZE = contextvars.ContextVar("sn_freeze", default=False)


@contextlib.contextmanager
def freeze_sn_updates(enable: bool = True):
    """Trace-time switch: inside this context, SN layers skip the in-graph
    u/v power-iteration update (train forwards still divide by the
    differentiable sigma from the stored vectors)."""
    tok = _SN_FREEZE.set(enable)
    try:
        yield
    finally:
        _SN_FREEZE.reset(tok)


class SNMixin:
    """Spectral-norm machinery shared by conv/dense layers.

    sigma = u . (W v) with W the kernel reshaped to (out_features, -1);
    matches torch's old-API spectral_norm (power iteration order:
    v = normalize(W^T u); u = normalize(W v)).
    """

    def _sn_kernel(self, kernel: jnp.ndarray, update: bool) -> jnp.ndarray:
        out_f = kernel.shape[-1]
        w2d = kernel.reshape(-1, out_f).T.astype(jnp.float32)  # (O, rest)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2norm(jax.random.normal(self.make_rng("params"), (w2d.shape[0],), jnp.float32)))
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2norm(jax.random.normal(self.make_rng("params"), (w2d.shape[1],), jnp.float32)))
        u, v = u_var.value, v_var.value
        # NOTE: at init u/v are random unit vectors; call
        # credit_tpu.models.spectral_utils.converge_spectral(variables) after
        # init (host-side numpy, no XLA cost) so sigma starts as a true
        # spectral estimate. Training forwards then keep them converged via
        # the one-step power iteration below (torch semantics).
        if update and not _SN_FREEZE.get() and not self.is_initializing():
            w_sg = jax.lax.stop_gradient(w2d)
            v = _l2norm(w_sg.T @ u)
            u = _l2norm(w_sg @ v)
            u_var.value = u
            v_var.value = v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.dot(u, w2d @ v)
        return (kernel.astype(jnp.float32) / sigma).astype(kernel.dtype)


class SNConv(nn.Module, SNMixin):
    """2-D conv, torch-style symmetric padding, optional spectral norm."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    use_bias: bool = True
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.he_uniform()
    bias_init: Callable = nn.initializers.zeros_init()
    # return the (normalized) kernel + bias instead of convolving — lets a
    # parent fuse several same-stride convs into one (CrossEmbedLayer);
    # param/state structure is identical either way, so checkpoints and
    # torch conversion are unaffected
    return_kernel: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 2
        kernel = self.param("kernel", self.kernel_init, (*ks, x.shape[-1], self.features))
        if self.use_sn:
            kernel = self._sn_kernel(kernel, update=train)
        bias = self.param("bias", self.bias_init, (self.features,)) if self.use_bias else None
        if self.return_kernel:
            return kernel, bias
        x = x.astype(self.dtype)
        return conv_ops.conv2d(x, kernel.astype(self.dtype), bias, self.strides, self.padding)


class SNConvTranspose(nn.Module, SNMixin):
    """Transposed 2-D conv with exact torch ConvTranspose2d output semantics."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (2, 2)
    padding: int = 0
    use_bias: bool = True
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.he_uniform()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 2
        # kernel stored (kh, kw, in, out); SN rows = out features is the last
        # axis, matching torch's dim=1 choice for ConvTranspose (out channels).
        kernel = self.param("kernel", self.kernel_init, (*ks, x.shape[-1], self.features))
        if self.use_sn:
            kernel = self._sn_kernel(kernel, update=train)
        bias = self.param("bias", self.bias_init, (self.features,)) if self.use_bias else None
        x = x.astype(self.dtype)
        return conv_ops.conv_transpose2d(x, kernel.astype(self.dtype), bias, self.strides, self.padding)


class SNDense(nn.Module, SNMixin):
    features: int
    use_bias: bool = True
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.he_uniform()
    bias_init: Callable = nn.initializers.zeros_init()
    # > 1: run `split_outputs` separate GEMMs against static column slices
    # of the SAME kernel and return a tuple — bit-identical to computing
    # the full GEMM then jnp.split-ing it (each output element's dot is
    # unchanged), but the concatenated activation never exists, so XLA
    # skips a full slice-copy round trip of it through HBM (~4 ms/step
    # across the flagship's qkv projections). Spectral norm still sees the
    # whole kernel, so sigma (and checkpoints) are unchanged.
    split_outputs: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, return_kernel: bool = False):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        if self.use_sn:
            kernel = self._sn_kernel(kernel, update=train)
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        if return_kernel:
            # hand the SN-processed kernel to a fused caller (pallas FF)
            return kernel, bias
        x = x.astype(self.dtype)
        acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
        # flatten to a 2-D GEMM: the TPU dot emitter runs the rank-N einsum
        # form ("...i,io") ~2.5x slower at the windowed-activation shapes
        # (measured 0.38 vs 0.15 ms on the flagship's stage-0 qkv)
        x2d = x.reshape(-1, x.shape[-1])
        kernel = kernel.astype(self.dtype)

        def gemm(k_slice, b_slice):
            y = jnp.matmul(x2d, k_slice, preferred_element_type=acc)
            y = y.reshape(*x.shape[:-1], k_slice.shape[-1]).astype(self.dtype)
            if b_slice is not None:
                y = y + b_slice.astype(self.dtype)
            return y

        if self.split_outputs == 1:
            return gemm(kernel, bias)
        f = self.features // self.split_outputs
        return tuple(
            gemm(kernel[:, i * f:(i + 1) * f],
                 None if bias is None else bias[i * f:(i + 1) * f])
            for i in range(self.split_outputs))


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with biased variance, eps 1e-5.

    Equivalent to the reference's conv-channel LayerNorm
    (crossformer.py:221) in channels-last layout. Stats in fp32.
    """

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        g = self.param("scale", nn.initializers.ones_init(), (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros_init(), (x.shape[-1],))
        if return_params:
            return g, b
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * g + b).astype(self.dtype)


class GroupNorm(nn.Module):
    """GroupNorm matching torch defaults (eps=1e-5), channels-last."""

    num_groups: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param("scale", nn.initializers.ones_init(), (c,))
        b = self.param("bias", nn.initializers.zeros_init(), (c,))
        shape = x.shape
        xf = x.astype(jnp.float32).reshape(shape[0], -1, self.num_groups, c // self.num_groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(shape)
        return (y * g + b).astype(self.dtype)


class DynamicPositionBias(nn.Module):
    """MLP on relative (dy, dx) offsets -> scalar bias per offset.

    Structure parity with reference crossformer.py:197: three
    Linear+LayerNorm+ReLU blocks then Linear->1. All linears spectrally
    normalized like the rest of the model.
    """

    dim: int
    use_sn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rel: jnp.ndarray, train: bool = False):
        x = rel.astype(self.dtype)
        for i in range(3):
            x = SNDense(self.dim, use_sn=self.use_sn, dtype=self.dtype, name=f"fc{i}")(x, train)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        x = SNDense(1, use_sn=self.use_sn, dtype=self.dtype, name="fc_out")(x, train)
        return x[..., 0]


class WindowAttention(nn.Module):
    """Short (windowed) or long (dilated-grid) multi-head attention.

    Pre-norm + qkv projection + windowed attention with dynamic relative
    position bias + output projection (reference crossformer.py:254 Attention).
    """

    dim: int
    attn_type: str  # 'short' | 'long'
    window_size: int
    dim_head: int = 32
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        wsz = self.window_size
        heads = self.dim // self.dim_head
        inner = heads * self.dim_head

        x = ChannelLayerNorm(dtype=self.dtype, name="norm")(x)

        xw = wa.window_partition(x, wsz, self.attn_type)  # (b, nwin, t, c)
        q, k, v = SNDense(inner * 3, use_bias=False, use_sn=self.use_sn,
                          dtype=self.dtype, split_outputs=3,
                          name="to_qkv")(xw, train)

        # The dynamic-position-bias table depends only on params and the
        # STATIC offset grid — it is loop-invariant across an autoregressive
        # rollout, yet as ~4 tiny kernels x ~35 attention layers it costs
        # ~4 ms/step on a v5e. Cache protocol: an apply with
        # mutable=["dpb_cache"] computes the (T, T) table and stores it;
        # later applies that carry the collection read it back and skip the
        # MLP entirely. Training applies (no cache passed) always compute,
        # so gradients flow through the DPB params.
        fill = self.is_mutable_collection("dpb_cache") and not self.is_initializing()
        if self.has_variable("dpb_cache", "bias") and not fill:
            bias = self.get_variable("dpb_cache", "bias")
        else:
            # dynamic position bias: tiny MLP on the static offset grid
            rel = jnp.asarray(wa.relative_position_grid(wsz))
            biases = DynamicPositionBias(self.dim // 4, use_sn=self.use_sn,
                                         dtype=jnp.float32, name="dpb")(rel, train)
            idx = jnp.asarray(wa.relative_position_index(wsz))
            # reference indexes the (2w-1)^2 sub-table out of the (2w+1)^2 grid
            # (crossformer.py:356-361): bias table is biases[rel_pos_indices] where
            # rel_pos_indices was built with stride (2*wsz - 1). Reproduce exactly:
            bias = biases[idx]
            if fill:
                cache = self.variable("dpb_cache", "bias", lambda: bias)
                cache.value = bias

        if self.use_pallas:
            from credit_tpu.ops.pallas_attention import fused_window_attention

            out = fused_window_attention(q, k, v, bias, heads)
        else:
            out = wa.window_attention(q, k, v, bias, heads)
        out = SNDense(self.dim, use_sn=self.use_sn, dtype=self.dtype,
                      name="to_out")(out, train)
        return wa.window_unpartition(out, wsz, h, w, self.attn_type)


class FeedForward(nn.Module):
    """x + (LN -> Dense(4d) -> GELU(exact) -> Dense(d))(x) — the FF block
    WITH its residual (reference crossformer.py:234 FeedForward + the
    residual add at :406).

    With fuse='auto' the block can run as ONE fused Pallas kernel on a
    single-chip TPU at inference (ops/pallas_ff.py): x read once, result
    written once, vs the XLA path's ~1.6 GB/block HBM round-trips at
    flagship stage-0 — 2.1x faster per block in isolation. Default is
    'never' BY MEASUREMENT: any pallas call downstream of a cross-embed
    conv flips that conv onto a ~4x slower emitter (see
    CrossFormer.ff_fusion and docs/PERF.md). Kernel numerics: f32
    accumulation where the XLA bf16 path rounds (bf16 outputs differ ~1 ulp).
    """

    dim: int
    mult: int = 4
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    # 'never' (XLA path, default — see CrossFormer.ff_fusion for the
    # measured conv interplay) | 'auto' (single-chip TPU inference) |
    # 'force' (CPU tests)
    fuse: str = "never"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from credit_tpu.ops import pallas_ff

        norm = ChannelLayerNorm(dtype=self.dtype, name="norm")
        fc1 = SNDense(self.dim * self.mult, use_sn=self.use_sn,
                      dtype=self.dtype, name="fc1")
        fc2 = SNDense(self.dim, use_sn=self.use_sn, dtype=self.dtype,
                      name="fc2")

        c = x.shape[-1]
        hidden = self.dim * self.mult
        x = x.astype(self.dtype)
        # 'auto' applies in TRAIN mode too (round 5): fused_ff_diff's VJP
        # is the in-kernel Pallas backward on TPU (exact-parity-tested,
        # XLA-recompute fallback elsewhere), and together with the conv-
        # grad kernels the measured flagship step is 537 -> 440 ms
        # (docs/PERF.md round-5 training table)
        fused = ((self.fuse == "force"
                  or (self.fuse == "auto" and pallas_ff.fuse_ok_auto()))
                 and not self.is_initializing()
                 and pallas_ff.ff_fits_shape(x.shape, hidden,
                                             x.dtype.itemsize))
        if fused:
            g, b = norm(x, return_params=True)
            w1, b1 = fc1(x, train, return_kernel=True)
            w2, b2 = fc2(jnp.zeros((1, hidden), x.dtype), train,
                         return_kernel=True)
            # pass x in its natural (B, H, W, C) form — see fused_ff's
            # layout note
            return pallas_ff.fused_ff_diff(
                x, g, b, w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, False)
        y = norm(x)
        y = fc1(y, train)
        y = nn.gelu(y, approximate=False)
        y = fc2(y, train)
        return x + y


class TransformerBlock(nn.Module):
    """One (short-attn, FF, long-attn, FF) residual group — the scan body
    for scan_blocks mode (carry-only signature for nn.scan)."""

    dim: int
    local_window_size: int
    global_window_size: int
    dim_head: int = 32
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    ff_fuse: str = "never"
    train: bool = False

    @nn.compact
    def __call__(self, x, _=None):
        blocks = [
            WindowAttention(self.dim, "short", self.local_window_size,
                            self.dim_head, self.use_sn, self.dtype,
                            self.use_pallas, name="short_attn"),
            FeedForward(self.dim, use_sn=self.use_sn, dtype=self.dtype,
                        fuse=self.ff_fuse, name="short_ff"),
            WindowAttention(self.dim, "long", self.global_window_size,
                            self.dim_head, self.use_sn, self.dtype,
                            self.use_pallas, name="long_attn"),
            FeedForward(self.dim, use_sn=self.use_sn, dtype=self.dtype,
                        fuse=self.ff_fuse, name="long_ff"),
        ]
        for blk in blocks:
            # FeedForward includes its residual (fused-kernel friendly);
            # attention blocks still add it here
            res = not isinstance(blk, FeedForward)
            y = blk(x, self.train)
            x = y + x if res else y
        return x, None


class Transformer(nn.Module):
    """depth x (short-attn, FF, long-attn, FF) with residuals
    (reference crossformer.py:406).

    scan_blocks=True runs the depth identical blocks as ONE lax.scan body
    over stacked parameters (the scan-over-layers idiom): the compiled
    module carries one block graph instead of `depth` copies — the lever
    that fits the 124M flagship TRAINING graph under the remote-compile
    size ceiling, and cuts compile time ~linearly in depth. Parameter
    layout changes (blocks/<name> stacked on a leading depth axis);
    spectral_utils.stack_block_params converts between layouts.
    """

    dim: int
    depth: int
    local_window_size: int
    global_window_size: int
    dim_head: int = 32
    use_sn: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    use_pallas: bool = False
    ff_fuse: str = "never"
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.scan_blocks and self.depth > 1:
            body = TransformerBlock
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(
                body,
                variable_axes={"params": 0, "spectral": 0, "dpb_cache": 0},
                split_rngs={"params": True, "noise": True},
                length=self.depth,
                metadata_params={nn.meta.PARTITION_NAME: None})
            x, _ = scan(self.dim, self.local_window_size,
                        self.global_window_size, self.dim_head, self.use_sn,
                        self.dtype, self.use_pallas, self.ff_fuse, train,
                        name="blocks")(x, None)
            return x
        for i in range(self.depth):
            blocks = [
                WindowAttention(self.dim, "short", self.local_window_size,
                                self.dim_head, self.use_sn, self.dtype,
                                self.use_pallas, name=f"short_attn{i}"),
                FeedForward(self.dim, use_sn=self.use_sn, dtype=self.dtype,
                            fuse=self.ff_fuse, name=f"short_ff{i}"),
                WindowAttention(self.dim, "long", self.global_window_size,
                                self.dim_head, self.use_sn, self.dtype,
                                self.use_pallas, name=f"long_attn{i}"),
                FeedForward(self.dim, use_sn=self.use_sn, dtype=self.dtype,
                            fuse=self.ff_fuse, name=f"long_ff{i}"),
            ]
            for blk in blocks:
                # FeedForward includes its residual (fused-kernel friendly);
                # attention blocks still add it here
                res = not isinstance(blk, FeedForward)
                if self.remat:
                    # bind `train` in a closure so it stays a static Python bool
                    y = nn.remat(lambda mdl, z: mdl(z, train))(blk, x)
                else:
                    y = blk(x, train)
                x = y + x if res else y
        return x


class CrossEmbedLayer(nn.Module):
    """Multi-kernel strided conv patch embed; concatenated scale pyramid
    (reference crossformer.py:167). All kernels share the stride; padding
    (k - s) // 2 keeps output H/s x W/s."""

    dim_out: int
    kernel_sizes: Sequence[int]
    stride: int = 2
    use_sn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = sorted(self.kernel_sizes)
        n = len(ks)
        dim_scales = [self.dim_out // (2 ** i) for i in range(1, n)]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]
        kmax = ks[-1]
        kb = ks[-2] if n > 1 else kmax
        # Quadrant decomposition of the largest scale: padding every kernel
        # to kmax wastes taps quadratically (the flagship's 32x32-padded
        # stage-0 embed runs 7.86M MACs/pixel where the true scales need
        # 1.41M). Instead pad only to the SECOND-largest kernel kb and split
        # the kmax kernel into (kmax/kb)^2 kb x kb blocks as extra output-
        # channel groups of the same conv; the kmax output is then the sum
        # of those groups sampled at output offsets a*kb/2 (stride 2), which
        # is exact: out32[y,x] = sum_{a,b,u,v} X[2y + a*kb + u - p32, ...]
        # K[a*kb+u, b*kb+v]. Needs (kmax-kb)/2 even so the offsets land on
        # the stride-2 grid, and kb >= 8 for the space-to-depth conv path.
        # Flagship stage-0: 2.8x fewer MACs at full 176-lane width.
        decomp = (self.stride == 2 and all(k % 2 == 0 for k in ks) and n > 1
                  and kmax >= 2 * kb and kmax % kb == 0
                  and ((kmax - kb) // 2) % 2 == 0 and kb >= 8)
        if decomp:
            q = kmax // kb
            p32 = (kmax - 2) // 2
            kbs = [SNConv(d, (k, k), (2, 2), padding=(k - 2) // 2,
                          use_sn=self.use_sn, dtype=self.dtype,
                          return_kernel=True, name=f"conv{i}")(x, train)
                   for i, (k, d) in enumerate(zip(ks, dim_scales))]
            kernels, biases = [], []
            for (kern, bias), k in zip(kbs[:-1], ks[:-1]):
                p = (kb - k) // 2
                kernels.append(jnp.pad(kern, ((p, p), (p, p), (0, 0), (0, 0))))
                biases.append(bias)
            kern_max, bias_max = kbs[-1]
            for a in range(q):
                for bq in range(q):
                    kernels.append(kern_max[a * kb:(a + 1) * kb,
                                            bq * kb:(bq + 1) * kb])
                    # the kmax bias is added once after the quadrant sum
                    biases.append(jnp.zeros_like(bias_max))
            kmerged = jnp.concatenate(kernels, axis=-1).astype(self.dtype)
            bmerged = jnp.concatenate(biases, axis=-1)
            out = conv_ops.conv2d(x.astype(self.dtype), kmerged, bmerged,
                                  stride=2, padding=p32)
            e = (kmax - kb) // 4  # grid extension vs the true output
            h2 = out.shape[1] - 2 * e
            w2 = out.shape[2] - 2 * e
            d_small = sum(dim_scales[:-1])
            dmax = dim_scales[-1]
            small = out[:, e:e + h2, e:e + w2, :d_small]
            rec = bias_max.astype(out.dtype)
            idx = 0
            for a in range(q):
                for bq in range(q):
                    c0 = d_small + idx * dmax
                    rec = rec + out[:, a * kb // 2:a * kb // 2 + h2,
                                    bq * kb // 2:bq * kb // 2 + w2,
                                    c0:c0 + dmax]
                    idx += 1
            return jnp.concatenate([small, rec], axis=-1)
        if self.stride == 2 and all(k % 2 == 0 for k in ks) and n > 1:
            # One fused conv for all scales. With padding (k-2)//2 every
            # scale's stride-2 output grid is identical and centered at the
            # same input offset, so zero-padding each kernel to kmax x kmax
            # (centered) and concatenating along output channels computes
            # the exact concat of the per-scale convs. Few-output-channel
            # convs are lane-starved on the MXU (the flagship's 16-channel
            # k=32 scale measured 19 TFLOP/s); the fused 128-channel conv
            # runs at ~79% of peak and beats the four separate convs by
            # ~40% wall clock despite the padded-tap FLOPs.
            kbs = [SNConv(d, (k, k), (2, 2), padding=(k - 2) // 2,
                          use_sn=self.use_sn, dtype=self.dtype,
                          return_kernel=True, name=f"conv{i}")(x, train)
                   for i, (k, d) in enumerate(zip(ks, dim_scales))]
            kernels = []
            biases = []
            for (kern, bias), k in zip(kbs, ks):
                p = (kmax - k) // 2
                kernels.append(jnp.pad(kern, ((p, p), (p, p), (0, 0), (0, 0))))
                biases.append(bias)
            kmerged = jnp.concatenate(kernels, axis=-1)
            bmerged = jnp.concatenate(biases, axis=-1)
            return conv_ops.conv2d(x.astype(self.dtype),
                                   kmerged.astype(self.dtype),
                                   bmerged, stride=2,
                                   padding=(kmax - 2) // 2)
        outs = []
        for i, (k, d) in enumerate(zip(ks, dim_scales)):
            outs.append(SNConv(d, (k, k), (self.stride, self.stride),
                               padding=(k - self.stride) // 2, use_sn=self.use_sn,
                               dtype=self.dtype, name=f"conv{i}")(x, train))
        return jnp.concatenate(outs, axis=-1)


class UpBlock(nn.Module):
    """ConvTranspose(2,2) upsample + residual conv stack (+GroupNorm+SiLU)
    (reference crossformer.py:92)."""

    out_chans: int
    num_groups: int
    num_residuals: int = 2
    use_sn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SNConvTranspose(self.out_chans, (2, 2), (2, 2), 0, use_sn=self.use_sn,
                            dtype=self.dtype, name="up")(x, train)
        shortcut = x
        for i in range(self.num_residuals):
            x = SNConv(self.out_chans, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                       dtype=self.dtype, name=f"res_conv{i}")(x, train)
            x = GroupNorm(self.num_groups, dtype=self.dtype, name=f"res_gn{i}")(x)
            x = nn.silu(x)
        return x + shortcut


class UpBlockPS(nn.Module):
    """PixelShuffle (sub-pixel conv, ICNR init) upsample + sharpen + residual
    stack (reference crossformer.py:136 UpBlockPS)."""

    out_chans: int
    num_groups: int
    scale: int = 2
    num_residuals: int = 2
    use_sn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = self.scale
        x = SNConv(self.out_chans * r * r, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                   dtype=self.dtype, kernel_init=icnr_kernel_init(r),
                   name="ps_conv")(x, train)
        x = pixel_shuffle(x, r)
        sharp = SNConv(self.out_chans, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                       dtype=self.dtype, kernel_init=nn.initializers.xavier_normal(),
                       name="sharp")(x, train)
        x = x + sharp
        sc = x
        for i in range(self.num_residuals):
            x = SNConv(self.out_chans, (3, 3), (1, 1), 1, use_sn=self.use_sn,
                       dtype=self.dtype, name=f"res_conv{i}")(x, train)
            x = GroupNorm(self.num_groups, dtype=self.dtype, name=f"res_gn{i}")(x)
            x = nn.silu(x)
        return x + sc


class CubeEmbedding(nn.Module):
    """Conv3d patch embed over (time, lat, lon) + LayerNorm over embed dim
    (reference crossformer.py:31). Input (B, T, H, W, C)."""

    embed_dim: int
    patch_size: Tuple[int, int, int]  # (t, lat, lon)
    use_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = self.param(
            "kernel", nn.initializers.he_uniform(),
            (*self.patch_size, x.shape[-1], self.embed_dim))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.embed_dim,))
        y = conv_ops.conv3d(x.astype(self.dtype), kernel.astype(self.dtype), bias,
                            stride=self.patch_size, padding=0)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        return y
