"""Functional 2-D convolution primitives, channels-last (NHWC / HWIO).

These wrap lax.conv_general_dilated with the exact output-size semantics of
the reference's torch layers (reference: credit/models/wxformer/crossformer.py
uses Conv2d(k, stride, padding=(k-s)//2) for patch embeds and
ConvTranspose2d(k=2,s=2) / (k=4,s=2,p=1) for the decoder), so converted
checkpoints produce identical activations. The MXU path: XLA lowers these to
implicit-GEMM convs on the systolic array; keep channels a multiple of 128
where possible for full tiling.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# When set, stride-1 VALID convs route through the blocked Pallas kernel
# (ops/pallas_conv.py) and 1x1 convs become plain GEMMs, so NO XLA conv
# emitter appears in the graph. This is what lets the fused-FF Pallas
# kernel turn on without flipping XLA's convs onto their ~4x slower
# emitter (docs/PERF.md). Trace-time static: enter the context around the
# model body (CrossFormer.pallas_conv).
_PALLAS_CONVS = contextvars.ContextVar("pallas_convs", default=False)


@contextlib.contextmanager
def pallas_convs(enable: bool = True):
    tok = _PALLAS_CONVS.set(bool(enable))
    try:
        yield
    finally:
        _PALLAS_CONVS.reset(tok)


def pallas_convs_active() -> bool:
    """True inside a pallas_convs() region — i.e. the surrounding graph is
    conv-emitter-free, so downstream Pallas kernels (fused FF) cannot flip
    any XLA conv onto the slow emitter."""
    return bool(_PALLAS_CONVS.get())


# When set to (mesh, axis), size-preserving stride-1 convs route through an
# EXPLICIT shard_map halo exchange (parallel/halo.py ppermute ring) instead
# of GSPMD's auto-inserted halos. The explicit ring compiles to 3x fewer
# collective-permutes than GSPMD's per-segment permutes (docs/PERF.md halo
# table); production default stays GSPMD until the advantage is confirmed
# on real multi-chip ICI. Enabled from config via trainer.parallelism:
# {halo: explicit} (reference analogue: credit/domain_parallel/
# halo_exchange.py:20 — the reference's domain path is ALWAYS explicit).
_EXPLICIT_HALO = contextvars.ContextVar("explicit_halo", default=None)


@contextlib.contextmanager
def explicit_halo(mesh, axis: str = "domain"):
    """Trace-time context: lat-sharded stride-1 convs under `mesh` use the
    explicit ppermute halo ring. No-op when the mesh has no (>1) `axis`."""
    val = None
    if mesh is not None and mesh.shape.get(axis, 1) > 1:
        val = (mesh, axis)
    tok = _EXPLICIT_HALO.set(val)
    try:
        yield
    finally:
        _EXPLICIT_HALO.reset(tok)


def halo_mesh_active() -> bool:
    """True inside an explicit_halo(mesh) region — i.e. conv2d and
    conv_transpose2d compose with the lat-sharded mesh via shard_map halo
    rings, so the conv-emitter-free pallas graph stays correct AND local
    per shard (no all-gathers around the opaque pallas calls). The model
    'auto' gates key off this to lift their single-chip restriction."""
    return _EXPLICIT_HALO.get() is not None


def _halo_shard_map(x, kernel, halo: int, local_fn):
    """Run `local_fn(block, kernel)` per lat shard under the explicit-halo
    mesh, with the block pre-extended by `halo` neighbor rows on each side
    (zeros at the poles — identical to global zero padding; the ppermute
    ring's custom VJP routes edge gradients back to the neighbor). Returns
    None when the lat dim does not divide the mesh (caller falls back to
    GSPMD auto-sharding)."""
    mesh, axis = _EXPLICIT_HALO.get()
    n = int(mesh.shape[axis])
    if x.ndim != 4 or x.shape[1] % n != 0 or (x.shape[1] // n) < max(halo, 1):
        return None
    import jax

    from jax.sharding import PartitionSpec as P

    from credit_tpu.parallel.halo import halo_exchange

    dp = int(mesh.shape.get("dp", 1))
    batch_axis = "dp" if (dp > 1 and x.shape[0] % dp == 0) else None
    spec = P(batch_axis, axis, None, None)

    def local(xb, kern):
        xe = halo_exchange(xb, halo, axis) if halo else xb
        return local_fn(xe, kern)

    # check_vma off: pallas_call inside shard_map does not annotate its
    # out_shape with varying-manual-axes info (standard for pallas-under-
    # shard_map; grads still transpose correctly — conservative psums)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, P()),
                         out_specs=spec, check_vma=False)(x, kernel)


def _explicit_halo_conv(x, kernel, bias, ph: int, pw: int, accum_dtype,
                        use_pallas: bool):
    """Size-preserving (2*ph == kh-1) stride-1 conv as shard_map over the
    domain axis: a lat-VALID/lon-padded local conv on the halo-extended
    block — exact vs the global conv. The local op is the pallas
    conv-emitter-free form inside a pallas_convs region, lax otherwise
    (the ICI-measurement toggle, trainer.parallelism.halo)."""

    def local(xe, kern):
        if use_pallas:
            xp = jnp.pad(xe, ((0, 0), (0, 0), (pw, pw), (0, 0))) \
                if pw else xe
            out = _pallas_valid_conv(xp, kern, None, accum_dtype)
            if out is not None:
                return out
        return lax.conv_general_dilated(
            xe, kern.astype(xe.dtype), (1, 1), [(0, 0), (pw, pw)],
            dimension_numbers=_DN,
            preferred_element_type=_accum(xe, accum_dtype)).astype(xe.dtype)

    out = _halo_shard_map(x, kernel, ph, local)
    if out is not None and bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _mesh_conv2d_s2d(x, kernel, bias, ph: int, pw: int, accum_dtype):
    """Even-kernel stride-2 embed under the explicit-halo mesh: each lat
    shard's L/2 output rows read input rows [iL - ph, iL + L - 1 + ph]
    (kh = 2ph + 2), i.e. a symmetric ph halo; the halo-extended block IS
    the lat-padded input, so the local s2d runs with lat pad 0. Phases
    align because shard starts (iL) are even. Requires the local block
    even-height and ho == h//2 (the torch embed geometry)."""
    n_sh = int(_EXPLICIT_HALO.get()[0].shape[_EXPLICIT_HALO.get()[1]])
    h = x.shape[1]
    kh = kernel.shape[0]
    if (h % n_sh or (h // n_sh) % 2 or ph != (kh - 2) // 2
            or (h + 2 * ph - kh) // 2 + 1 != h // 2):
        return None

    def local(xe, kern):
        # the halo rows stand in for the lat padding -> lat pad 0 here
        return _conv2d_s2d(xe, kern, None, (0, pw), accum_dtype)

    out = _halo_shard_map(x, kernel, ph, local)
    if out is not None and bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _pallas_valid_conv(x, kernel, bias, accum_dtype):
    """Stride-1 VALID conv with the conv emitter taken out of the graph:
    1x1 -> GEMM; small kernels -> im2col shift-GEMM (several small-kernel
    flagship shapes crash the Mosaic-compiled kernel at runtime with an
    opaque INTERNAL error — see pallas_conv.im2col_conv) or, under
    CREDIT_SMALL_CONV=pad4, the blocked kernel with the kernel zero-padded
    to 4x4 (the crashes were all 2x2/3x3 — kernel size looks like the
    discriminator; wasted taps but no kh*kw patch-volume materialization);
    large kernels -> the blocked Pallas kernel when it supports the shape;
    None when nothing applies (caller falls back to lax)."""
    import os

    from credit_tpu.ops import pallas_conv as pc

    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh == 1 and kw == 1:
        out = pc.matmul_1x1(x, kernel.astype(x.dtype))
    elif kh < 4 or kw < 4:
        out = None
        if os.environ.get("CREDIT_SMALL_CONV", "im2col") == "pad4":
            out = pc.conv_small_pad4(x, kernel.astype(x.dtype))
        if out is None:
            out = pc.im2col_conv(x, kernel)
    elif pc.supports(x.shape, kernel.shape, x.dtype):
        out = pc.conv2d_valid(x, kernel.astype(x.dtype))
    else:
        return None
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


def _accum(x, accum_dtype):
    """MXU accumulation is fp32 in hardware; emitting the conv result in the
    compute dtype (bf16) avoids a materialized fp32 buffer + separate
    convert — the dominant HBM overhead of the bf16 path."""
    if accum_dtype is not None:
        return accum_dtype
    return jnp.float32 if x.dtype == jnp.float32 else x.dtype


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, stride=1,
           padding: Union[int, Sequence[int], str] = 0,
           accum_dtype=None) -> jnp.ndarray:
    """Conv with torch-style symmetric integer padding.

    x: (N, H, W, Cin); kernel: (kh, kw, Cin, Cout).

    Fast path: large even-kernel stride-2 convs (the CrossFormer patch
    embeds, kernels 8..32) are rewritten as space-to-depth + a stride-1
    half-kernel conv over 4x the channels. Mathematically identical (taps
    regroup by phase), but the MXU tiles input channels in lanes of 128:
    the flagship's 62-channel 16x16-s2 embed measures 14.6 TFLOP/s direct
    vs ~2x that with 248 deep channels (measured via tunnel micro-bench).
    """
    s = _pair(stride)
    kh, kw = kernel.shape[0], kernel.shape[1]
    use_pallas = _PALLAS_CONVS.get()
    if not isinstance(padding, str):
        ph, pw = _pair(padding)
        # explicit domain-halo path (trainer.parallelism: {halo: explicit}):
        # only size-preserving stride-1 convs carry a lat halo; everything
        # else stays on GSPMD auto-sharding
        if (_EXPLICIT_HALO.get() is not None and s == (1, 1) and ph > 0
                and 2 * ph == kh - 1 and x.ndim == 4):
            out = _explicit_halo_conv(x, kernel, bias, ph, pw, accum_dtype,
                                      use_pallas)
            if out is not None:
                return out
        # under pallas mode the s2d rewrite applies to ALL even-kernel
        # stride-2 convs (not just kh >= 8): the resulting stride-1 conv
        # is what the Pallas kernel / GEMM form needs. Odd padded dims are
        # allowed IN PALLAS MODE: _conv2d_s2d zero-extends to even and
        # slices the output (exact; without this, odd-height stages — the
        # whole 1-degree model — kept XLA stride-2 convs in the graph and
        # re-triggered the slow-emitter tax next to the fused FF)
        even = ((x.shape[1] + 2 * ph) % 2 == 0
                and (x.shape[2] + 2 * pw) % 2 == 0)
        if (s == (2, 2) and kh % 2 == 0 and kw % 2 == 0
                and (kh >= 8 or use_pallas) and (even or use_pallas)):
            if (_EXPLICIT_HALO.get() is not None and use_pallas
                    and x.ndim == 4):
                out = _mesh_conv2d_s2d(x, kernel, bias, ph, pw, accum_dtype)
                if out is not None:
                    return out
            return _conv2d_s2d(x, kernel, bias, (ph, pw), accum_dtype)
        if use_pallas and s == (1, 1):
            xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0))) \
                if (ph or pw) else x
            out = _pallas_valid_conv(xp, kernel, bias, accum_dtype)
            if out is not None:
                return out
        if use_pallas and s != (1, 1) and kh < 4 and kw < 4:
            # odd small kernels at stride > 1 (FuXi DownBlock 3x3/s2):
            # strided im2col GEMM keeps the graph conv-emitter-free where
            # the even-kernel s2d rewrite does not apply
            from credit_tpu.ops import pallas_conv as pc

            xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0))) \
                if (ph or pw) else x
            out = pc.im2col_conv_strided(xp, kernel, s)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out
        pad = ((ph, ph), (pw, pw))
    else:
        if use_pallas and s == (1, 1) and padding == "VALID":
            out = _pallas_valid_conv(x, kernel, bias, accum_dtype)
            if out is not None:
                return out
        pad = padding
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=s, padding=pad,
        dimension_numbers=_DN, preferred_element_type=_accum(x, accum_dtype),
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv2d_s2d(x, kernel, bias, pad: Tuple[int, int], accum_dtype):
    """Even-kernel stride-2 conv as space-to-depth + stride-1 conv.

    With padded input X̃ and i = 2a+r, j = 2b+s (r,s phases):
      out[y,x] = Σ X̃[2y+i, 2x+j] K[i,j]
               = Σ_{a,b,r,s} phase_rs[y+a, x+b] K[2a+r, 2b+s]
    i.e. a VALID stride-1 conv of the 4-phase stack with the half kernel.
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    ph, pw = pad
    # torch output size of the stride-2 conv (independent of the evening pad)
    ho = (h + 2 * ph - kh) // 2 + 1
    wo = (w + 2 * pw - kw) // 2 + 1
    # odd padded dims: one extra zero row/col makes the phase split exact;
    # output rows whose window touches the extra zeros are sliced off below
    eh = (h + 2 * ph) % 2
    ew = (w + 2 * pw) % 2
    xp = jnp.pad(x, ((0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0)))
    h2, w2 = (h + 2 * ph + eh) // 2, (w + 2 * pw + ew) // 2
    # (N, h2, 2, w2, 2, C) -> (N, h2, w2, 2, 2, C) -> channel-stacked phases
    p = xp.reshape(n, h2, 2, w2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    p = p.reshape(n, h2, w2, 4 * cin)
    # kernel phases: K'[a, b, (r*2+s)*cin + c, o] = K[2a+r, 2b+s, c, o]
    k2 = kernel.reshape(kh // 2, 2, kw // 2, 2, cin, cout)
    k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(kh // 2, kw // 2,
                                                4 * cin, cout)
    out = None
    if _PALLAS_CONVS.get():
        out = _pallas_valid_conv(p, k2, None, accum_dtype)
    if out is None:
        out = lax.conv_general_dilated(
            p, k2.astype(x.dtype), window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DN,
            preferred_element_type=_accum(x, accum_dtype),
        ).astype(x.dtype)
    if out.shape[1] != ho or out.shape[2] != wo:
        out = out[:, :ho, :wo]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, stride=2,
                     padding: Union[int, Sequence[int]] = 0,
                     accum_dtype=None) -> jnp.ndarray:
    """Transposed conv with exact torch ConvTranspose2d semantics.

    x: (N, H, W, Cin); kernel: (kh, kw, Cin, Cout) — note (in, out) order kept
    from the forward-conv convention; we flip spatially and express the
    transpose as an input-dilated conv:
      out = (H - 1) * stride - 2 * padding + k

    Fast path: stride-2 transposes whose output is exactly 2H x 2W (torch
    combos k=2/p=0 and k=4/p=1 — the decoder UpBlocks and final head) are
    rewritten as one stride-1 conv producing 4x the channels followed by
    depth-to-space. The input-dilated lowering makes the MXU chew zeros
    (75% of the dilated grid) and defeats its tiling; the phase form is
    dense contractions only.
    """
    s = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if s == (2, 2) and kh == 2 * ph + 2 and kw == 2 * pw + 2:
        if (_EXPLICIT_HALO.get() is not None and _PALLAS_CONVS.get()
                and x.ndim == 4):
            # explicit-halo mesh: the d2s phase conv's lat window spans
            # [dh0, dh1] input rows (symmetric for this k = 2p+2 family;
            # k=2/p=0 needs none, k=4/p=1 needs 1) — shard_map with that
            # halo keeps the pallas phase conv local per lat shard
            taps_h = _phase_taps(kh, ph)
            dh = [d for lst in taps_h for d, _ in lst]
            if max(dh) == -min(dh) or (max(dh) == 0 and min(dh) == 0):
                halo = max(dh)

                def local(xe, kern):
                    return _conv_transpose2d_d2s(xe, kern, None, (ph, pw),
                                                 accum_dtype,
                                                 lat_prepadded=True)

                out = _halo_shard_map(x, kernel, halo, local)
                if out is not None:
                    if bias is not None:
                        out = out + bias.astype(out.dtype)
                    return out
        return _conv_transpose2d_d2s(x, kernel, bias, (ph, pw), accum_dtype)
    k_flip = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
    out = lax.conv_general_dilated(
        x, k_flip,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=s,
        dimension_numbers=_DN,
        preferred_element_type=_accum(x, accum_dtype),
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _phase_taps(k: int, p: int):
    """Per-output-phase taps of a stride-2 transposed conv.

    out[2a + r] = sum_t x[a + d] * W[u] over the (d, u) pairs returned for
    phase r, derived from the input-dilated formulation:
      out[o] = sum_t dil(x)[o + t - (k-1-p)] * W[k-1-t],
    nonzero where o + t - (k-1-p) is even; with o = 2a + r the input index
    is a + d, d = (r + t - (k-1-p)) // 2.
    """
    taps = []
    for r in (0, 1):
        lst = []
        for t in range(k):
            num = r + t - (k - 1 - p)
            if num % 2 == 0:
                lst.append((num // 2, k - 1 - t))
        taps.append(lst)
    return taps


def _conv_transpose2d_d2s(x, kernel, bias, pad: Tuple[int, int], accum_dtype,
                          lat_prepadded: bool = False):
    """Stride-2 transpose as phase conv + depth-to-space (see conv_transpose2d).

    lat_prepadded: the caller already extended the lat dim by the phase
    window's (dh1 - dh0) rows (the explicit-halo shard_map path) — skip the
    lat zero-pad and size the d2s output from the interior rows."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    taps_h = _phase_taps(kh, pad[0])
    taps_w = _phase_taps(kw, pad[1])
    dh = [d for lst in taps_h for d, _ in lst]
    dw = [d for lst in taps_w for d, _ in lst]
    dh0, dh1 = min(dh), max(dh)
    dw0, dw1 = min(dw), max(dw)
    if lat_prepadded:
        h = h - (dh1 - dh0)
    # phase-stacked kernel: (window_h, window_w, cin, 4 * cout), phase block
    # (r, s) holds W[u_h, u_w] at window position (d_h - dh0, d_w - dw0)
    zero = jnp.zeros((cin, cout), kernel.dtype)
    rows = []
    for i in range(dh1 - dh0 + 1):
        cols = []
        for j in range(dw1 - dw0 + 1):
            blocks = []
            for r in (0, 1):
                th = {d: u for d, u in taps_h[r]}
                for sph in (0, 1):
                    tw = {d: u for d, u in taps_w[sph]}
                    uh, uw = th.get(i + dh0), tw.get(j + dw0)
                    blocks.append(kernel[uh, uw] if uh is not None
                                  and uw is not None else zero)
            cols.append(jnp.concatenate(blocks, axis=-1))
        rows.append(jnp.stack(cols, axis=0))
    k2 = jnp.stack(rows, axis=0)  # (wh, ww, cin, 4*cout)
    xp = jnp.pad(x, ((0, 0), (0, 0) if lat_prepadded else (-dh0, dh1),
                     (-dw0, dw1), (0, 0)))
    y = None
    if _PALLAS_CONVS.get():
        y = _pallas_valid_conv(xp, k2, None, accum_dtype)
    if y is None:
        y = lax.conv_general_dilated(
            xp, k2.astype(x.dtype), window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DN,
            preferred_element_type=_accum(x, accum_dtype),
        ).astype(x.dtype)
    # depth-to-space: (N, H, W, 2, 2, C) -> (N, 2H, 2W, C)
    y = y.reshape(n, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(n, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv3d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, stride=(1, 1, 1),
           padding=0, accum_dtype=None) -> jnp.ndarray:
    """3-D conv, channels-last: x (N, D, H, W, Cin), kernel (kd, kh, kw, Cin, Cout).

    Used by CubeEmbedding (reference: crossformer.py:31 Conv3d patch embed)
    and FuXi (reference: credit/models/fuxi.py:82).
    """
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = ((padding,) * 2,) * 3
    if (_PALLAS_CONVS.get() and tuple(stride) == tuple(kernel.shape[:3])
            and all(p == (0, 0) for p in padding)):
        # non-overlapping patch embed (CubeEmbedding): one GEMM, exact;
        # torch Conv3d truncates non-divisible dims, so do the same
        from credit_tpu.ops import pallas_conv as pc

        kd, kh3, kw3 = kernel.shape[:3]
        n, d, h, w, _ = x.shape
        xt = x[:, :(d // kd) * kd, :(h // kh3) * kh3, :(w // kw3) * kw3, :]
        out = pc.patch_conv3d_gemm(xt, kernel)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=tuple(stride), padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=_accum(x, accum_dtype),
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
