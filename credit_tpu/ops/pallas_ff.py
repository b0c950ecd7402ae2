"""Fused feed-forward Pallas kernel: LN -> fc1 -> GELU -> fc2 -> +residual.

TPU-native fusion of the transformer FF block (reference
credit/models/wxformer/crossformer.py:234 FeedForward + the residual add at
:406). The XLA path round-trips every intermediate through HBM — x, LN(x),
fc1 out (4x wider), GELU out, fc2 out, residual — ~1.6 GB per block at the
flagship's stage-0 (400x720x128), measured bandwidth-bound at ~530 GB/s.
This kernel streams token tiles through VMEM: x is read once and the result
written once (~150 MB per block), with both GEMMs on the MXU and all
intermediates (f32 LN stats, f32 GEMM accumulators, GELU) in registers/VMEM.

Numerics: LN stats in f32 (same as ChannelLayerNorm), MXU accumulation in
f32 (the XLA bf16 path rounds accumulators to bf16 — the kernel is slightly
MORE accurate), GELU exact (erf).

fused_ff_diff carries an exact XLA-recompute VJP, so ff_fusion: force also
works in training (measured a wash at flagship scale — the conv GRADS stay
XLA and pay the slow-emitter tax; docs/PERF.md); 'auto' engages for
inference inside a conv-emitter-free graph.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# VMEM budget: v5e has 128 MiB of VMEM; stay well under half to leave the
# compiler room for pipelining double-buffers (a 16.7 MB working set was
# measured running fine at stage-1 shapes)
_VMEM_BUDGET = 48 * 1024 * 1024
_TM_MAX = 1024


def _erf(x):
    """erf from Mosaic-supported primitives (no erf/erfc lowering exists).

    Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    1.5e-7 — below f32 roundoff of the surrounding GEMMs."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ln(v, g, b):
    mean = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean((v - mean) ** 2, axis=-1, keepdims=True)
    return (v - mean) * jax.lax.rsqrt(var + 1e-5) * g + b


def _ff_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, post_norm: bool):
    xs = x_ref[...]
    # blocks may arrive as (1, TH, W, C) — collapse the leading (non-lane)
    # dims to rows; Mosaic supports shape casts on non-lane dimensions
    x = xs.reshape(-1, xs.shape[-1])
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    y = x.astype(jnp.float32)
    if not post_norm:  # pre-norm (CrossFormer): x + fc2(gelu(fc1(LN(x))))
        y = _ln(y, g, b)
    h = jnp.dot(y.astype(x.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # exact GELU 0.5*x*(1+erf(x/sqrt(2))) with the in-kernel erf
    h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
    o = jnp.dot(h.astype(x.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    if post_norm:  # post-norm (SwinV2): x + LN(fc2(gelu(fc1(x))))
        o = _ln(o, g, b)
    o_ref[...] = (x + o.astype(x.dtype)).reshape(xs.shape)


def _vmem_use(tm: int, c: int, hidden: int, itemsize: int) -> int:
    weights = (c * hidden + hidden * c) * itemsize
    # double-buffered x/out tiles + f32 LN/GEMM-accumulator temporaries
    acts = tm * (2 * c + hidden) * itemsize + tm * (c + hidden) * 4
    return weights + 2 * acts


def _pick_tile(m: int, c: int, hidden: int, itemsize: int) -> int | None:
    """Pick the token-tile size: a sublane-aligned tile <= cap whose working
    set fits the VMEM budget. Prefers exact divisors of m; otherwise the
    largest fitting tile (the tail block is masked by Pallas)."""
    sub = 16 if itemsize == 2 else 8
    cap = min(_TM_MAX, max(sub, (m // sub) * sub))
    best = None
    for tm in range(cap, sub - 1, -sub):
        if _vmem_use(tm, c, hidden, itemsize) >= _VMEM_BUDGET:
            continue
        if best is None:
            best = tm
        if m % tm == 0:
            return tm
    return best


def _pick_rows(h: int, w: int, c: int, hidden: int, itemsize: int):
    """4-D blocking: choose TH latitude rows per block (block (1,TH,W,C)).

    TH sits above the tiled dims so any integer works; prefer divisors of h
    (no masked tail), else the largest fitting count."""
    best = None
    for th in range(min(h, max(1, _TM_MAX * 2 // max(w, 1))), 0, -1):
        if _vmem_use(th * w, c, hidden, itemsize) >= _VMEM_BUDGET:
            continue
        if best is None:
            best = th
        if h % th == 0:
            return th
    return best


def ff_fits(m: int, c: int, hidden: int, itemsize: int = 2) -> bool:
    """True when the fused kernel supports (m, c->hidden->c) at this dtype."""
    if c % 128 or hidden % 128:
        return False
    return _pick_tile(m, c, hidden, itemsize) is not None


def ff_fits_shape(shape, hidden: int, itemsize: int = 2) -> bool:
    """Gate for an activation of the given shape (..., C)."""
    c = shape[-1]
    if c % 128 or hidden % 128:
        return False
    if len(shape) == 4:
        return _pick_rows(shape[1], shape[2], c, hidden, itemsize) is not None
    m = 1
    for d in shape[:-1]:
        m *= d
    return _pick_tile(m, c, hidden, itemsize) is not None


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled devices)."""
    try:
        return any("TPU" in d.device_kind for d in jax.devices())
    except Exception:
        return False


def fuse_ok_auto() -> bool:
    """Auto-gating for the fused kernel: a TPU backend INSIDE a
    conv-emitter-free region (ops/conv.pallas_convs context). Measured on
    the flagship (round 4): with the convs also conv-emitter-free the fused
    FF takes the 0.25-deg rollout 135.8 -> 126.7 ms/step; with XLA convs
    present, any pallas call flips them onto a ~4x slower emitter (142 ->
    220 ms, docs/PERF.md) — so 'auto' keys off the conv context rather than
    device count. Multi-device is fine: fused_ff_gspmd carries a
    custom_partitioning rule, so sharded activations run the kernel per
    shard."""
    try:
        from credit_tpu.ops import conv as conv_ops

        return on_tpu() and conv_ops.pallas_convs_active()
    except Exception:
        return False


def single_chip_tpu() -> bool:
    """Gate for kernels NOT yet GSPMD-composable (the blocked Pallas conv):
    under a multi-device mesh an unpartitioned pallas_call forces gathers
    of the sharded activations."""
    try:
        return on_tpu() and len(jax.devices()) == 1
    except Exception:
        return False


def _xla_ff(x2d, g, b, w1, b1, w2, b2, post_norm=False):
    """Reference composition (identical math, XLA ops) — used as the VJP
    recompute path and the CPU fallback in tests."""

    def ln(v):
        vf = v.astype(jnp.float32)
        mean = vf.mean(-1, keepdims=True)
        var = ((vf - mean) ** 2).mean(-1, keepdims=True)
        return ((vf - mean) * jax.lax.rsqrt(var + 1e-5)
                * g.astype(jnp.float32) + b.astype(jnp.float32))

    y = x2d if post_norm else ln(x2d).astype(x2d.dtype)
    h = jnp.matmul(y, w1.astype(x2d.dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1.astype(jnp.float32), approximate=False)
    o = jnp.matmul(h.astype(x2d.dtype), w2.astype(x2d.dtype),
                   preferred_element_type=jnp.float32)
    o = o + b2.astype(jnp.float32)
    if post_norm:
        o = ln(o)
    return x2d + o.astype(x2d.dtype)


# ---------------------------------------------------------------------------
# In-kernel BACKWARD (round 5): the XLA-recompute VJP re-materializes every
# 4C-wide intermediate in HBM (h1, gelu, their gradients — the dominant
# traffic term of the training step, docs/PERF.md round-4 attribution).
# This kernel recomputes them in VMEM from the saved x tile and streams
# only x, ct in / dx out, accumulating the weight/bias/LN-parameter grads
# across grid steps in VMEM-resident output blocks (the TPU grid is
# sequential, so read-modify-write accumulation is well-defined).

_SQRT1_2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT_2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _ff_bwd_kernel(x_ref, ct_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, dx_ref, dg_ref, db_ref, dw1_ref, db1_ref,
                   dw2_ref, db2_ref, *, post_norm: bool, grid_dims: int):
    from jax.experimental import pallas as pl

    first = pl.program_id(0) == 0
    for d in range(1, grid_dims):
        first &= pl.program_id(d) == 0

    @pl.when(first)
    def _zero():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    xs = x_ref[...]
    x = xs.reshape(-1, xs.shape[-1])
    ct = ct_ref[...].reshape(x.shape).astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    cdim = x.shape[-1]
    inv_c = np.float32(1.0) / cdim

    def mxu(a, bmat, contract):
        return jax.lax.dot_general(
            a.astype(x.dtype), bmat,
            dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32)

    xf = x.astype(jnp.float32)
    if post_norm:
        y = xf  # fc1 input IS x
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + 1e-5)
        xhat = (xf - mean) * rstd
        y = xhat * g + b_ref[...].astype(jnp.float32)
    # recompute the forward chain in VMEM
    h1 = mxu(y, w1_ref[...], (((1,), (0,)))) \
        + b1_ref[...].astype(jnp.float32)
    phi = 0.5 * (1.0 + _erf(h1 * _SQRT1_2))          # Phi(h1)
    a = h1 * phi                                      # gelu(h1)

    if post_norm:
        # out = x + LN(o2): push ct through the LN first. b2 is per-channel
        # so it changes the LN statistics — it must be in the recompute.
        o2 = mxu(a, w2_ref[...], (((1,), (0,)))) \
            + b2_ref[...].astype(jnp.float32)
        mean_o = jnp.mean(o2, axis=-1, keepdims=True)
        var_o = jnp.mean((o2 - mean_o) ** 2, axis=-1, keepdims=True)
        rstd_o = jax.lax.rsqrt(var_o + 1e-5)
        ohat = (o2 - mean_o) * rstd_o
        dg_ref[...] += jnp.sum(ct * ohat, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(ct, axis=0, keepdims=True)
        dohat = ct * g
        do2 = rstd_o * (
            dohat - jnp.sum(dohat, -1, keepdims=True) * inv_c
            - ohat * (jnp.sum(dohat * ohat, -1, keepdims=True) * inv_c))
    else:
        do2 = ct
    db2_ref[...] += jnp.sum(do2, axis=0, keepdims=True)
    dw2_ref[...] += mxu(a, do2.astype(x.dtype), (((0,), (0,))))
    da = mxu(do2, w2_ref[...], (((1,), (1,))))       # (M, hidden)
    pdf = jnp.exp(-0.5 * h1 * h1) * _INV_SQRT_2PI
    dh1 = da * (phi + h1 * pdf)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dw1_ref[...] += mxu(y, dh1.astype(x.dtype), (((0,), (0,))))
    dy = mxu(dh1, w1_ref[...], (((1,), (1,))))       # (M, C)
    if post_norm:
        dx = ct + dy
    else:
        dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dxhat = dy * g
        dx_ln = rstd * (
            dxhat - jnp.sum(dxhat, -1, keepdims=True) * inv_c
            - xhat * (jnp.sum(dxhat * xhat, -1, keepdims=True) * inv_c))
        dx = ct + dx_ln
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(xs.shape)


def _vmem_use_bwd(tm: int, c: int, hidden: int, itemsize: int) -> int:
    weights = 2 * c * hidden * itemsize          # w1, w2 tiles
    accums = 2 * c * hidden * 4 + 4 * (c + hidden)  # f32 dw1/dw2 + vectors
    acts = (tm * (2 * c) * itemsize * 2          # x/ct in + dx out (dbuf)
            + tm * (3 * hidden + 6 * c) * 4)     # f32 h1/phi/da + LN temps
    return weights + accums + 2 * acts


def _pick_rows_bwd(h: int, w: int, c: int, hidden: int, itemsize: int):
    # DIVIDING tiles only: the bwd kernel accumulates dw/db blocks across
    # grid steps with no tail masking, so a partial last tile would fold
    # out-of-bounds rows into the weight gradients
    for th in range(min(h, max(1, _TM_MAX // max(w, 1))), 0, -1):
        if _vmem_use_bwd(th * w, c, hidden, itemsize) >= _VMEM_BUDGET * 2:
            continue
        if h % th == 0:
            return th
    return None


def _pick_tile_bwd(m: int, c: int, hidden: int, itemsize: int):
    sub = 16 if itemsize == 2 else 8
    cap = min(_TM_MAX, max(sub, (m // sub) * sub))
    for tm in range(cap, sub - 1, -sub):
        if _vmem_use_bwd(tm, c, hidden, itemsize) >= _VMEM_BUDGET * 2:
            continue
        if m % tm == 0:  # dividing only — see _pick_rows_bwd
            return tm
    return None


def bwd_fits_shape(shape, hidden: int, itemsize: int = 2) -> bool:
    c = shape[-1]
    if c % 128 or hidden % 128:
        return False
    if len(shape) == 4 and _pick_rows_bwd(shape[1], shape[2], c, hidden,
                                          itemsize) is not None:
        return True
    # 4-D shapes whose full-width row tile busts VMEM (FuXi: 320-wide rows
    # at c=1024/h=4096 next to 33 MB of f32 dw accumulators) flatten to the
    # 2-D path — LN/FF are rowwise, so the reshape is exact and free
    m = 1
    for d in shape[:-1]:
        m *= d
    return _pick_tile_bwd(m, c, hidden, itemsize) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "post_norm"))
def fused_ff_bwd(x, ct, g, b, w1, b1, w2, b2, interpret=None,
                 post_norm: bool = False):
    """Backward of the fused FF block, one VMEM pass.

    x, ct: (M, C) or (B, H, W, C). Returns
    (dx, dg, db, dw1, db1, dw2, db2) with parameter grads in f32.
    """
    if interpret is None:
        interpret = not on_tpu()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    c = x.shape[-1]
    hidden = w1.shape[1]
    itemsize = x.dtype.itemsize

    def row(v):
        return v.reshape(1, -1).astype(x.dtype)

    if x.ndim == 4 and _pick_rows_bwd(x.shape[1], x.shape[2], c, hidden,
                                      itemsize) is None:
        # full-width row tiles bust VMEM (see bwd_fits_shape) — flatten to
        # the 2-D row-tiled form; exact, dx reshaped back below
        outs = fused_ff_bwd(x.reshape(-1, c), ct.reshape(-1, c), g, b,
                            w1, b1, w2, b2, interpret=interpret,
                            post_norm=post_norm)
        return (outs[0].reshape(x.shape),) + outs[1:]

    if x.ndim == 4:
        bsz, h, w, _ = x.shape
        th = _pick_rows_bwd(h, w, c, hidden, itemsize)
        if th is None:
            raise ValueError(f"no bwd row tile for shape {x.shape}")
        grid = (bsz, pl.cdiv(h, th))
        tile = pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0))
        acc = lambda *shape: pl.BlockSpec(shape,
                                          lambda bi, hi: (0,) * len(shape))
        grid_dims = 2
        out_x_shape = x.shape
    else:
        m, _ = x.shape
        tm = _pick_tile_bwd(m, c, hidden, itemsize)
        if tm is None:
            raise ValueError(f"no bwd tile for M={m}")
        grid = (pl.cdiv(m, tm),)
        tile = pl.BlockSpec((tm, c), lambda i: (i, 0))
        acc = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
        grid_dims = 1
        out_x_shape = x.shape

    kernel = functools.partial(_ff_bwd_kernel, post_norm=post_norm,
                               grid_dims=grid_dims)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile, tile,
                  acc(1, c), acc(1, c),
                  acc(c, hidden), acc(1, hidden), acc(hidden, c),
                  acc(1, c)],
        out_specs=[tile,
                   acc(1, c), acc(1, c),
                   acc(c, hidden), acc(1, hidden), acc(hidden, c),
                   acc(1, c)],
        out_shape=[jax.ShapeDtypeStruct(out_x_shape, x.dtype),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32),
                   jax.ShapeDtypeStruct((c, hidden), f32),
                   jax.ShapeDtypeStruct((1, hidden), f32),
                   jax.ShapeDtypeStruct((hidden, c), f32),
                   jax.ShapeDtypeStruct((1, c), f32)],
        compiler_params=cparams,
        interpret=interpret,
    )(x, ct.astype(x.dtype), row(g), row(b), w1.astype(x.dtype), row(b1),
      w2.astype(x.dtype), row(b2))
    dx, dg, db, dw1, db1, dw2, db2 = outs
    return (dx, dg[0], db[0], dw1, db1[0], dw2, db2[0])


def _ff_auto(x, g, b, w1, b1, w2, b2, post_norm):
    """Pick the GSPMD-partitioned form under a multi-device backend (4-D
    activations only — the model path), the plain kernel otherwise."""
    try:
        multi = len(jax.devices()) > 1
    except Exception:
        multi = False
    if multi and x.ndim == 4:
        return fused_ff_gspmd(x, g, b, w1, b1, w2, b2, post_norm)
    return fused_ff(x, g, b, w1, b1, w2, b2, post_norm=post_norm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ff_diff(x2d, g, b, w1, b1, w2, b2, post_norm=False):
    """Differentiable fused FF: Pallas kernel forward, XLA-recompute VJP
    (the backward re-runs the cheap composition and differentiates it, like
    rematerialization — gradients match the unfused path)."""
    return _ff_auto(x2d, g, b, w1, b1, w2, b2, post_norm)


def _ff_fwd(x2d, g, b, w1, b1, w2, b2, post_norm):
    return (_ff_auto(x2d, g, b, w1, b1, w2, b2, post_norm),
            (x2d, g, b, w1, b1, w2, b2))


def _ff_bwd(post_norm, res, ct):
    x, g, b, w1, b1, w2, b2 = res
    hidden = w1.shape[-1]
    # single-chip only: the bwd kernel is an unpartitioned pallas_call —
    # under a mesh it would force gathers; multi-chip training falls back
    # to the XLA recompute VJP, which GSPMD partitions natively (the dw
    # psum comes out of the partitioner for free)
    if (os.environ.get("CREDIT_FF_BWD", "kernel") == "kernel"
            and single_chip_tpu()
            and bwd_fits_shape(x.shape, hidden, x.dtype.itemsize)):
        dx, dg, db, dw1, db1, dw2, db2 = fused_ff_bwd(
            x, ct, g, b, w1, b1, w2, b2, post_norm=post_norm)
        return (dx.astype(x.dtype), dg.astype(g.dtype), db.astype(b.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))
    # fallback: XLA recompute (exact gradient of the reference composition)
    _, vjp = jax.vjp(lambda *a: _xla_ff(*a, post_norm=post_norm), *res)
    return vjp(ct)


fused_ff_diff.defvjp(_ff_fwd, _ff_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "post_norm"))
def fused_ff(x, g, b, w1, b1, w2, b2, interpret=None,
             post_norm: bool = False):
    """x: (M, C) or (B, H, W, C); g,b: (C,); w1: (C, H); b1: (H,);
    w2: (H, C); b2: (C,).

    post_norm=False: x + fc2(gelu(fc1(LN(x)))) (CrossFormer pre-norm).
    post_norm=True:  x + LN(fc2(gelu(fc1(x)))) (SwinV2/FuXi post-norm).

    The 4-D form blocks over (batch, latitude-rows) and is the one to use
    inside models: it keeps the array in its natural default layout, so XLA
    does not re-layout upstream producers to feed the custom call (feeding a
    reshaped 2-D view measurably flipped the stage-0 conv into a 2.5x-slower
    layout). Caller must have checked ff_fits_shape(). interpret=None
    auto-selects the Pallas interpreter off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = not on_tpu()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # raise Mosaic's scoped-vmem stack limit (default ~16.1 MB): the
    # stage-3 tile at batch 4 allocates 16.16 MB and failed compile by
    # 36 KB; the conv kernel runs with the same raised limit (measured
    # runtime-safe around 30 MB of scoped buffers on v5e)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    c = x.shape[-1]
    hidden = w1.shape[1]
    itemsize = x.dtype.itemsize
    kernel = functools.partial(_ff_kernel, post_norm=post_norm)

    def row(v):  # (N,) -> (1, N) — Mosaic wants >=2-D operands
        return v.reshape(1, -1).astype(x.dtype)

    if x.ndim == 4:
        bsz, h, w, _ = x.shape
        th = _pick_rows(h, w, c, hidden, itemsize)
        if th is None:
            raise ValueError(f"no row tile for shape {x.shape}")
        full = lambda *shape: pl.BlockSpec(shape,
                                           lambda bi, hi: (0,) * len(shape))
        return pl.pallas_call(
            kernel,
            grid=(bsz, pl.cdiv(h, th)),
            in_specs=[
                pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0)),
                full(1, c), full(1, c),
                full(c, hidden), full(1, hidden),
                full(hidden, c), full(1, c),
            ],
            out_specs=pl.BlockSpec((1, th, w, c),
                                   lambda bi, hi: (bi, hi, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=cparams,
            interpret=interpret,
        )(x, row(g), row(b), w1.astype(x.dtype), row(b1),
          w2.astype(x.dtype), row(b2))

    m, _ = x.shape
    tm = _pick_tile(m, c, hidden, itemsize)
    if tm is None:
        raise ValueError(f"no tile for M={m}")
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),
            full(1, c), full(1, c),
            full(c, hidden), full(1, hidden),
            full(hidden, c), full(1, c),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        compiler_params=cparams,
        interpret=interpret,
    )(x, row(g), row(b), w1.astype(x.dtype), row(b1),
      w2.astype(x.dtype), row(b2))


# ---------------------------------------------------------------------------
# GSPMD composition: a pallas_call is an opaque custom call the partitioner
# cannot split, so a sharded activation would be all-gathered around it.
# custom_partitioning teaches the partitioner that the FF is pointwise over
# (batch, lat, lon) — each device runs the kernel on its local block; only
# the channel dim must stay whole (LN + both GEMMs contract over it), and
# the weights replicate. This is what lets the perf path compose with the
# dp/domain mesh (north star: fused kernels over the sharded mesh).

def _ffg_impl(x, g, b, w1, b1, w2, b2, post_norm):
    return fused_ff(x, g, b, w1, b1, w2, b2, post_norm=post_norm)


def _x_sharding(mesh, info, ndim):
    """x's NamedSharding with the channel (last) dim forced whole."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = getattr(info, "sharding", None)
    spec = list(getattr(sh, "spec", []) or [])
    spec += [None] * (ndim - len(spec))
    spec[-1] = None
    return NamedSharding(mesh, P(*spec))


def _ffg_infer(post_norm, mesh, arg_shapes, result_shape):
    return _x_sharding(mesh, arg_shapes[0], len(arg_shapes[0].shape))


def _ffg_partition(post_norm, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_sh = _x_sharding(mesh, arg_shapes[0], len(arg_shapes[0].shape))
    rep = NamedSharding(mesh, P())

    def lower_fn(x, g, b, w1, b1, w2, b2):
        return fused_ff(x, g, b, w1, b1, w2, b2, post_norm=post_norm)

    return mesh, lower_fn, x_sh, (x_sh,) + (rep,) * 6


from jax.experimental.custom_partitioning import custom_partitioning

fused_ff_gspmd = custom_partitioning(_ffg_impl, static_argnums=(7,))
fused_ff_gspmd.def_partition(
    partition=_ffg_partition,
    infer_sharding_from_operands=_ffg_infer,
    # shardy rule: batch/lat/lon pass through per-shard. Channel (c) and
    # hidden (j) MUST be marked need-replication: the kernel LayerNorms
    # and contracts over the full channel axis, so a c- or j-sharded
    # operand (channel-sharded activation, ZeRO/FSDP-sharded w1/w2) would
    # otherwise run on partial slices per device with no reduction —
    # silently wrong output (round-4 advisor finding; under JAX 0.9 the
    # Shardy partitioner follows THIS rule, not the GSPMD callbacks).
    sharding_rule="b h w c, c, c, c j, j, j c, c -> b h w c",
    need_replication_factors=("c", "j"))
