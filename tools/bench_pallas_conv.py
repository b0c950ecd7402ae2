"""Probe: stride-1 VALID conv as a Pallas kernel (the stage-0 embed's inner
conv after space-to-depth + quadrant decomposition: 8x8 x 240 -> 176 on a
(415, 735) grid).

Goal: match XLA's fast conv emitter (~7.5 ms per instance in the flagship)
from inside Pallas, which would make the whole encoder pallas-friendly
(fused FF/attention kernels currently flip XLA convs onto a ~4x slower
emitter when placed downstream — see bench_conv_ffk.py).

Design: input stays in HBM (memory_space=ANY); each grid step DMAs a
(TH + kh - 1, Wp, Cin) row band into VMEM scratch (halo included), then
accumulates the kh*kw taps as (TH*Wo, Cin) @ (Cin, Cout) MXU matmuls.

Run: python tools/bench_pallas_conv.py [TH]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def xla_conv(p, k):
    return jax.lax.conv_general_dilated(
        p, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=p.dtype).astype(p.dtype)


def make_pallas_conv(hp, wp, cin, cout, kh, kw, th, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ho, wo = hp - kh + 1, wp - kw + 1
    assert ho % th == 0, (ho, th)

    def kernel(x_hbm, k_ref, o_ref, xs, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(i * th, th + kh - 1)], xs, sem)
        dma.start()
        dma.wait()
        # accumulate over FULL wp columns (contiguous reshapes only): tap
        # (di, dj) contributes rows di..di+th, columns rolled left by dj.
        # Columns >= wo in the result are garbage (wrap-around) and are
        # dropped by the final prefix slice.
        acc = jnp.zeros((th * wp, cout), jnp.float32)
        for di in range(kh):
            rows = xs[di:di + th]           # (th, wp, cin)
            for dj in range(kw):
                sl = pltpu.roll(rows, wp - dj, 1) if dj else rows
                acc = acc + jnp.dot(sl.reshape(th * wp, cin), k_ref[di, dj],
                                    preferred_element_type=jnp.float32)
        out = acc.reshape(th, wp, cout)[:, :wo, :]
        o_ref[...] = out.astype(dtype).reshape(1, th, wo, cout)

    def run(p, k):
        return pl.pallas_call(
            kernel,
            grid=(ho // th,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((kh, kw, cin, cout), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, wo, cout), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, ho, wo, cout), dtype),
            scratch_shapes=[
                pltpu.VMEM((th + kh - 1, wp, cin), dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(p, k)

    return run


def make_blocked_pallas_conv(hp, wp, cin, cout, kh, kw, th, dtype):
    """Tunnel-safe BLOCKED formulation (round-3 probe): no manual DMA /
    memory_space=ANY (those crash the remote compile helper — PERF.md).

    The row halo comes from passing the input TWICE with standard
    BlockSpecs: a main (th, wp) block at row-tile i and a (kh-1, wp) halo
    block at element offset (i+1)*th — expressible with block-aligned
    index maps when th % (kh-1) == 0. Out-of-range blocks at the ragged
    last tile are handled by pallas's grid padding (OOB writes masked).
    Taps accumulate as (th*wp, cin) @ (cin, cout) MXU matmuls with
    pltpu.roll for the column shifts, as in the manual-DMA version.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ho, wo = hp - kh + 1, wp - kw + 1
    halo = kh - 1
    assert th % halo == 0, (th, halo)
    n_tiles = -(-ho // th)  # ceil: last tile ragged, OOB masked
    # Mosaic can only collapse (th, wpp, cin) -> (th*wpp, cin) when the
    # second-minor dim is sublane-tile aligned (16 for bf16); pad width.
    # Padded columns roll into output cols >= wo, which are dropped.
    wpp = -(-wp // 16) * 16

    def kernel(xm, xh, k_ref, o_ref):
        rows_all = jnp.concatenate([xm[0], xh[0]], axis=0)  # (th+halo, wpp, cin)
        # Mosaic's dynamic_rotate only supports 32-bit data, so instead of
        # rolling the bf16 INPUT per tap (64 rolls), accumulate each column
        # tap's partial product in f32 and roll THAT left by dj (kw-1 f32
        # rolls total): out[:, j] needs input col j+dj for tap column dj.
        acc = jnp.zeros((th, wpp, cout), jnp.float32)
        for dj in range(kw):
            pd = jnp.zeros((th * wpp, cout), jnp.float32)
            for di in range(kh):
                pd = pd + jnp.dot(
                    rows_all[di:di + th].reshape(th * wpp, cin),
                    k_ref[di, dj], preferred_element_type=jnp.float32)
            p3 = pd.reshape(th, wpp, cout)
            acc = acc + (pltpu.roll(p3, wpp - dj, 1) if dj else p3)
        out = acc[:, :wo, :]
        o_ref[...] = out.astype(dtype).reshape(1, th, wo, cout)

    def run(p, k):
        if wpp != wp:
            p = jnp.pad(p, ((0, 0), (0, 0), (0, wpp - wp), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, th, wpp, cin), lambda i: (0, i, 0, 0)),
                # halo: rows (i+1)*th .. +halo — block units of `halo` rows,
                # so block index (i+1)*th//halo (exact: th % halo == 0)
                pl.BlockSpec((1, halo, wpp, cin),
                             lambda i: (0, (i + 1) * (th // halo), 0, 0)),
                pl.BlockSpec((kh, kw, cin, cout), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, wo, cout), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, n_tiles * th, wo, cout), dtype),
            # v5e has 128 MiB physical VMEM; the default 16 MiB scoped limit
            # rejects the f32 accumulators + bf16 kernel at useful tile sizes
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(p, p, k)

    def cropped(p, k):
        return run(p, k)[:, :ho]

    return cropped


def timed(fn, args, reps_a=4, reps_b=12):
    def loop(n):
        def run(x):
            def body(c, _):
                y = fn(c, args[1])
                return c + jnp.mean(y).astype(c.dtype) * 0, ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y[0, :2, :2, :2].astype(jnp.float32))
        return jax.jit(run).lower(args[0]).compile()

    ca, cb = loop(reps_a), loop(reps_b)
    float(ca(args[0])); float(cb(args[0]))
    t0 = time.time(); float(ca(args[0])); ta = time.time() - t0
    t0 = time.time(); float(cb(args[0])); tb = time.time() - t0
    return (tb - ta) / (reps_b - reps_a) * 1e3


def main():
    th = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    blocked = "--blocked" in sys.argv
    hp, wp, cin, cout, kh = 415, 735, 240, 176, 8
    ho, wo = hp - 7, wp - 7  # 408, 728
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    p = (jax.random.normal(key, (1, hp, wp, cin)) * 0.2).astype(dtype)
    k = (jax.random.normal(key, (kh, kh, cin, cout)) * 0.02).astype(dtype)

    gf = 2 * ho * wo * cin * cout * kh * kh / 1e9
    ms = timed(xla_conv, (p, k))
    print(f"xla       : {ms:7.2f} ms ({gf / ms:6.1f} TF/s)", flush=True)

    ref = np.asarray(xla_conv(p, k), np.float32)
    variants = ([("blocked", make_blocked_pallas_conv)] if blocked
                else [("dma", make_pallas_conv),
                      ("blocked", make_blocked_pallas_conv)])
    for name, maker in variants:
        try:
            run = maker(hp, wp, cin, cout, kh, kh, th, dtype)
            out = np.asarray(run(p, k), np.float32)
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
            ms = timed(run, (p, k))
            print(f"pallas-{name} t{th:<3d}: {ms:7.2f} ms "
                  f"({gf / ms:6.1f} TF/s) rel_err={err:.2e}", flush=True)
        except Exception as e:
            print(f"pallas-{name} t{th:<3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
