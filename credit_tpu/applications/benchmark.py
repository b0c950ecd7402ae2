"""Parallelism micro-benchmark: step time / samples/s per (dp, tp, domain).

Re-implements the reference's synthetic benchmark harness (reference:
applications/benchmark_parallelism.py:1-15,159 — TSV row per config with
step_ms, peak_mem_gb, samples/s) for the JAX mesh runtime, plus a
grid-points/s/chip figure (the driver's headline unit).
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def benchmark_halo(n_devices: Optional[int] = None, h: int = 128,
                   w: int = 256, c: int = 64, k: int = 3,
                   steps: int = 20) -> dict:
    """GSPMD auto-halo vs EXPLICIT shard_map halo exchange on a lat-sharded
    stencil — the domain-parallel hot path.

    The production model path relies on GSPMD inserting halo exchanges for
    spatially-sharded convs; parallel/halo.py is the explicit ppermute
    analogue of the reference's hand-rolled exchange
    (reference: credit/domain_parallel/halo_exchange.py:20). This benchmark
    (a) asserts forward AND gradient parity of the two paths against the
    unsharded stencil, (b) counts the collective ops each compiles to, and
    (c) times both — the measured GSPMD-is-at-parity evidence PERF.md cites.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from credit_tpu.parallel.halo import halo_exchange

    devices = jax.devices()
    n = n_devices or len(devices)
    mesh = Mesh(np.array(devices[:n]), ("domain",))
    halo = (k - 1) // 2

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, c), jnp.float32)
    kern = jax.random.normal(jax.random.fold_in(key, 1), (k, k, c, c),
                             jnp.float32) * 0.05
    dn = ("NHWC", "HWIO", "NHWC")

    def stencil(x, kern):
        return lax.conv_general_dilated(x, kern, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def loop(fn):
        def run(x, kern):
            def body(z, _):
                return fn(z, kern), None
            out, _ = lax.scan(body, x, None, length=steps)
            return out
        return run

    # single-device reference
    ref = jax.jit(loop(stencil))(x, kern)

    # (a) GSPMD: shard lat, let XLA insert the halo exchanges
    xsh = NamedSharding(mesh, P(None, "domain", None, None))
    rep = NamedSharding(mesh, P())
    gspmd = jax.jit(loop(stencil), in_shardings=(xsh, rep),
                    out_shardings=xsh)

    # (b) explicit: shard_map + parallel/halo.py ppermute ring, conv VALID
    # in lat over the halo-extended block, SAME in lon
    def local_stencil(xb, kern):
        xe = halo_exchange(xb, halo, "domain")
        return lax.conv_general_dilated(
            xe, kern, (1, 1), [(0, 0), (halo, halo)], dimension_numbers=dn)

    explicit = jax.jit(shard_map(
        loop(local_stencil), mesh=mesh,
        in_specs=(P(None, "domain", None, None), P()),
        out_specs=P(None, "domain", None, None)))

    x_g = jax.device_put(x, xsh)
    k_g = jax.device_put(kern, rep)
    y_g = gspmd(x_g, k_g)
    y_e = explicit(x_g, k_g)
    err_g = float(jnp.max(jnp.abs(y_g - ref)))
    err_e = float(jnp.max(jnp.abs(y_e - ref)))

    # gradient parity (the explicit path exercises halo_exchange's VJP)
    def loss(fn):
        return jax.grad(lambda xx: jnp.sum(fn(xx, k_g) ** 2))
    g_ref = jax.jit(loss(jax.jit(loop(stencil))))(x)
    g_g = loss(gspmd)(x_g)
    g_e = loss(explicit)(x_g)
    gerr_g = float(jnp.max(jnp.abs(g_g - g_ref)))
    gerr_e = float(jnp.max(jnp.abs(g_e - g_ref)))

    def collectives(fn, *args):
        txt = fn.lower(*args).compile().as_text()
        return {op: txt.count(op) for op in
                ("collective-permute", "all-gather", "all-reduce")}

    def timed(fn, *args):
        jax.block_until_ready(fn(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        return best / steps

    out = {
        "n_devices": n, "shape": [h, w, c], "kernel": k, "steps": steps,
        "fwd_err_gspmd": err_g, "fwd_err_explicit": err_e,
        "grad_err_gspmd": gerr_g, "grad_err_explicit": gerr_e,
        "ms_per_step_gspmd": round(1e3 * timed(gspmd, x_g, k_g), 4),
        "ms_per_step_explicit": round(1e3 * timed(explicit, x_g, k_g), 4),
        "collectives_gspmd": collectives(gspmd, x_g, k_g),
        "collectives_explicit": collectives(explicit, x_g, k_g),
    }
    logger.info("halo bench %s", out)
    return out


def benchmark_parallelism(conf: dict,
                          combos: Optional[Sequence[Tuple[int, int, int]]] = None,
                          steps: int = 5, warmup: int = 2) -> List[dict]:
    """Run the jitted train step under each (dp, tp, domain) mesh and report
    a row per combo."""
    import jax
    import jax.numpy as jnp

    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.parallel.mesh import build_mesh
    from credit_tpu.parallel.sharding import (
        batch_sharding, opt_state_shardings, replicated, tree_param_shardings)
    from credit_tpu.trainers.trainer import TrainState, make_optimizer, make_train_step

    n_dev = len(jax.devices())
    if combos is None:
        combos = [(1, 1, 1)]
        if n_dev >= 2:
            combos += [(2, 1, 1), (1, 1, 2)]
        if n_dev >= 4:
            combos += [(4, 1, 1), (2, 1, 2), (2, 2, 1)]
        if n_dev >= 8:
            combos += [(8, 1, 1), (2, 2, 2), (4, 1, 2)]
        combos = [c for c in combos if c[0] * c[1] * c[2] <= n_dev]

    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    loss_fn = WeightedLoss(base="mse")
    h = int(conf["model"]["image_height"])
    w = int(conf["model"]["image_width"])
    rows = []
    for dp, tp, dom in combos:
        mesh = build_mesh(dp, tp, dom, jax.devices()[:dp * tp * dom])
        b = max(dp, 1)
        kx, ky = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (b, 1, h, w, schema.n_input), jnp.float32)
        y = jax.random.normal(ky, (b, 1, h, w, schema.n_target), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        optimizer = make_optimizer(conf, lambda _: 1e-4)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           spectral=variables.get("spectral", {}),
                           opt_state=optimizer.init(variables["params"]))
        with mesh:
            pshard = tree_param_shardings(state.params, mesh)
            rep = replicated(mesh)
            bshard = batch_sharding(mesh, 5, domain=dom > 1)
            state = state.replace(
                params=jax.device_put(state.params, pshard),
                spectral=jax.device_put(state.spectral, rep),
                opt_state=jax.device_put(
                    state.opt_state,
                    opt_state_shardings(state.opt_state, state.params, mesh)),
                step=jax.device_put(state.step, rep))
            batch = {"x": jax.device_put(x, bshard), "y": jax.device_put(y, bshard)}
            raw_step = make_train_step(model, loss_fn, optimizer, schema, 1)

            # K steps inside ONE jitted scan, synced by a single host fetch:
            # per-dispatch overhead (seconds through a remote-TPU tunnel)
            # would otherwise dominate, and block_until_ready returns at
            # enqueue there. Timing = difference of K and 2K runs.
            # batch rides as a jit ARGUMENT — closed-over device arrays
            # can be embedded as module constants on the tunnel backend
            def build(k):
                def run(st, b):
                    def body(c, i):
                        s, m = raw_step(c, b, jax.random.fold_in(
                            jax.random.PRNGKey(1), i))
                        return s, m["loss"]

                    st2, losses = jax.lax.scan(body, st, jnp.arange(k))
                    return losses[-1]

                return jax.jit(run)

            rK, r2K = build(steps), build(2 * steps)
            # modeled FLOPs/bytes for MFU + roofline columns (best-effort);
            # execute the SAME AOT objects afterwards (lower().compile()
            # does not populate the jit cache)
            flops = bytes_acc = None
            t0 = time.time()
            try:
                cK = rK.lower(state, batch).compile()
                c2K = r2K.lower(state, batch).compile()
                rK, r2K = cK, c2K
                ca = cK.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                # scan body counted once regardless of trip count
                flops = float(ca.get("flops", 0.0)) or None
                bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
            except Exception:
                pass
            loss = float(rK(state, batch))  # compile (if not AOT) + warm
            float(r2K(state, batch))
            compile_s = time.time() - t0
            t0 = time.time()
            loss = float(rK(state, batch))
            tK = time.time() - t0
            t0 = time.time()
            float(r2K(state, batch))
            t2K = time.time() - t0
            dt = (t2K - tK) / steps
            if dt <= 0:
                dt = tK / steps  # overhead-dominated fallback
        n_chips = dp * tp * dom
        row = {
            "dp": dp, "tensor": tp, "domain": dom,
            "step_ms": round(dt * 1e3, 2),
            "samples_per_s": round(b / dt, 2),
            "gridpoints_per_s_per_chip": round(b * h * w / dt / n_chips, 0),
            "compile_s": round(compile_s, 1),
            "loss": round(loss, 5),
        }
        if flops:
            # v5e bf16 peak per chip; fp32 halves it — report the bf16 frame
            row["modeled_mfu_pct"] = round(
                100 * flops / dt / n_chips / 197e12, 2)
        if bytes_acc:
            row["hbm_roofline_pct"] = round(
                100 * bytes_acc / dt / n_chips / 819e9, 1)
        rows.append(row)
        logger.info("bench %s", row)
    if rows:
        base = rows[0]["gridpoints_per_s_per_chip"] or 1.0
        for r in rows:
            r["scaling_efficiency"] = round(r["gridpoints_per_s_per_chip"] / base, 3)
    return rows
