"""Benchmark: WXFormer autoregressive rollout at 1 deg and 0.25 deg.

Prints one JSON line per benchmark {"metric", "value", "unit",
"vs_baseline"} — the LAST line is the 0.25-deg flagship (the driver
records the final line).

Round-5 resilience design (the round-4 driver bench timed out with ZERO
parsed metrics — 28 min of one-time costs on a degraded-tunnel day):
- a GLOBAL deadline (BENCH_TOTAL_BUDGET_S, default 1740 s) governs
  everything; stages self-limit and the orchestrator enforces it
- every benchmark runs as a KILLABLE SUBPROCESS stage with its own
  deadline (inherited via BENCH_DEADLINE_TS); a wedged stage cannot take
  the banked lines down with it
- the cheap 1-deg metric runs FIRST so a number always banks
- the flagship emits a provisional JSON right after its FIRST timed run
  and re-emits the refined value later — the driver records the last
  line, so printing early is free insurance
- the persistent XLA compilation cache (~/.cache/credit_tpu/jaxcache,
  BENCH_COMPILE_CACHE to override, empty to disable) is enabled in every
  process: a warm cache turns the 466 s init + 839 s AOT compiles of
  round 4 into file reads (verified to work through the axon tunnel:
  1.36 s -> 0.03 s compile in a fresh process, identical results)

Baselines:
- 1 deg: the reference serves a 40-step 1-deg rollout in ~30-60 s on one
  A100 (reference: docs/source/serve.md:123-124); midpoint 45 s
  -> 0.889 steps/s == vs_baseline 1.0.
- 0.25 deg: no published reference number; we report gridpoints/s/chip
  vs the 1-deg A100 baseline's gridpoint rate (conservative: the A100
  would be slower still on the 40x-larger model).

The whole rollout runs as ONE on-device lax.scan (no host round-trips
between steps). Compute is bf16 end-to-end by default — params are cast
once (after spectral-norm convergence in f32) so each step reads half the
HBM bytes; pass --fp32 to compare. MFU and HBM-roofline figures come from
the compiled executable's cost analysis when the backend exposes it.

Flags: default / --all: the full budget-aware plan (1-deg, flagship,
FuXi, training — later stages skipped when the budget runs low). --025 /
--1deg / --fuxi: that benchmark only (still as a killable stage).
--train: the training bench in-process. --xla: pin the XLA baseline
(pallas_conv/ff_fusion=never) instead of the shipped pallas-auto default.
--stage <kind>: internal — run one stage in-process under the inherited
BENCH_DEADLINE_TS.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import threading
import time

import numpy as np

# Fail fast instead of hanging forever: device discovery through a remote
# TPU tunnel can wedge indefinitely (observed after a server-side compile
# crash; it cost the round-2 driver bench). Discovery is probed in a
# SUBPROCESS with short attempts + backoff so a wedged attempt can be
# killed and re-tried; the in-process watchdog remains as a backstop.
_DEVICE_TIMEOUT_S = int(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "900"))
_PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "90"))

# Global wall-clock budget. The round-4 driver killed the bench at ~30 min
# with nothing printed; we exit (with best-so-far emitted) BEFORE that.
_TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1740"))
_DEADLINE_TS = float(os.environ.get("BENCH_DEADLINE_TS", "0")) or (
    time.time() + _TOTAL_BUDGET_S)


def remaining() -> float:
    """Seconds until this process's deadline (stage children inherit a
    tighter one via BENCH_DEADLINE_TS)."""
    return _DEADLINE_TS - time.time()


def enable_compile_cache():
    """Persistent XLA compilation cache — shared across processes AND
    across bench invocations. Verified to work through the remote-TPU
    tunnel (the PJRT client serializes/deserializes executables client-
    side). A warm cache removes the biggest one-time costs: model.init
    compile, spectral-converge compile, and the N/2N AOT compiles."""
    cache_dir = os.environ.get(
        "BENCH_COMPILE_CACHE",
        os.path.expanduser("~/.cache/credit_tpu/jaxcache"))
    if not cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    # children (stage subprocesses, the --train subprocess) inherit it
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _param_cache_path(kind: str, conf: dict):
    """Disk cache for the converged+folded synthetic bench params: they
    are random-init + deterministic spectral converge, so only the config
    matters — a warm cache turns the 170-470 s init+converge one-time cost
    of each rollout stage into a file read (round-4 postmortem ask)."""
    import hashlib

    base = os.environ.get("BENCH_PARAM_CACHE",
                          os.path.expanduser("~/.cache/credit_tpu/params"))
    if not base:
        return None
    h = hashlib.sha256(("v1:" + kind + ":" + json.dumps(
        conf["model"], sort_keys=True, default=str)).encode()).hexdigest()[:16]
    return os.path.join(base, f"{kind}-{h}.npz")


def _param_cache_load(path):
    import numpy as _np

    from flax.traverse_util import unflatten_dict

    if not path or not os.path.exists(path):
        return None
    try:
        with _np.load(path) as z:
            flat = {tuple(k.split("\x1f")): z[k] for k in z.files}
        return {"params": unflatten_dict(flat)}
    except Exception as e:
        log(f"bench: param cache unreadable ({e}) — re-deriving")
        return None


def _param_cache_save(path, variables):
    import numpy as _np

    from flax.traverse_util import flatten_dict

    if not path:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        flat = flatten_dict(variables["params"])
        # keep original dtypes (int tables etc.); only bf16 upcasts to f32
        # (npz has no bfloat16; the bench re-casts after load anyway)
        arrs = {"\x1f".join(k): (_np.asarray(v, _np.float32)
                                 if str(getattr(v, "dtype", "")) == "bfloat16"
                                 else _np.asarray(v))
                for k, v in flat.items()}
        tmp = path + ".tmp.npz"  # savez appends .npz to bare names
        _np.savez(tmp, **arrs)
        os.replace(tmp, path)
        log(f"bench: cached folded params -> {path} "
            f"({os.path.getsize(path) / 1e6:.0f} MB)")
    except Exception as e:
        log(f"bench: param cache save failed ({e}) — continuing")


def _bench_abort(unit: str, msg: str):
    print(json.dumps({"metric": "bench_error", "value": 0, "unit": unit,
                      "vs_baseline": 0}), flush=True)
    print(f"bench: {msg}", file=sys.stderr, flush=True)
    os._exit(3)


def probe_devices():
    """Device discovery in a killable subprocess: attempt (short timeout) ->
    backoff -> retry until the overall budget is spent. A wedged tunnel
    blocks one CHILD, not the bench; a fresh child re-probes cleanly."""
    deadline = time.time() + _DEVICE_TIMEOUT_S
    attempt, probe_s, backoff = 0, _PROBE_TIMEOUT_S, 15
    code = ("import jax; d = jax.devices(); "
            "print('NDEV=%d PLAT=%s' % (len(d), d[0].platform))")
    while time.time() < deadline:
        attempt += 1
        budget = min(probe_s, max(10.0, deadline - time.time()))
        t0 = time.time()
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=budget)
            m = re.search(r"NDEV=(\d+) PLAT=(\w+)", out.stdout or "")
            if m:
                log(f"bench: device probe ok on attempt {attempt} "
                    f"({time.time() - t0:.1f}s): {m.group(0)}")
                return int(m.group(1)), m.group(2)
            log(f"bench: probe attempt {attempt} exited rc={out.returncode} "
                f"without devices: {(out.stderr or '')[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"bench: probe attempt {attempt} timed out after "
                f"{budget:.0f}s (tunnel wedged?) — killed, backing off")
        wait = min(backoff, max(0.0, deadline - time.time()))
        if wait > 0:
            time.sleep(wait)
        backoff = min(backoff * 2, 120)
        probe_s = min(probe_s * 2, 300)
    _bench_abort("device_init_timeout",
                 f"device discovery failed within {_DEVICE_TIMEOUT_S}s "
                 f"({attempt} subprocess probes)")


def _device_watchdog():
    flag = {"ok": False}

    def bark():
        if not flag["ok"]:
            _bench_abort("device_init_timeout",
                         f"in-process jax device discovery exceeded "
                         f"{_DEVICE_TIMEOUT_S}s after a successful probe")

    t = threading.Timer(_DEVICE_TIMEOUT_S, bark)
    t.daemon = True
    t.start()
    return flag, t

N_STEPS_1DEG = 40
N_STEPS_025 = 10
N_STEPS_FUXI = 10
BASELINE_STEPS_PER_S = 40.0 / 45.0  # 1-deg A100 serve midpoint

# flagship 0.25-deg variant (reference scale:
# config/gen_2/examples/wxformer_era5_025deg_6hr.yml; fp32 round-1 measured
# 226.6 ms/step on one v5e)
CONF_025 = {
    "type": "crossformer", "frames": 1, "image_height": 721,
    "image_width": 1440, "levels": 13, "channels": 4, "surface_channels": 4,
    "input_only_channels": 4, "output_only_channels": 0,
    "dim": [128, 256, 512, 1024], "depth": [2, 2, 8, 2], "dim_head": 32,
    "global_window_size": [10, 5, 2, 1], "local_window_size": 10,
    "cross_embed_kernel_sizes": [[4, 8, 16, 32], [2, 4], [2, 4], [2, 4]],
    "cross_embed_strides": [2, 2, 2, 2], "interp": True,
    "use_spectral_norm": True,
    "padding_conf": {"activate": True, "mode": "earth",
                     "pad_lat": [39, 40], "pad_lon": [0, 0]},
}

# one v5e chip: 197 TFLOP/s bf16 / 98.5 fp32 MXU peak, ~819 GB/s HBM
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}
HBM_BYTES_PER_S = 819e9


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# FuXi flagship (reference scale: config/gen_1/arXiv_2024/fuxi_6h_single_step
# .yml model section — 640x1280, 2 input frames, 4x4x2 patches, dim 1024,
# depth 16 SwinV2 blocks, window 7, 80-grid earth pad)
CONF_FUXI = {
    "type": "fuxi", "frames": 2, "frame_patch_size": 2,
    "image_height": 640, "image_width": 1280,
    "patch_height": 4, "patch_width": 4,
    "levels": 16, "channels": 4, "surface_channels": 7,
    "input_only_channels": 3, "output_only_channels": 0,
    "dim": 1024, "num_groups": 32, "num_heads": 8, "window_size": 7,
    "depth": 16, "use_spectral_norm": True, "interp": True,
    "padding_conf": {"activate": True, "mode": "earth",
                     "pad_lat": [80, 80], "pad_lon": [0, 0]},
}


def _bench_conf(kind: str, bf16: bool, pallas: bool = False):
    """(conf, h, w, frames) for a benchmark kind — shared by the rollout
    and training benches. kind="tiny" is the CPU-shape smoke config used by
    tests/test_round4_fixes.py to regression-test the bench plumbing."""
    from __graft_entry__ import SMOKE_MODEL_CONF, TINY_MODEL_CONF

    base = {"1deg": SMOKE_MODEL_CONF["model"], "025": CONF_025,
            "fuxi": CONF_FUXI, "tiny": TINY_MODEL_CONF["model"]}[kind]
    model_conf = {"model": dict(base)}
    if bf16:
        model_conf["model"]["compute_dtype"] = "bfloat16"
    if base.get("type") in ("crossformer", "fuxi"):
        if pallas:
            # conv-emitter-free graph: embeds/decoder convs as Pallas
            # kernels + GEMMs, which lets the fused-FF kernel turn on
            # (docs/PERF.md)
            model_conf["model"]["pallas_conv"] = "auto"
            model_conf["model"]["ff_fusion"] = "auto"
        else:
            # EXPLICIT never: the model-level default is 'auto', so an
            # unset key would silently take the pallas path on a single-
            # chip TPU and the "XLA baseline" numbers would compare
            # pallas to pallas (round-4 advisor finding)
            model_conf["model"]["pallas_conv"] = "never"
            model_conf["model"]["ff_fusion"] = "never"
    if kind == "tiny":
        conf = {
            **model_conf,
            "data": {
                "source": {
                    "ERA5": {
                        "levels": [0.0, 1.0],
                        "variables": {
                            "prognostic": {"vars_3D": ["U", "T"],
                                           "vars_2D": ["SP", "T2M"]},
                            "dynamic_forcing": {"vars_2D": ["TISR"]},
                            "diagnostic": {"vars_2D": ["PRECIP"]},
                        },
                    }
                }
            },
        }
        return conf, 32, 64, 1
    levels = {"1deg": 18, "025": 13, "fuxi": 16}[kind]
    h, w = {"1deg": (181, 360), "025": (721, 1440),
            "fuxi": (640, 1280)}[kind]
    frames = int(model_conf["model"].get("frames", 1))
    conf = {
        **model_conf,
        "data": {
            "source": {
                "ERA5": {
                    "levels": list(range(levels)),
                    "variables": {
                        "prognostic": {
                            "vars_3D": ["U", "V", "T", "Q"],
                            "vars_2D": ["SP", "VAR_2T", "VAR_10U", "VAR_10V"]
                            + (["V500", "U500", "T500"]
                               if kind == "fuxi" else []),
                        },
                        "dynamic_forcing": {"vars_2D": ["tsi"] + (
                            [] if kind == "fuxi" else ["ci_mask"])},
                        "static": {"vars_2D": ["z_norm", "lsm"]},
                        "diagnostic": {"vars_2D": [] if kind == "fuxi" else
                                       [f"d{i}" for i in range(8)]},
                    },
                }
            }
        },
    }
    return conf, h, w, frames


def run_bench(flagship: bool, bf16: bool, kind: str = None, batch: int = 1,
              pallas: bool = False):
    import jax
    import jax.numpy as jnp

    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model
    from credit_tpu.rollout import make_scan_rollout

    kind = kind or ("025" if flagship else "1deg")
    n_steps = {"1deg": N_STEPS_1DEG, "025": N_STEPS_025,
               "fuxi": N_STEPS_FUXI}[kind]
    conf, h, w, frames = _bench_conf(kind, bf16, pallas=pallas)
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    # inference model: spectral norm FOLDED into the kernels (sigma math is
    # loop-invariant overhead in the scan; see spectral_utils.fold_spectral)
    run_model = load_model({**conf, "model": {**conf["model"],
                                              "use_spectral_norm": False}})
    assert schema.n_input == model.base_input_channels, (
        schema.n_input, model.base_input_channels)

    flag, timer = _device_watchdog()
    dev = jax.devices()[0]
    flag["ok"] = True
    timer.cancel()
    tag = {"1deg": "1deg", "025": "0.25deg", "fuxi": "fuxi"}[kind]
    if batch > 1:
        tag += f"-b{batch}"
    log(f"[{tag}] device: {dev} platform={dev.platform} "
        f"compute={'bf16' if bf16 else 'fp32'}")

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (batch, frames, h, w, schema.n_input),
                           jnp.float32) * 0.5
    if bf16:
        x0 = x0.astype(jnp.bfloat16)  # carry rides bf16 end-to-end
    ppath = _param_cache_path(kind, conf)
    variables = _param_cache_load(ppath)
    if variables is not None:
        log(f"[{tag}] folded params from cache ({ppath}) — "
            f"init+converge skipped")
    else:
        t0 = time.time()
        variables = jax.jit(model.init)(rng, x0)
        jax.block_until_ready(variables)
        log(f"[{tag}] init: {time.time() - t0:.1f}s")
        t0 = time.time()
        from credit_tpu.models.spectral_utils import (
            converge_spectral, converge_spectral_device)

        from credit_tpu.models.spectral_utils import fold_spectral

        if dev.platform == "tpu":
            # on-device converge: one jitted dispatch instead of streaming
            # the full param tree over the tunnel (minutes for 124M params)
            variables = converge_spectral_device(variables)
        else:
            variables = converge_spectral(variables)  # f32, host-side
        variables = fold_spectral(variables)  # kernels <- kernels/sigma
        log(f"[{tag}] spectral converge: {time.time() - t0:.1f}s")
        _param_cache_save(ppath, variables)  # f32, pre-cast
    if bf16:
        # cast params ONCE — each rollout step then reads half the HBM
        # bytes for weights (the dominant traffic at batch 1)
        variables = {"params": jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.asarray(p).dtype == jnp.float32 else p,
            variables["params"])}
    variables = jax.device_put(variables)

    # NOTE: through the remote-TPU tunnel block_until_ready returns at
    # enqueue, so the only reliable sync point is a host transfer. We time
    # an N-step and a 2N-step rollout (each ending in a scalar fetch) and
    # difference them, cancelling constant dispatch+transfer overhead.
    def build(n):
        run = make_scan_rollout(run_model, schema, n, history_len=frames,
                                with_forcing=False)

        def run_scalar(variables, x0):
            final_x, stats = run(variables, x0)
            return jnp.sum(stats.astype(jnp.float32))

        return jax.jit(run_scalar)

    rN = build(n_steps)

    # LOCAL size guard (same as the training bench): the remote-compile
    # tunnel rejects bodies over ~4 MB with HTTP 413 and repeated oversize
    # posts have WEDGED it for hours. Pallas custom calls embed Mosaic
    # payloads, so the --pallas module can be bigger than the XLA one —
    # check before handing it over.
    limit = int(os.environ.get("BENCH_MODULE_LIMIT", "3650000"))
    try:
        asm = rN.lower(variables, x0).compiler_ir(
            "stablehlo").operation.get_asm(binary=True,
                                           enable_debug_info=True)
        log(f"[{tag}] serialized module: {len(asm) / 1e6:.2f} MB "
            f"(guard {limit / 1e6:.1f} MB)")
        if len(asm) > limit and dev.platform == "tpu":
            _bench_abort("module_too_large",
                         f"rollout module {len(asm)} bytes > tunnel guard "
                         f"{limit} — refusing to wedge the tunnel")
    except Exception as e:
        log(f"[{tag}] module size check unavailable: {e}")

    # modeled MFU / roofline from the compiled executable, when available
    # (AOT-compile once and EXECUTE the same executable — .lower().compile()
    # does not populate the jit cache, so calling rN() again would recompile)
    flops = bytes_acc = None
    try:
        t0 = time.time()
        cN = rN.lower(variables, x0).compile()
        log(f"[{tag}] AOT compile N: {time.time() - t0:.1f}s "
            f"(budget left {remaining():.0f}s)")
        rN = cN
        ca = cN.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
        bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
    except Exception as e:  # tunnel/backend may not expose AOT/cost analysis
        log(f"[{tag}] AOT/cost_analysis unavailable: {e}")

    t0 = time.time()
    sN = float(rN(variables, x0))
    log(f"[{tag}] {n_steps}-step compile+run+fetch: {time.time() - t0:.1f}s "
        f"(sum={sN:.3e})")
    if not np.isfinite(sN):
        log(f"[{tag}] WARNING: rollout produced non-finite output")

    def timed(fn, reps=2):
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            _ = float(fn(variables, x0))
            best = min(best, time.time() - t0)
        return best

    tN = timed(rN)

    base_gps = BASELINE_STEPS_PER_S * 181 * 360
    metric = {"025": "wxformer_025deg_rollout",
              "1deg": "wxformer_1deg_40step_rollout",
              "fuxi": "fuxi_640x1280_rollout"}[kind]

    def emit(per_step, provisional=False):
        steps_per_s = 1.0 / per_step
        gridpoints_per_s = steps_per_s * h * w
        vsb = (steps_per_s / BASELINE_STEPS_PER_S if kind == "1deg"
               else gridpoints_per_s / base_gps)
        out = {"metric": metric, "value": round(steps_per_s, 3),
               "unit": "steps/s", "vs_baseline": round(vsb, 3)}
        if provisional:
            # upper-bound estimate from the N-step wall time alone (the
            # constant dispatch+fetch overhead is included, so the true
            # per-step is slightly better) — printed EARLY so a later
            # timeout cannot erase the whole benchmark
            out["provisional"] = True
        print(json.dumps(out), flush=True)
        return out

    # bank a provisional line NOW; the 2N refinement below subtracts the
    # constant overhead but costs another compile+fetch round
    emit(tN / n_steps, provisional=True)

    t2N = None
    if remaining() > 150:
        try:
            r2N = build(2 * n_steps)
            t0 = time.time()
            try:
                r2N = r2N.lower(variables, x0).compile()
                log(f"[{tag}] AOT compile 2N: {time.time() - t0:.1f}s")
            except Exception:
                pass
            t0 = time.time()
            float(r2N(variables, x0))
            log(f"[{tag}] {2 * n_steps}-step compile+run+fetch: "
                f"{time.time() - t0:.1f}s")
            t2N = timed(r2N)
        except Exception as e:
            log(f"[{tag}] 2N refinement failed ({e}) — keeping the "
                f"provisional N-step estimate")
    else:
        log(f"[{tag}] skipping 2N refinement: only {remaining():.0f}s of "
            f"budget left")

    if t2N is not None and (t2N - tN) > 0:
        per_step = (t2N - tN) / n_steps
    else:
        per_step = tN / n_steps  # fallback; overhead-dominated
    steps_per_s = 1.0 / per_step
    gridpoints_per_s = steps_per_s * h * w
    log(f"[{tag}] t{n_steps}={tN:.3f}s "
        f"t{2 * n_steps}={t2N if t2N is None else round(t2N, 3)}s -> "
        f"{per_step * 1e3:.2f} ms/step, {steps_per_s:.1f} steps/s, "
        f"{gridpoints_per_s * batch / 1e6:.1f}M gridpoints/s "
        f"({steps_per_s * batch:.1f} member-steps/s at batch {batch})")

    # XLA cost analysis counts a while/scan BODY once regardless of trip
    # count; the compiled module is one unrolled fill step (the DPB-cache
    # materialization doubles as step 1) + the scan body, i.e. ~2 per-step
    # units of FLOPs/bytes.
    steps_counted = 2
    if flops:
        peak = PEAK_FLOPS["bfloat16" if bf16 else "float32"]
        mfu = (flops / steps_counted) / per_step / peak
        uses_pallas = (conf["model"].get("type") in ("crossformer", "fuxi")
                       and conf["model"].get("pallas_conv", "auto") != "never"
                       and dev.platform == "tpu")
        note = (" — UNDERSTATED: cost analysis cannot see inside pallas "
                "custom calls, which now hold the embeds+FF FLOPs"
                if uses_pallas else "")
        log(f"[{tag}] modeled MFU: {100 * mfu:.1f}% "
            f"({flops / steps_counted / 1e12:.2f} TFLOP/step @ "
            f"{peak / 1e12:.0f} TFLOP/s peak){note}")
    if bytes_acc:
        roof = (bytes_acc / steps_counted) / per_step / HBM_BYTES_PER_S
        log(f"[{tag}] HBM roofline: {100 * roof:.1f}% "
            f"({bytes_acc / steps_counted / 1e9:.2f} GB/step @ 819 GB/s)")

    return emit(per_step)


def run_train_bench(bf16: bool, kind: str = "025", steps: int = 3,
                    spectral_norm: bool = True, batch: int = 1,
                    remat: bool = True, pallas: bool = False):
    """Training-step benchmark: fwd + bwd + AdamW on the flagship config,
    timed as the difference of K- and 2K-step on-device scans (the same
    tunnel-safe methodology as the rollout bench). Remat on the transformer
    blocks trades FLOPs for activation memory (reference analogue:
    models/__init__.py:193 load_fsdp_or_checkpoint_policy AC table)."""
    import jax
    import jax.numpy as jnp

    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import (TrainState, make_optimizer,
                                             make_train_step)

    conf, h, w, frames = _bench_conf(kind, bf16)
    # remat on the transformer blocks is the memory default; --noremat
    # measures the recompute tax when the activations fit (batch 1 does on
    # a 16 GB v5e)
    conf["model"]["remat"] = remat
    if pallas:
        # conv-emitter-free TRAINING: forward convs as Pallas/im2col (their
        # VJPs run XLA conv-grads), FF as the fused kernel with its exact
        # recompute VJP. 'force' because 'auto' gates training off pending
        # this very measurement.
        conf["model"]["pallas_conv"] = "force"
        conf["model"]["ff_fusion"] = "force"
    # scan-over-layers everywhere: the unrolled flagship TRAINING graph
    # serializes to 8.7 MB of StableHLO and the remote-compile tunnel
    # rejects it (HTTP 413); scanning the depth-8 stage drops it to 3.3 MB.
    # For FuXi the motivation is MEMORY: the unrolled 16-block graph keeps
    # per-block saved buffers alive (20.3 G > 15.75 G hbm at batch 1);
    # scanning the block pairs lets XLA reuse one block's buffers.
    conf["model"]["scan_blocks"] = True
    # flat optimizer: identical AdamW math on one concatenated vector —
    # drops ~0.9 MB of per-leaf update chains from the serialized module,
    # which is what lets the SN-ON flagship step fit the tunnel body limit
    # (3.99 -> 3.12 MB; tools/module_size.py). Single-chip bench: no ZeRO
    # sharding to preserve.
    conf["trainer"] = {"learning_rate": 1e-4, "flatten_optimizer": True}
    if not spectral_norm:
        conf["model"]["use_spectral_norm"] = False
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    if model.base_output_channels != schema.n_target:
        # training targets include the diagnostics; the rollout confs leave
        # output_only at 0 because update_x only splices prognostics
        conf["model"]["output_only_channels"] = (
            int(conf["model"].get("output_only_channels", 0))
            + schema.n_target - model.base_output_channels)
        model = load_model(conf)
    tag = f"train-{kind}"
    log(f"[{tag}] building training step (bf16={bf16}, remat=True)")

    kx, ky, kf = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (batch, frames, h, w, schema.n_input),
                          jnp.float32) * 0.5
    y = jax.random.normal(ky, (batch, 1, h, w, schema.n_target),
                          jnp.float32) * 0.5
    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(variables)
    log(f"[{tag}] init: {time.time() - t0:.1f}s")
    optimizer = make_optimizer(conf, lambda _: 1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       spectral=variables.get("spectral", {}),
                       opt_state=optimizer.init(variables["params"]))
    state = jax.device_put(state)
    batch_data = {"x": x, "y": y}
    raw_step = make_train_step(model, WeightedLoss(base="mse"), optimizer,
                               schema, forecast_len=1, history_len=frames)

    # the batch rides as a jit ARGUMENT: closing over concrete device
    # arrays embeds them as module constants on this backend (~1 GB of
    # serialized weights/batch — instant rejection by the tunnel)
    def build(k):
        def run(st, b):
            def body(c, i):
                s, m = raw_step(c, b,
                                jax.random.fold_in(jax.random.PRNGKey(1), i))
                return s, m["loss"]

            _, losses = jax.lax.scan(body, st, jnp.arange(k))
            return losses[-1]

        return jax.jit(run)

    rK, r2K = build(steps), build(2 * steps)
    # LOCAL size guard: the remote-compile tunnel rejects bodies over ~4 MB
    # with HTTP 413, and repeated oversize posts have WEDGED the tunnel for
    # hours (round-2 postmortem). Never hand it a program we can already
    # see is too big.
    limit = int(os.environ.get("BENCH_MODULE_LIMIT", "3650000"))
    asm = rK.lower(state, batch_data).compiler_ir("stablehlo").operation.get_asm(
        binary=True, enable_debug_info=True)
    log(f"[{tag}] serialized module: {len(asm) / 1e6:.2f} MB "
        f"(guard {limit / 1e6:.1f} MB)")
    if len(asm) > limit:
        raise RuntimeError(
            f"module too large for the remote-compile tunnel "
            f"({len(asm)} > {limit} bytes) — skipping instead of wedging it")
    flops = None
    t0 = time.time()
    try:
        cK = rK.lower(state, batch_data).compile()
        c2K = r2K.lower(state, batch_data).compile()
        rK, r2K = cK, c2K
        ca = cK.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
        log(f"[{tag}] AOT compile K+2K: {time.time() - t0:.1f}s")
    except Exception as e:
        log(f"[{tag}] AOT/cost_analysis unavailable: {e}")
    t0 = time.time()
    lK = float(rK(state, batch_data))
    log(f"[{tag}] {steps}-step compile+run+fetch: {time.time() - t0:.1f}s "
        f"(loss={lK:.4f})")
    t0 = time.time()
    float(r2K(state, batch_data))
    log(f"[{tag}] {2 * steps}-step compile+run+fetch: {time.time() - t0:.1f}s")

    def timed(fn, reps=2):
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            _ = float(fn(state, batch_data))
            best = min(best, time.time() - t0)
        return best

    tK, t2K = timed(rK), timed(r2K)
    per_step = (t2K - tK) / steps
    if per_step <= 0:
        per_step = tK / steps
    mfu = None
    if flops:
        peak = PEAK_FLOPS["bfloat16" if bf16 else "float32"]
        mfu = flops / per_step / peak  # scan body counted once
        log(f"[{tag}] modeled MFU: {100 * mfu:.1f}% "
            f"({flops / 1e12:.2f} TFLOP/step @ {peak / 1e12:.0f} peak)")
    log(f"[{tag}] t{steps}={tK:.3f}s t{2 * steps}={t2K:.3f}s -> "
        f"{per_step * 1e3:.2f} ms/step ({1.0 / per_step:.2f} steps/s)")
    out = {"metric": f"wxformer_{kind}deg_train_step"
           if kind != "fuxi" else "fuxi_train_step",
           "value": round(1.0 / per_step, 3), "unit": "steps/s",
           "vs_baseline": 0}
    if mfu:
        out["mfu_pct"] = round(100 * mfu, 1)
    if batch > 1:
        out["batch"] = batch
    if not spectral_norm:
        out["note"] = "spectral_norm off (module over tunnel body limit)"
    if remat is False:
        out["note"] = (out.get("note", "") + " remat off").strip()
    elif not isinstance(remat, bool):
        out["note"] = (out.get("note", "")
                       + f" remat stages {remat}").strip()
    if pallas:
        out["note"] = (out.get("note", "") + " pallas train path").strip()
    print(json.dumps(out), flush=True)


def _train_entry(bf16: bool, batch: int):
    """Training bench with the SN-off fallback (module-size guard).
    --fuxi measures the FuXi training step instead of the flagship."""
    kind = "fuxi" if "--fuxi" in sys.argv else "025"
    sn = "--nosn" not in sys.argv
    remat = "--noremat" not in sys.argv
    if "--remat-stages" in sys.argv:
        # per-stage remat mask, e.g. --remat-stages 1100 (recompute only
        # the big early stages); see models/crossformer.py remat
        mask = sys.argv[sys.argv.index("--remat-stages") + 1]
        remat = [c == "1" for c in mask]
    pallas = "--pallas" in sys.argv
    try:
        run_train_bench(bf16=bf16, kind=kind, spectral_norm=sn, batch=batch,
                        remat=remat, pallas=pallas)
    except RuntimeError as e:
        if sn and "too large" in str(e):
            log("bench: SN-on module over the tunnel limit; SN-off")
            run_train_bench(bf16=bf16, kind=kind, spectral_norm=False,
                            batch=batch, remat=remat, pallas=pallas)
        else:
            raise


def _stage_cmd(stage: str, extra_flags):
    """Command line for one stage child (separate so tests can stub it)."""
    return ([sys.executable, os.path.abspath(__file__), "--stage", stage]
            + list(extra_flags))


def run_stage(stage: str, extra_flags, timeout_s: float):
    """Run one benchmark stage in a KILLABLE subprocess, streaming its
    output. JSON metric lines are forwarded to our stdout (so they bank
    immediately) and returned parsed; everything else of stdout goes to
    stderr. The child self-limits via the inherited BENCH_DEADLINE_TS; the
    subprocess timeout is the backstop for a wedged tunnel."""
    cmd = _stage_cmd(stage, extra_flags)
    env = dict(os.environ)
    env["BENCH_DEADLINE_TS"] = "%.1f" % min(
        _DEADLINE_TS - 15, time.time() + timeout_s)
    log(f"bench: stage {stage} starting (cap {timeout_s:.0f}s, "
        f"{remaining():.0f}s total left)")
    got = []
    try:
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None,
                             text=True, env=env)
    except OSError as e:
        log(f"bench: stage {stage} failed to spawn: {e}")
        return got

    def pump():
        for line in p.stdout:
            line = line.rstrip("\n")
            if line.startswith("{"):
                try:
                    got.append(json.loads(line))
                    print(line, flush=True)
                    continue
                except ValueError:
                    pass
            if line:
                log(line)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        p.wait(timeout=timeout_s + 60)  # grace over the child's own limit
    except subprocess.TimeoutExpired:
        log(f"bench: stage {stage} exceeded {timeout_s:.0f}s+grace — killed")
        p.kill()
        p.wait()
    t.join(timeout=10)
    log(f"bench: stage {stage} done rc={p.returncode} "
        f"({len(got)} metric line(s))")
    return got


def orchestrate(bf16: bool, batch: int, pallas: bool, selectors):
    """Default driver mode: cheap 1-deg FIRST (a number always banks),
    flagship second (the headline), FuXi and training only if budget
    remains, best flagship line re-printed LAST (the driver records the
    last line)."""
    flags = [] if bf16 else ["--fp32"]
    if not pallas:
        flags.append("--xla")
    if batch > 1:
        flags += ["--batch", str(batch)]
    all_metrics = []
    want = selectors or ("1deg", "025", "fuxi", "train")

    if "1deg" in want:
        cap = min(480.0, max(180.0, remaining() * 0.3)) if len(want) > 1 \
            else remaining() - 30
        all_metrics += run_stage("1deg", flags, cap)
    if "025" in want and remaining() > 240:
        all_metrics += run_stage("025", flags, remaining() - 90)
    if "fuxi" in want and remaining() > 600:
        all_metrics += run_stage("fuxi", flags, remaining() - 360)
    skip_train = os.environ.get("BENCH_SKIP_TRAIN", "") == "1"
    if "train" in want and not skip_train and remaining() > 420:
        # the shipped training default is the pallas backward-kernel path
        # (round 5: 537 -> 440 ms/step); --xla pins the XLA baseline
        tflags = flags + (["--pallas"] if pallas else [])
        all_metrics += run_stage("train", tflags, remaining() - 60)

    # headline re-print: prefer the final flagship line, then its
    # provisional one, then FuXi, then 1-deg — never end with nothing
    def last(pred):
        hits = [m for m in all_metrics if pred(m)]
        return hits[-1] if hits else None

    headline = (
        last(lambda m: m["metric"] == "wxformer_025deg_rollout"
             and not m.get("provisional"))
        or last(lambda m: m["metric"] == "wxformer_025deg_rollout")
        or last(lambda m: m["metric"] == "fuxi_640x1280_rollout")
        or last(lambda m: m["metric"] == "wxformer_1deg_40step_rollout")
        or last(lambda m: m["metric"] != "bench_error")
        or last(lambda m: True))
    if headline is not None:
        print(json.dumps(headline), flush=True)
    else:
        print(json.dumps({"metric": "bench_error", "value": 0,
                          "unit": "no_stage_completed", "vs_baseline": 0}),
              flush=True)


def main():
    argv = sys.argv
    bf16 = "--fp32" not in argv
    batch = 1
    stage = None
    for i, a in enumerate(argv):
        if a == "--batch":
            batch = int(argv[i + 1])
        if a == "--stage":
            stage = argv[i + 1]
    # --xla pins the reproducible XLA baseline; the default measures the
    # shipped configuration (pallas_conv/ff_fusion auto)
    pallas = "--xla" not in argv

    enable_compile_cache()  # also exports the cache dir to child stages

    if stage is not None:
        # stage child: the orchestrator already proved the tunnel is up;
        # go straight to work under the inherited deadline
        import jax

        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        if stage == "train":
            _train_entry(bf16, batch)
        else:
            run_bench(flagship=(stage == "025"), bf16=bf16, kind=stage,
                      batch=batch, pallas=pallas)
        return

    only_train = "--train" in argv
    # device discovery in a killable subprocess BEFORE importing jax here
    # (a wedged tunnel killed the round-2 driver bench at this point)
    ndev, plat = probe_devices()
    log(f"bench: {ndev} {plat} device(s) reachable")
    if only_train:
        # trim traceback locations from lowerings: the remote-compile
        # tunnel rejects bodies over ~4 MB, and location metadata is ~20%
        import jax

        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        _train_entry(bf16, batch)
        return
    selectors = tuple(s for s, f in (("1deg", "--1deg"), ("fuxi", "--fuxi"))
                      if f in argv)
    if "--025" in argv:
        selectors += ("025",)
    if "--all" in argv or not selectors:
        selectors = ()  # full default plan
    orchestrate(bf16, batch, pallas, selectors)


if __name__ == "__main__":
    main()
