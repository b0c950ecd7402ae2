"""Profile the 0.25-deg flagship rollout on TPU and attribute device time
to source lines.

Usage:  python tools/profile_flagship.py [--steps N] [--out DIR]

Captures a jax.profiler trace of one AOT-compiled N-step scan rollout
(bf16, folded spectral norm — the bench.py configuration), then joins the
device-side trace events with the optimized HLO's source metadata and
prints ms/step grouped by source file:line. This is the tool that found
the earth-pad roll consuming 25 ms/step (15%) of the round-2 baseline.

Works through the axon TPU tunnel (trace collection is host-side in the
PJRT plugin; verified working). One TPU process at a time.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(steps: int, ff_fusion: str = None):
    import jax
    import jax.numpy as jnp

    from bench import CONF_025
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model
    from credit_tpu.models.spectral_utils import (converge_spectral_device,
                                                  fold_spectral)
    from credit_tpu.rollout import make_scan_rollout

    model_conf = {"model": dict(CONF_025)}
    model_conf["model"]["compute_dtype"] = "bfloat16"
    if ff_fusion:
        model_conf["model"]["ff_fusion"] = ff_fusion
    levels, h, w = 13, 721, 1440
    conf = {**model_conf, "data": {"source": {"ERA5": {
        "levels": list(range(levels)),
        "variables": {
            "prognostic": {"vars_3D": ["U", "V", "T", "Q"],
                           "vars_2D": ["SP", "VAR_2T", "VAR_10U", "VAR_10V"]},
            "dynamic_forcing": {"vars_2D": ["tsi", "ci_mask"]},
            "static": {"vars_2D": ["z_norm", "lsm"]},
            "diagnostic": {"vars_2D": [f"d{i}" for i in range(8)]}}}}}}
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    run_model = load_model({**conf, "model": {**conf["model"],
                                              "use_spectral_norm": False}})

    rng = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(rng, (1, 1, h, w, schema.n_input), jnp.float32)
          * 0.5).astype(jnp.bfloat16)
    t0 = time.time()
    variables = jax.jit(model.init)(rng, x0)
    jax.block_until_ready(variables)
    log(f"init {time.time() - t0:.0f}s")
    t0 = time.time()
    variables = converge_spectral_device(variables)
    variables = fold_spectral(variables)
    variables = {"params": jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables["params"])}
    variables = jax.device_put(variables)
    log(f"converge+cast {time.time() - t0:.0f}s")

    run = make_scan_rollout(run_model, schema, steps, history_len=1,
                            with_forcing=False)

    def run_scalar(v, x):
        fx, stats = run(v, x)
        return jnp.sum(stats.astype(jnp.float32))

    t0 = time.time()
    c = jax.jit(run_scalar).lower(variables, x0).compile()
    log(f"compile {time.time() - t0:.0f}s")
    return c, variables, x0


def capture(c, variables, x0, out_dir: str, steps: int):
    import jax

    t0 = time.time()
    s = float(c(variables, x0))
    log(f"warm run {time.time() - t0:.1f}s sum={s:.3e}")
    t0 = time.time()
    float(c(variables, x0))
    log(f"run2 {time.time() - t0:.1f}s (~{(time.time() - t0) / steps * 1e3:.0f} ms/step)")
    with jax.profiler.trace(out_dir):
        float(c(variables, x0))
    with open(f"{out_dir}/hlo.txt", "w") as f:
        f.write(c.as_text())
    log("traced")


def report(out_dir: str, steps: int, top: int = 40):
    d = sorted(glob.glob(f"{out_dir}/plugins/profile/*"))[-1]
    f = glob.glob(d + "/*.trace.json.gz")[0]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    agg = collections.defaultdict(float)
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in dev
                and not e["name"].startswith(("jit_", "while"))):
            agg[e["name"]] += e.get("dur", 0) / 1e3 / steps  # ms/step

    src = {}
    with open(f"{out_dir}/hlo.txt") as fh:
        for line in fh:
            m = re.match(r"\s*%([\w.\-]+) = .*", line)
            if not m:
                continue
            sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
            if sm:
                short = sm.group(1).split("credit_tpu/")[-1]
                src[m.group(1)] = f"{short}:{sm.group(2)}"

    by_src = collections.defaultdict(float)
    for name, ms in agg.items():
        by_src[src.get(name, "?" + name.split(".")[0])] += ms
    total = sum(agg.values())
    print(f"device total {total:.1f} ms/step across {len(agg)} distinct ops")
    print("=== ms/step by source line (top {}) ===".format(top))
    for s, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:8.2f}  {s}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--ff-fusion", default=None)
    ap.add_argument("--out", default="/tmp/credit_tpu_profile")
    ap.add_argument("--report-only", action="store_true",
                    help="re-aggregate an existing capture")
    args = ap.parse_args()
    if not args.report_only:
        sys.path.insert(0, ".")
        c, variables, x0 = build(args.steps, args.ff_fusion)
        capture(c, variables, x0, args.out, args.steps)
    report(args.out, args.steps)


if __name__ == "__main__":
    main()
