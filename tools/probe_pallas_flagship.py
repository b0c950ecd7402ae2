"""Probe every Pallas kernel invocation of the flagship --pallas graph,
one at a time, on the real device.

The full --pallas rollout compiled through the tunnel but died at runtime
with `TPU backend error (Internal)` (round 4). This tool (1) traces the
flagship forward on CPU with pallas_conv/ff_fusion forced, recording the
(shape, dtype) of every conv2d_valid / fused_ff call, then (2) executes each
recorded shape as an isolated jitted kernel on the default backend with
random data, printing pass/fail + timing per shape — so the failing kernel
is identified without wedging anything.

Usage:
  python tools/probe_pallas_flagship.py --trace      # CPU: list the shapes
  python tools/probe_pallas_flagship.py              # probe all on device
  python tools/probe_pallas_flagship.py --only N     # probe one entry
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALLS_PATH = os.path.join(os.path.dirname(__file__), "pallas_flagship_calls.json")


def trace_calls() -> list:
    """CPU-trace the flagship forward with Pallas forced; record each
    pallas_call's operand shapes (trace-time interception, no compute)."""
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import CONF_025, _bench_conf
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model
    from credit_tpu.ops import pallas_conv as pc
    from credit_tpu.ops import pallas_ff

    conf, h, w, frames = _bench_conf("025", bf16=True, pallas=True)
    conf["model"]["pallas_conv"] = "force"
    conf["model"]["ff_fusion"] = "force"
    conf["model"]["use_spectral_norm"] = False
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)

    calls = []
    real_conv, real_ff = pc.conv2d_valid, pallas_ff.fused_ff

    def rec_conv(x, kernel):
        calls.append({"op": "conv2d_valid", "x": list(map(int, x.shape)),
                      "k": list(map(int, kernel.shape)),
                      "dtype": str(x.dtype)})
        return real_conv(x, kernel)

    def rec_ff(x, g, b, w1, b1, w2, b2, interpret=None, post_norm=False):
        calls.append({"op": "fused_ff", "x": list(map(int, x.shape)),
                      "hidden": int(w1.shape[1]), "dtype": str(x.dtype),
                      "post_norm": bool(post_norm)})
        return real_ff(x, g, b, w1, b1, w2, b2, interpret=interpret,
                       post_norm=post_norm)

    pc.conv2d_valid = rec_conv
    pallas_ff.fused_ff = rec_ff
    try:
        x = jnp.zeros((1, frames, h, w, schema.n_input), jnp.bfloat16)
        vs = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        as_sds = lambda t: jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), t)
        jax.eval_shape(lambda v, xx: model.apply(v, xx), as_sds(vs), x)
    finally:
        pc.conv2d_valid, pallas_ff.fused_ff = real_conv, real_ff

    # dedup identical signatures, keep counts
    seen = {}
    for c in calls:
        key = json.dumps(c, sort_keys=True)
        seen[key] = seen.get(key, 0) + 1
    out = [{**json.loads(k), "count": n} for k, n in seen.items()]
    with open(CALLS_PATH, "w") as f:
        json.dump(out, f, indent=1)
    return out


def probe(entry: dict, reps: int = 3) -> float:
    """Run one recorded call shape as an isolated jit on the default
    backend; returns best seconds (raises on kernel failure)."""
    import jax
    import jax.numpy as jnp

    from credit_tpu.ops import pallas_conv as pc
    from credit_tpu.ops import pallas_ff

    dt = jnp.bfloat16 if entry["dtype"] == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(0)
    if entry["op"] == "conv2d_valid":
        x = (jax.random.normal(rng, entry["x"], jnp.float32) * 0.1).astype(dt)
        k = (jax.random.normal(rng, entry["k"], jnp.float32) * 0.1).astype(dt)
        fn = jax.jit(lambda a, b: pc.conv2d_valid(a, b).sum().astype(jnp.float32))
        args = (x, k)
    else:
        c = entry["x"][-1]
        hid = entry["hidden"]
        x = (jax.random.normal(rng, entry["x"], jnp.float32) * 0.1).astype(dt)
        g = jnp.ones((c,), dt)
        b = jnp.zeros((c,), dt)
        w1 = (jax.random.normal(rng, (c, hid), jnp.float32) * 0.05).astype(dt)
        w2 = (jax.random.normal(rng, (hid, c), jnp.float32) * 0.05).astype(dt)
        fn = jax.jit(lambda a, ww1, ww2: pallas_ff.fused_ff(
            a, g, b, ww1, jnp.zeros((hid,), dt), ww2, jnp.zeros((c,), dt),
            post_norm=entry.get("post_norm", False)).sum().astype(jnp.float32))
        args = (x, w1, w2)
    best = float("inf")
    val = float(fn(*args))  # compile + first run (any runtime error surfaces here)
    assert val == val, "NaN from kernel"
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    if "--trace" in sys.argv or not os.path.exists(CALLS_PATH):
        calls = trace_calls()
        print(f"{len(calls)} distinct pallas call signatures "
              f"(saved to {CALLS_PATH}):")
        for i, c in enumerate(calls):
            print(f" [{i}] {c}")
        if "--trace" in sys.argv:
            return
    with open(CALLS_PATH) as f:
        calls = json.load(f)
    only = None
    if "--only" in sys.argv:
        only = int(sys.argv[sys.argv.index("--only") + 1])
    for i, c in enumerate(calls):
        if only is not None and i != only:
            continue
        desc = (f"conv {c['x']}*{c['k']}" if c["op"] == "conv2d_valid"
                else f"ff {c['x']} hid={c['hidden']}")
        try:
            t = probe(c)
            print(f" [{i}] OK   {desc}  x{c['count']}  {t * 1e3:.2f} ms",
                  flush=True)
        except Exception as e:
            print(f" [{i}] FAIL {desc}  x{c['count']}  {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
