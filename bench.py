"""Benchmark: 1-degree WXFormer 40-step (10-day @ 6h) autoregressive rollout.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference serves a 40-step 1-deg rollout in ~30-60 s on one
A100 (reference: docs/source/serve.md:123-124); we take the 45 s midpoint
-> 0.889 steps/s as vs_baseline=1.0.

The whole rollout runs as ONE on-device lax.scan (no host round-trips
between steps) — the tunnel to the single real TPU chip makes per-step host
dispatch prohibitively slow, and production rollouts should be device-
resident anyway (BASELINE.json north star).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_STEPS = 40
BASELINE_STEPS_PER_S = 40.0 / 45.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import SMOKE_MODEL_CONF
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.models import load_model
    from credit_tpu.rollout import make_scan_rollout

    conf = {
        **SMOKE_MODEL_CONF,
        "data": {
            "source": {
                "ERA5": {
                    "levels": list(range(18)),
                    "variables": {
                        "prognostic": {
                            "vars_3D": ["U", "V", "T", "Q"],
                            "vars_2D": ["SP", "VAR_2T", "VAR_10U", "VAR_10V"],
                        },
                        "dynamic_forcing": {"vars_2D": ["tsi", "ci_mask"]},
                        "static": {"vars_2D": ["z_norm", "lsm"]},
                        "diagnostic": {"vars_2D": [f"d{i}" for i in range(8)]},
                    },
                }
            }
        },
    }
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    assert schema.n_input == model.base_input_channels, (
        schema.n_input, model.base_input_channels)

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 1, 181, 360, schema.n_input), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init)(rng, x0)
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    rollout = jax.jit(make_scan_rollout(model, schema, N_STEPS, history_len=1,
                                        with_forcing=False))
    t0 = time.time()
    final_x, stats = rollout(variables, x0)
    jax.block_until_ready(stats)
    print(f"rollout compile+first-run: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.time()
        final_x, stats = rollout(variables, x0)
        jax.block_until_ready(stats)
        times.append(time.time() - t0)
    best = min(times)
    steps_per_s = N_STEPS / best
    gridpoints_per_s = steps_per_s * 181 * 360
    print(f"runs: {[f'{t:.2f}' for t in times]} -> {steps_per_s:.2f} steps/s, "
          f"{gridpoints_per_s/1e6:.1f}M gridpoints/s", file=sys.stderr)

    print(json.dumps({
        "metric": "wxformer_1deg_40step_rollout",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
