"""Measure the serialized StableHLO size of the flagship TRAINING module.

The remote-compile tunnel rejects bodies over ~3.7 MB (HTTP 413); the SN-on
flagship training step serialized to 3.97 MB in round 3, making SN-on
training unmeasurable. This tool lowers the train step with abstract
ShapeDtypeStructs (no arrays, no compute — seconds on CPU) and reports the
serialized size per configuration, so module-size levers can be evaluated
without touching the tunnel.

Usage: PALLAS_AXON_POOL_IPS= python tools/module_size.py [--sn] [--nosn]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_include_full_tracebacks_in_locations", False)

import jax.numpy as jnp


def measure(spectral_norm: bool, sn_external: bool = False,
            batch: int = 1, flatten_opt: bool = False) -> float:
    from bench import _bench_conf
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import (TrainState, make_optimizer,
                                             make_train_step)

    conf, h, w, frames = _bench_conf("025", bf16=True)
    conf["model"]["remat"] = True
    conf["model"]["scan_blocks"] = True
    conf["trainer"] = {"learning_rate": 1e-4,
                       "flatten_optimizer": flatten_opt}
    if not spectral_norm:
        conf["model"]["use_spectral_norm"] = False
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    if model.base_output_channels != schema.n_target:
        conf["model"]["output_only_channels"] = (
            int(conf["model"].get("output_only_channels", 0))
            + schema.n_target - model.base_output_channels)
        model = load_model(conf)

    x_s = jax.ShapeDtypeStruct((batch, frames, h, w, schema.n_input),
                               jnp.float32)
    y_s = jax.ShapeDtypeStruct((batch, 1, h, w, schema.n_target), jnp.float32)
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x_s)
    as_sds = lambda t: jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), t)
    params_s = as_sds(var_shapes["params"])
    spectral_s = as_sds(var_shapes.get("spectral", {}))
    optimizer = make_optimizer(conf, lambda _: 1e-4)
    opt_s = as_sds(jax.eval_shape(optimizer.init, params_s))
    state_s = TrainState(step=jax.ShapeDtypeStruct((), jnp.int32),
                         params=params_s, spectral=spectral_s,
                         opt_state=opt_s)
    raw_step = make_train_step(model, WeightedLoss(base="mse"), optimizer,
                               schema, forecast_len=1, history_len=frames,
                               sn_external=sn_external)

    def run(st, b):
        def body(c, i):
            s, m = raw_step(c, b, jax.random.fold_in(jax.random.PRNGKey(1), i))
            return s, m["loss"]

        _, losses = jax.lax.scan(body, st, jnp.arange(3))
        return losses[-1]

    lowered = jax.jit(run).lower(state_s, {"x": x_s, "y": y_s})
    asm = lowered.compiler_ir("stablehlo").operation.get_asm(
        binary=True, enable_debug_info=True)
    if "--dump" in sys.argv:
        txt = lowered.compiler_ir("stablehlo").operation.get_asm(
            binary=False, enable_debug_info=False)
        import collections
        import re as _re
        by_op = collections.Counter()
        by_bytes = collections.Counter()
        for line in txt.splitlines():
            m = _re.search(r"(stablehlo\.\w+|func\.\w+|call @\w+)", line)
            key = m.group(1) if m else "(other)"
            by_op[key] += 1
            by_bytes[key] += len(line)
        print(f"-- text asm (no debug info): {len(txt)/1e6:.2f} MB; "
              f"top ops by bytes:")
        for k, b in by_bytes.most_common(20):
            print(f"   {k:35s} {b/1e3:8.1f} kB  x{by_op[k]}")
    return len(asm) / 1e6


if __name__ == "__main__":
    rows = []
    for name, kw in [
        ("SN-off", dict(spectral_norm=False)),
        ("SN-on (in-graph update)", dict(spectral_norm=True)),
        ("SN-on (external update)", dict(spectral_norm=True,
                                         sn_external=True)),
        ("SN-on (external + flat opt)", dict(spectral_norm=True,
                                             sn_external=True,
                                             flatten_opt=True)),
        ("SN-off (flat opt)", dict(spectral_norm=False, flatten_opt=True)),
    ]:
        try:
            mb = measure(**kw)
            rows.append((name, f"{mb:.2f} MB"))
        except TypeError as e:  # sn_external not implemented yet
            rows.append((name, f"n/a ({e})"))
        except Exception as e:
            rows.append((name, f"error: {e}"))
        print(f"{rows[-1][0]:35s} {rows[-1][1]}", flush=True)
