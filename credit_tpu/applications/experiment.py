"""Experiment construction: config -> (schema, grid, model, datasets,
trainer) and the train / rollout entry points.

This is the gen2 application layer (reference:
credit/applications/train_gen2.py:57 main_cli wiring and
credit/applications/rollout_to_netcdf.py:195 predict) re-expressed for the
single-process-per-host JAX runtime: no process-group bootstrap — the jax
distributed runtime + mesh replaces torchrun/MPI rank discovery.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def build_data(conf: dict) -> Dict[str, Any]:
    """Model-free data assembly: schema, grid, normalizer, datasets.

    Serves data-only configs (no `model` section) exactly like the
    reference's preprocessing path, which builds datasets without ever
    touching the model (reference: applications/preprocess.py)."""
    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.data.local import load_dataset
    from credit_tpu.data.normalize import Normalizer
    from credit_tpu.grid import grid_from_conf
    from credit_tpu.registry import load_custom_objects

    load_custom_objects(conf)
    schema = ChannelSchema.from_config(conf)
    grid = grid_from_conf(conf)

    data = conf.get("data", {}) or {}
    if data.get("mean_path") and data.get("std_path") and os.path.exists(data["mean_path"]):
        normalizer = Normalizer.from_netcdf(schema, data["mean_path"], data["std_path"])
    else:
        normalizer = Normalizer.identity(schema)

    dataset = load_dataset(conf, schema, grid, "train")
    valid = load_dataset(conf, schema, grid, "valid") if conf.get("data_valid") else None
    return {
        "schema": schema, "grid": grid, "normalizer": normalizer,
        "dataset": dataset, "valid_dataset": valid,
    }


def build_experiment(conf: dict) -> Dict[str, Any]:
    from credit_tpu.config import model_channel_check
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model

    out = build_data(conf)
    model_channel_check(conf, out["schema"])
    out["model"] = load_model(conf)
    out["loss"] = WeightedLoss.from_config(conf, out["grid"])
    out["valid_loss"] = WeightedLoss.from_config(conf, out["grid"], validation=True)
    return out


def run_training(conf: dict, seed: Optional[int] = None):
    """credit-tpu train (reference: applications/train_gen2.py)."""
    import jax

    from credit_tpu.trainers.trainer import load_trainer

    exp = build_experiment(conf)
    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"], exp["schema"],
                  exp["dataset"], exp["valid_dataset"],
                  save_loc=conf.get("save_loc", "./ckpt"),
                  normalizer=exp["normalizer"])
    state = None
    if conf.get("trainer", {}).get("load_weights"):
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = trainer.load_checkpoint(state)
        logger.info("resumed from checkpoint at step %d", int(state.step))
    return trainer.fit(state, seed=seed if seed is not None else int(conf.get("seed", 0)))


def run_rollout(conf: dict, n_steps: Optional[int] = None,
                save_dir: Optional[str] = None, use_ema: bool = False):
    """credit-tpu rollout (reference: applications/rollout_to_netcdf.py:195
    predict): init -> autoregressive steps -> per-step netCDF files."""
    import jax
    import jax.numpy as jnp

    from credit_tpu.models.spectral_utils import converge_spectral
    from credit_tpu.output import save_netcdf_increment
    from credit_tpu.rollout import RolloutEngine
    from credit_tpu.trainers.trainer import Trainer, load_trainer

    exp = build_experiment(conf)
    pconf = conf.get("predict", {}) or {}
    n_steps = n_steps or int(pconf.get("forecast_steps", 4))
    save_dir = save_dir or pconf.get("save_forecast") or os.path.join(
        conf.get("save_loc", "."), "forecasts")
    lead_hours = int(conf.get("data", {}).get("lead_time_periods", 6))

    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"], exp["schema"],
                  exp["dataset"], exp["valid_dataset"],
                  save_loc=conf.get("save_loc", "./ckpt"),
                  normalizer=exp["normalizer"])
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = os.path.join(trainer.save_loc, "checkpoint")
    if os.path.exists(ckpt):
        state = trainer.load_checkpoint(state)
        logger.info("loaded weights from %s", ckpt)
    else:
        logger.warning("no checkpoint at %s — rolling out with fresh init", ckpt)
    variables = converge_spectral({"params": state.params, "spectral": state.spectral})

    from credit_tpu.postblock import build_postblocks

    postblocks = build_postblocks(conf, exp["schema"], exp["grid"], exp["normalizer"])
    engine = RolloutEngine(exp["model"], variables, exp["schema"], exp["normalizer"],
                           history_len=trainer.history_len, postblocks=postblocks,
                           use_ema=use_ema)

    dataset = exp["dataset"]
    inits = _resolve_init_indices(pconf, dataset)
    # rank-strided multi-init loop (reference: rollout_to_netcdf.py:266 —
    # each rank rolls out its stride of the init list)
    from credit_tpu.forecast import strided_for_rank

    inits = strided_for_rank(inits, jax.process_index(), jax.process_count())
    ens = int(pconf.get("ensemble_size", 1) or 1)
    noise_std = float(pconf.get("perturbation_std", 1e-3))

    written = []
    for t0, label in inits:
        x_ic = jnp.asarray(dataset.input_at(t0)[None])
        members = [("", x_ic)]
        if ens > 1:
            # IC perturbations (reference ensemble rollout: gaussian noise or
            # bred vectors; members get their own output dirs _eNN)
            base_key = jax.random.fold_in(
                jax.random.PRNGKey(int(pconf.get("seed", 0))), t0)
            if pconf.get("perturbation", "gaussian") == "bred":
                from credit_tpu.ensemble.bred_vector import generate_bred_vectors

                # breeding needs a PURE step (it runs inside lax.scan):
                # use the engine's jitted step with a fixed key/state
                _bred_states = engine._init_states(engine.postblocks,
                                                   x_ic.shape[0])
                _bred_key = jax.random.PRNGKey(0)

                def step_fn(x):
                    _, x2, _, _ = engine._step_nofrc(engine.variables, x,
                                                     _bred_states, _bred_key)
                    return x2

                ics = generate_bred_vectors(
                    step_fn, x_ic, base_key, ens - 1,
                    amplitude=noise_std,
                    n_cycles=int(pconf.get("bred_cycles", 3)))
                members = [("", x_ic)] + [
                    (f"_e{m + 1:02d}", ic) for m, ic in enumerate(ics)]
            else:
                from credit_tpu.ensemble.noise import GaussianNoise

                g = GaussianNoise(noise_std)
                members = [("", x_ic)] + [
                    (f"_e{m:02d}", g(jax.random.fold_in(base_key, m), x_ic))
                    for m in range(1, ens)]
        for suffix, x0 in members:
            init_label = f"{label}{suffix}"

            def forcing(s, t0=t0):
                f = (dataset.forcing_at(t0 + s)
                     if hasattr(dataset, "forcing_at") else None)
                return None if f is None else f[None]

            def writer(step, y, init_label=init_label):
                p = save_netcdf_increment(
                    y[0], exp["schema"], exp["grid"], save_dir, init_label,
                    (step + 1) * lead_hours)
                written.append(p)

            engine.run(x0, n_steps, forcing_provider=forcing, on_step=writer)
    logger.info("wrote %d forecast files (%d inits x %d members) to %s",
                len(written), len(inits), ens, save_dir)
    return written


def diff_rollout(paths, ref, rtol: float = 2e-4, atol: float = 2e-4):
    """Compare produced rollout netCDFs against reference files — the
    HF-checkpoint parity acceptance (north star: 0.25-deg rollout allclose
    vs the published PyTorch checkpoints; see docs/HF_PARITY.md for the
    one-command runbook and expected tolerances).

    `ref` is a directory mirroring the output tree (matched by relative
    path, falling back to basename) or a single file when one path was
    written. Returns a report list; entry['ok'] per file, per-variable
    max-abs/rel errors. atol is applied RELATIVE to each variable's
    reference max-abs (the torch-parity tolerance convention,
    tests/test_torch_parity.py)."""
    import numpy as np

    from credit_tpu.utils.ncio import open_dataset

    paths = list(paths)
    report = []
    for p in paths:
        if os.path.isdir(ref):
            cand = [os.path.join(ref, os.path.join(
                os.path.basename(os.path.dirname(p)), os.path.basename(p))),
                os.path.join(ref, os.path.basename(p))]
            rp = next((c for c in cand if os.path.exists(c)), None)
        elif len(paths) == 1:
            rp = ref
        else:
            # multiple outputs against a single ref FILE: only the output
            # whose basename matches diffs against it — everything else is
            # 'no matching reference', not a misleading per-variable FAIL
            # (round-4 advisor finding)
            rp = ref if (os.path.exists(ref) and os.path.basename(p)
                         == os.path.basename(ref)) else None
        if rp is None or not os.path.exists(rp):
            report.append({"path": p, "ref": None, "ok": False,
                           "error": "no matching reference file"})
            continue
        ours, theirs = open_dataset(p), open_dataset(rp)
        entry = {"path": p, "ref": rp, "vars": {}, "ok": True}
        for name in theirs.keys():
            if name not in ours:
                entry["vars"][name] = {"missing": True}
                entry["ok"] = False
                continue
            a = np.asarray(ours[name].values, np.float64)
            b = np.asarray(theirs[name].values, np.float64)
            if a.shape != b.shape:
                entry["vars"][name] = {"shape": (a.shape, b.shape)}
                entry["ok"] = False
                continue
            scale = np.abs(b).max() or 1.0
            err = np.abs(a - b).max()
            ok = bool(err <= atol * scale + rtol * scale)
            entry["vars"][name] = {"max_abs": float(err),
                                   "rel": float(err / scale), "ok": ok}
            entry["ok"] = entry["ok"] and ok
        report.append(entry)
    return report


def _resolve_init_indices(pconf: dict, dataset):
    """-> [(clock_index, label)]: predict.forecasts datetimes when the
    dataset has a datetime clock (reference: forecast.py:39
    generate_forecasts), explicit integer indices, or the single default
    init at history_len."""
    fc = pconf.get("forecasts")
    if fc is not None and hasattr(dataset, "index_of"):
        from credit_tpu.forecast import generate_forecasts

        out = []
        for when in generate_forecasts(pconf):
            idx = dataset.index_of(when.isoformat())
            out.append((idx, when.strftime("%Y-%m-%dT%HZ")))
        return out
    if isinstance(fc, list) and fc and isinstance(fc[0], int):
        return [(int(i), f"init{int(i):04d}") for i in fc]
    if fc is not None and not hasattr(dataset, "index_of"):
        # integer-clock datasets: expand duration x start_hours as offsets
        from credit_tpu.forecast import generate_forecasts

        base = dataset.history_len
        n = len(generate_forecasts(pconf))
        return [(base + i, f"init{base + i:04d}")
                for i in range(n) if base + i < len(dataset) - 1]
    t0 = dataset.history_len
    return [(t0, pconf.get("init_label", f"init{t0:04d}"))]
