"""Realtime rollout: NWP (GFS) initial conditions -> forecast netCDF.

Re-designs the reference's realtime app
(reference: applications/rollout_realtime.py + credit/nwp.py:27): build the
IC from a decoded NWP analysis (GRIB via cfgrib when installed, or a
pre-decoded .npz cube — this image has no GRIB codecs), normalize, roll the
model forward on device, write per-step netCDF with the realtime init label.

npz layout for `realtime.fields_path`:
  lat (H,), lon (W,), pressure (L,) [Pa]   — source grid
  <var> (L, H, W) or (H, W)                — GFS short names or ERA5 names
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def load_fields_npz(path: str):
    data = np.load(path)
    coords = {k: data[k] for k in ("lat", "lon", "pressure") if k in data}
    fields = {k: data[k] for k in data.files
              if k not in ("lat", "lon", "pressure")}
    return fields, coords


def run_realtime(conf: dict, n_steps: Optional[int] = None,
                 save_dir: Optional[str] = None, fields=None, coords=None):
    """credit-tpu realtime: IC from NWP -> rollout -> netCDF paths."""
    import jax
    import jax.numpy as jnp

    from credit_tpu.applications.experiment import build_experiment
    from credit_tpu.models.spectral_utils import converge_spectral
    from credit_tpu.nwp import build_gfs_init, load_gfs_grib
    from credit_tpu.output import save_netcdf_increment
    from credit_tpu.postblock import build_postblocks
    from credit_tpu.rollout import RolloutEngine
    from credit_tpu.trainers.trainer import load_trainer

    rconf = conf.get("realtime", {}) or {}
    exp = build_experiment(conf)
    n_steps = n_steps or int(rconf.get("forecast_steps",
                                       conf.get("predict", {})
                                       .get("forecast_steps", 4)))
    save_dir = save_dir or rconf.get("save_forecast") or os.path.join(
        conf.get("save_loc", "."), "realtime")
    lead_hours = int(conf.get("data", {}).get("lead_time_periods", 6))

    # ensemble realtime: per-member decoded cubes (GEFS control +
    # perturbations) roll out together on the batch axis
    # (reference: applications/rollout_realtime_gefs.py + gefs.py:206)
    member_fields = None
    if fields is None and rconf.get("member_fields_paths"):
        member_fields = {}
        for key, p in dict(rconf["member_fields_paths"]).items():
            f, coords = load_fields_npz(p)
            member_fields[key] = f
    elif fields is None:
        if rconf.get("fields_path"):
            fields, coords = load_fields_npz(rconf["fields_path"])
        elif rconf.get("grib_path"):
            fields = load_gfs_grib(rconf["grib_path"],
                                   rconf.get("variables", []))
            coords = {"lat": np.asarray(rconf["src_lat"]),
                      "lon": np.asarray(rconf["src_lon"]),
                      "pressure": np.asarray(rconf["src_pressure"])}
        else:
            raise ValueError("realtime needs fields_path (npz), "
                             "member_fields_paths ({member: npz}), or "
                             "grib_path")

    # static/forcing channels the NWP analysis lacks come from the training
    # dataset's IC at its first valid time (reference keeps them model-side)
    static = {}
    try:
        x_ref = exp["dataset"].input_at(exp["dataset"].history_len)
        for e in exp["schema"].input_entries:
            if e.field_type in ("static", "dynamic_forcing"):
                static[e.name] = np.asarray(x_ref[-1, :, :, e.index])
    except Exception as e:
        logger.debug("no dataset statics for realtime IC (%s)", e)
    ak = np.asarray(exp["grid"].ak) if exp["grid"].ak is not None else None
    bk = np.asarray(exp["grid"].bk) if exp["grid"].bk is not None else None
    members = None
    if member_fields is not None:
        from credit_tpu.nwp import build_gefs_init

        ic, members = build_gefs_init(
            exp["schema"], exp["grid"], member_fields,
            coords["lat"], coords["lon"], coords.get("pressure"),
            a_half=ak, b_half=bk, static_fields=static)
        logger.info("realtime ensemble: %d members (%s)", len(members),
                    ", ".join(members))
    else:
        ic = build_gfs_init(
            exp["schema"], exp["grid"], fields,
            coords["lat"], coords["lon"], coords.get("pressure"),
            a_half=ak, b_half=bk, static_fields=static)

    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"],
                  exp["schema"], exp["dataset"], exp["valid_dataset"],
                  save_loc=conf.get("save_loc", "./ckpt"),
                  normalizer=exp["normalizer"])
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = os.path.join(trainer.save_loc, "checkpoint")
    if os.path.exists(ckpt):
        state = trainer.load_checkpoint(state)
    else:
        logger.warning("no checkpoint at %s — fresh weights", ckpt)
    variables = converge_spectral({"params": state.params,
                                   "spectral": state.spectral})
    post = build_postblocks(conf, exp["schema"], exp["grid"], exp["normalizer"])
    engine = RolloutEngine(exp["model"], variables, exp["schema"],
                           exp["normalizer"], history_len=trainer.history_len,
                           postblocks=post)

    x0 = jnp.asarray(ic)  # physical units; the engine normalizes on entry
    label = rconf.get("init_label", "realtime")
    written = []

    def writer(step, y):
        if members is not None:  # one directory per ensemble member
            for i, m in enumerate(members):
                p = save_netcdf_increment(
                    y[i], exp["schema"], exp["grid"],
                    os.path.join(save_dir, m), label,
                    (step + 1) * lead_hours)
                written.append(p)
        else:
            p = save_netcdf_increment(y[0], exp["schema"], exp["grid"],
                                      save_dir, label,
                                      (step + 1) * lead_hours)
            written.append(p)

    engine.run(x0, n_steps, on_step=writer)
    logger.info("realtime: wrote %d files to %s", len(written), save_dir)
    return written
