"""Config loading + validation.

The reference's gen1 path is a 1,700-line imperative validator
(reference: credit/parser.py:79 credit_main_parser); gen2 consumes the YAML
directly with section-local validation. We follow the gen2 style: load YAML,
normalize legacy (gen1 flat-schema) keys into the gen2 nested form
(the `credit convert` behavior, reference: credit/cli/_convert.py:11), and
validate with focused checks that raise actionable errors.
"""

from __future__ import annotations

import copy
import logging
import os
from typing import Any, Dict

import yaml

logger = logging.getLogger(__name__)

_KNOWN_SECTIONS = {
    "save_loc", "seed", "data", "data_valid", "model", "loss", "trainer",
    "predict", "preblocks", "postblocks", "custom_objects", "ensemble",
    "diffusion", "skebs", "distributed", "pbs", "slurm", "gcloud",
    "optuna", "realtime", "metadata",  # tune / cmd_realtime / variable_attrs
}

_PATH_KEYS = ("save_loc", "path", "mean_path", "std_path", "save_forecast",
              "climatology", "static_path", "param_file")


def _expand_paths(node):
    """In-place $VAR / ${VAR} expansion on path-like keys (reference:
    credit/parser.py expands $USER etc. in save_loc and data paths)."""
    if isinstance(node, dict):
        for k, v in node.items():
            if k in _PATH_KEYS and isinstance(v, str):
                node[k] = os.path.expandvars(v)
            else:
                _expand_paths(v)
    elif isinstance(node, list):
        for v in node:
            _expand_paths(v)


def load_config(path_or_dict, require_model: bool = True) -> Dict[str, Any]:
    """Load + validate a config.

    require_model=False admits data-only configs (no `model` section) — the
    reference ships such configs for the preprocessing/scaler-fitting path
    (e.g. config/gen_2/examples/weatherbench2_era5_wxformer.yml) and its
    preprocess application never touches the model.
    """
    if isinstance(path_or_dict, dict):
        conf = copy.deepcopy(path_or_dict)
    else:
        with open(path_or_dict) as f:
            conf = yaml.safe_load(f)
    conf = convert_legacy(conf)
    _expand_paths(conf)
    for key in conf:
        if key not in _KNOWN_SECTIONS:
            logger.warning("unknown config section %r (typo?)", key)
    validate(conf, require_model=require_model)
    return conf


def convert_legacy(conf: dict) -> dict:
    """Map gen1 flat data schema -> gen2 nested source schema
    (reference: cli/_convert.py converts variables/surface_variables/... into
    data.source.*.variables)."""
    data = conf.get("data", {}) or {}
    if "source" in data:
        return conf
    if not any(k in data for k in ("variables", "surface_variables")):
        return conf
    src = {
        "levels": data.get("levels", list(range(conf.get("model", {}).get("levels", 1)))),
        "variables": {
            "prognostic": {
                "vars_3D": data.get("variables", []) or [],
                "vars_2D": data.get("surface_variables", []) or [],
            },
            "dynamic_forcing": {
                "vars_2D": (data.get("dynamic_forcing_variables", []) or [])
                + (data.get("forcing_variables", []) or []),
            },
            "static": {"vars_2D": data.get("static_variables", []) or []},
            "diagnostic": {"vars_2D": data.get("diagnostic_variables", []) or []},
        },
    }
    conf = copy.deepcopy(conf)
    conf["data"]["source"] = {"ERA5": src}
    return conf


def validate(conf: dict, require_model: bool = True) -> None:
    errors = []
    if "model" not in conf:
        if require_model:
            errors.append("missing 'model' section")
    else:
        m = conf["model"]
        if "type" not in m:
            errors.append("model.type is required")
        for k in ("image_height", "image_width"):
            if k in m and int(m[k]) <= 0:
                errors.append(f"model.{k} must be positive")
    if "data" in conf and conf["data"] and "source" in (conf["data"] or {}):
        for name, src in conf["data"]["source"].items():
            variables = src.get("variables")
            if not variables:
                errors.append(f"data.source.{name}.variables is required")
            elif "prognostic" not in variables:
                errors.append(f"data.source.{name}.variables needs a 'prognostic' group")
    t = conf.get("trainer", {}) or {}
    p = t.get("parallelism")
    if p:
        for k in ("tensor", "domain"):
            if k in p and p[k] not in (None, "none") and int(p[k]) < 1:
                errors.append(f"trainer.parallelism.{k} must be >= 1")
        if p.get("halo", "gspmd") not in ("gspmd", "explicit"):
            errors.append("trainer.parallelism.halo must be 'gspmd' or "
                          "'explicit'")
        # flatten_optimizer concatenates the AdamW moments into ONE flat
        # vector — it has no param-shaped axes for ZeRO to shard, so on a
        # dp>1 mesh the moments would silently replicate (2x param bytes
        # per chip). The flag exists to fit the remote-compile tunnel's
        # module-size limit on ONE chip (docs/PERF.md); reject the
        # combination instead of wasting pod HBM.
        data = p.get("data", "none")
        if (t.get("flatten_optimizer", False)
                and data not in (None, "none", 1) and int(data) > 1):
            errors.append(
                "trainer.flatten_optimizer is incompatible with "
                "parallelism.data > 1: the flat moment vector cannot be "
                "ZeRO-sharded like the params (it would replicate, costing "
                "2x param bytes per chip). Unset flatten_optimizer on "
                "multi-chip meshes.")
    for k in ("learning_rate",):
        if k in t and float(t[k]) <= 0:
            errors.append(f"trainer.{k} must be positive")
    for k in ("train_batch_size", "valid_batch_size", "num_epoch",
              "grad_accum_steps"):
        if k in t and int(t[k]) < 1:
            errors.append(f"trainer.{k} must be >= 1")
    d = conf.get("data", {}) or {}
    for k in ("history_len", "forecast_len"):
        if k in d and int(d[k]) < 1:
            errors.append(f"data.{k} must be >= 1 "
                          "(history/forecast are counted in frames)")
    pr = conf.get("predict", {}) or {}
    if "forecast_steps" in pr and int(pr["forecast_steps"]) < 1:
        errors.append("predict.forecast_steps must be >= 1")
    if errors:
        raise ValueError("Invalid config:\n  - " + "\n  - ".join(errors))


def model_channel_check(conf: dict, schema) -> None:
    """Cross-check model channel arithmetic against the data schema
    (the gen2 analogue of the reference's training_data_check)."""
    m = conf["model"]
    expected_in = (int(m.get("channels", 0)) * int(m.get("levels", 1))
                   + int(m.get("surface_channels", 0))
                   + int(m.get("input_only_channels", 0)))
    if expected_in != schema.n_input:
        raise ValueError(
            f"model expects {expected_in} input channels "
            f"(channels*levels + surface + input_only) but the data schema "
            f"provides {schema.n_input}: {schema.input_names}")
