"""Offline ensemble-eval app over a saved rollout tree (reference:
applications/ensemble_eval.py — verification from netCDF files, no model)."""

import json
import os

import numpy as np

from credit_tpu.applications.ensemble_eval import (discover_groups,
                                                   evaluate_tree,
                                                   run_ensemble_eval)
from credit_tpu.applications.experiment import run_rollout

from tests.test_rollout_multi_init import CONF


def _rollout_tree(tmp_path, ens=3, steps=2):
    conf = {**CONF, "save_loc": str(tmp_path / "ckpt"),
            "predict": {"forecast_steps": steps, "ensemble_size": ens,
                        "perturbation_std": 0.05,
                        "save_forecast": str(tmp_path / "out")}}
    run_rollout(conf)
    return conf, str(tmp_path / "out")


def test_discover_groups(tmp_path):
    conf, root = _rollout_tree(tmp_path)
    groups = discover_groups(root)
    assert list(groups) == ["init0001"]
    assert groups["init0001"] == ["init0001", "init0001_e01", "init0001_e02"]


def test_evaluate_tree_rows(tmp_path):
    conf, root = _rollout_tree(tmp_path)
    rows = evaluate_tree(conf, root, n_bins=4)
    assert len(rows) == 2  # two leads
    r = rows[0]
    assert r["init"] == "init0001" and r["n_members"] == 3
    assert r["lead_hours"] == 6
    # ensemble spread is positive (perturbed ICs diverge)
    assert r["spread"] > 0
    # truth-dependent metrics present (initNNNN label -> dataset clock)
    assert np.isfinite(r["rmse"]) and r["rmse"] > 0
    assert 0 < r["spread_skill_ratio"] < 100
    assert len(r["bin_spread"]) == 4 and len(r["bin_rmse"]) == 4
    assert len(r["error_zonal_power"]) >= 1
    # spread grows (or at least persists) with lead
    assert rows[1]["lead_hours"] == 12 and rows[1]["spread"] > 0


def test_cli_ensemble_eval(tmp_path, monkeypatch):
    import yaml

    from credit_tpu.cli.main import main

    conf, root = _rollout_tree(tmp_path, ens=2, steps=1)
    cpath = tmp_path / "c.yml"
    cpath.write_text(yaml.safe_dump(conf))
    out = tmp_path / "eval.json"
    assert main(["ensemble-eval", str(cpath), root, "--bins", "3",
                 "--out", str(out)]) == 0
    rows = json.loads(out.read_text())
    assert rows and rows[0]["n_members"] == 2


def test_spread_error_regional_bands():
    """Band partition: tropics-only error shows up in the tropics band, not
    the extratropics; global std carries the (M+1)/(M-1) correction
    (reference: credit/verification/ensemble.py:14-45)."""
    import jax.numpy as jnp

    from credit_tpu.metrics import spread_error_regional

    rng = np.random.default_rng(0)
    lats = np.linspace(90, -90, 19)  # 10-deg grid, descending like ERA5
    target = np.zeros((1, 19, 36, 2), np.float32)
    m = 4
    ens = np.zeros((1, m, 19, 36, 2), np.float32)
    # constant ensemble spread of 1 everywhere (members at +-1, +-1)
    ens[:, 0] += 1.0
    ens[:, 1] -= 1.0
    ens[:, 2] += 1.0
    ens[:, 3] -= 1.0
    # mean error only in the tropics rows (|lat| < 24.5)
    trop = np.abs(lats) < 24.5
    target[:, trop] += 2.0
    out = spread_error_regional(jnp.asarray(target), jnp.asarray(ens), lats)
    np.testing.assert_allclose(out["rmse_tropics"], 2.0, rtol=1e-5)
    assert out["rmse_n_extratropics"] < 1e-6
    assert out["rmse_s_extratropics"] < 1e-6
    # std: population std of [+1,-1,+1,-1] = 1, corrected by (m+1)/(m-1)
    np.testing.assert_allclose(out["std_global"], (m + 1) / (m - 1), rtol=1e-5)
