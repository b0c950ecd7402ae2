"""CLI tests (reference: tests/test_cli.py, test_pbs_scripts.py — assert
generated script text and command wiring without heavy runs)."""

import os

import pytest
import yaml

from credit_tpu.cli.main import build_parser, main


def _write_tiny_conf(tmp_path):
    conf = {
        "save_loc": str(tmp_path / "exp"),
        "data": {"source": {"E": {"levels": [0.0], "variables": {
            "prognostic": {"vars_2D": ["T", "SP"]}}}},
            "history_len": 1, "forecast_len": 1, "n_times": 12},
        "trainer": {"learning_rate": 1e-3, "train_batch_size": 2,
                    "batches_per_epoch": 2, "num_epoch": 1, "preflight": False},
        "model": {"type": "debugger", "image_height": 8, "image_width": 16,
                  "levels": 1, "channels": 0, "surface_channels": 2,
                  "input_only_channels": 0, "output_only_channels": 0},
        "loss": {"training_loss": "mse"},
        "predict": {"forecast_steps": 2},
    }
    p = tmp_path / "conf.yml"
    yaml.safe_dump(conf, open(p, "w"))
    return str(p)


def test_parser_has_all_subcommands():
    p = build_parser()
    subs = next(a for a in p._actions if a.dest == "cmd").choices
    for cmd in ["init", "train", "rollout", "rollout-metrics", "preprocess",
                "convert", "convert-checkpoint", "metrics", "plot", "submit",
                "benchmark", "summary", "serve", "tune"]:
        assert cmd in subs, cmd


def test_tune_without_optuna_fails_cleanly(tmp_path, monkeypatch):
    """`credit-tpu tune` without optuna installed exits 2 with guidance."""
    monkeypatch.chdir(tmp_path)
    conf = _write_tiny_conf(tmp_path)
    import builtins

    real_import = builtins.__import__

    def fake(name, *a, **k):
        if name == "optuna":
            raise ImportError("no optuna")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake)
    assert main(["tune", conf, "--trials", "1"]) == 2


def test_init_writes_template(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["init", "t.yml"]) == 0
    conf = yaml.safe_load(open("t.yml"))
    assert conf["model"]["type"] == "crossformer"
    # refuses overwrite without --force
    assert main(["init", "t.yml"]) == 1
    assert main(["init", "t.yml", "--force"]) == 0


def test_submit_generates_scripts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    conf = _write_tiny_conf(tmp_path)
    for sched, needle in (("slurm", "#SBATCH"), ("pbs", "#PBS"),
                          ("gcloud", "--worker=all")):
        assert main(["submit", conf, "--scheduler", sched,
                     "--out", f"l_{sched}.sh"]) == 0
        text = open(f"l_{sched}.sh").read()
        assert needle in text, (sched, text)
        assert os.access(f"l_{sched}.sh", os.X_OK)


def test_submit_resubmit_chain(tmp_path, monkeypatch):
    """--resubmit N writes a dependency-chained restart script
    (reference: credit submit --resubmit, cli/_submit.py _compute_chain)."""
    monkeypatch.chdir(tmp_path)
    conf = _write_tiny_conf(tmp_path)
    assert main(["submit", conf, "--scheduler", "pbs", "--out", "j.sh",
                 "--resubmit", "3"]) == 0
    chain = open("j_chain.sh").read()
    assert "depend=afterok:$PREV" in chain and "seq 3" in chain
    assert os.access("j_chain.sh", os.X_OK)
    assert main(["submit", conf, "--scheduler", "slurm", "--out", "s.sh",
                 "--resubmit", "2"]) == 0
    chain = open("s_chain.sh").read()
    assert "--dependency=afterok:$PREV" in chain and "--parsable" in chain


def test_convert_legacy_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    legacy = {"data": {"variables": ["U"], "surface_variables": ["SP"],
                       "levels": [0, 1]},
              "model": {"type": "crossformer", "levels": 2}}
    yaml.safe_dump(legacy, open("old.yml", "w"))
    assert main(["convert", "old.yml", "--out", "new.yml"]) == 0
    conv = yaml.safe_load(open("new.yml"))
    assert "source" in conv["data"]


def test_train_rollout_metrics_summary_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    conf = _write_tiny_conf(tmp_path)
    assert main(["summary", conf]) == 0
    assert main(["train", conf]) == 0
    assert os.path.exists(tmp_path / "exp" / "training_log.csv")
    assert main(["rollout", conf, "--steps", "2"]) == 0
    fdir = tmp_path / "exp" / "forecasts" / "init0001"
    files = sorted(os.listdir(fdir))
    assert len(files) == 2
    assert main(["metrics", conf, *(str(fdir / f) for f in files)]) == 0
    assert main(["preprocess", conf, "--samples", "4"]) == 0
    assert os.path.exists(tmp_path / "exp" / "normalization.npz")


def test_preprocess_accepts_data_only_config(tmp_path, monkeypatch):
    """Data-only configs (no `model` section) work for preprocessing, like
    the reference's weatherbench2_era5_wxformer.yml (grid dims come from the
    source's resolution field)."""
    monkeypatch.chdir(tmp_path)
    conf = {
        "save_loc": str(tmp_path / "exp"),
        "data": {"source": {"E": {"resolution": "16x8", "levels": [0.0],
                                  "variables": {"prognostic": {
                                      "vars_2D": ["T", "SP"]}}}},
                 "history_len": 1, "forecast_len": 1, "n_times": 12},
    }
    p = tmp_path / "donly.yml"
    yaml.safe_dump(conf, open(p, "w"))
    assert main(["preprocess", str(p), "--samples", "4"]) == 0
    assert os.path.exists(tmp_path / "exp" / "normalization.npz")
    # train on the same config must still fail loudly (model required)
    from credit_tpu.config import load_config

    with pytest.raises(ValueError):
        load_config(str(p))


def test_cli_solar_precompute(tmp_path, monkeypatch):
    """`credit-tpu solar` writes rank-strided TSI forcing files
    (reference: applications/calc_global_solar.py)."""
    import numpy as np

    from credit_tpu.cli.main import main
    from credit_tpu.utils.ncio import open_dataset

    out = tmp_path / "solar"
    assert main(["solar", "--start", "2000-06-01", "--end",
                 "2000-06-01 18:00", "--step", "6h", "--nlat", "19",
                 "--nlon", "36", "--out", str(out), "--world", "2",
                 "--rank", "1"]) == 0
    files = sorted(out.iterdir())
    assert len(files) == 2  # times 1 and 3 of 4
    ds = open_dataset(str(files[0]))
    tsi = np.asarray(ds["tsi"].values)
    assert tsi.shape == (1, 19, 36)
    assert np.all(tsi >= 0) and tsi.max() > 1e5  # J/m^2 over 6h, daylit side
    assert ds["tsi"].attrs.get("units") == "J m**-2"
