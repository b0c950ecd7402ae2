"""Hyperparameter-search objective (reference: the echo/Optuna Objective
classes in credit's applications). Runs with a stub trial — optuna is not a
hard dependency."""

import copy

import numpy as np

from credit_tpu.tuning import Objective, set_by_path, suggest_overrides

from tests.test_rollout_multi_init import CONF


class StubTrial:
    number = 0

    def __init__(self):
        self.suggested = {}
        self.reports = []

    def suggest_float(self, name, low, high, log=False):
        v = (low * high) ** 0.5 if log else (low + high) / 2
        self.suggested[name] = v
        return v

    def suggest_int(self, name, low, high):
        v = (low + high) // 2
        self.suggested[name] = v
        return v

    def suggest_categorical(self, name, choices):
        self.suggested[name] = choices[0]
        return choices[0]

    def report(self, value, step):
        self.reports.append((step, value))

    def should_prune(self):
        return False


def test_set_by_path_and_suggest():
    conf = {}
    set_by_path(conf, "trainer.learning_rate", 1e-4)
    assert conf == {"trainer": {"learning_rate": 1e-4}}
    t = StubTrial()
    out = suggest_overrides(t, {
        "trainer.learning_rate": {"type": "float", "low": 1e-5,
                                  "high": 1e-3, "log": True},
        "model.dim_head": {"type": "categorical", "choices": [16, 32]},
        "trainer.num_epoch": {"type": "int", "low": 1, "high": 3},
    })
    assert 1e-5 < out["trainer.learning_rate"] < 1e-3
    assert out["model.dim_head"] == 16 and out["trainer.num_epoch"] == 2


def test_objective_runs_trial_and_reports(tmp_path):
    conf = copy.deepcopy(CONF)
    conf["save_loc"] = str(tmp_path)
    conf["trainer"].update({"num_epoch": 2, "batches_per_epoch": 2,
                            "valid_batches_per_epoch": 1, "use_ema": False})
    obj = Objective(conf, metric="train_loss", space={
        "trainer.learning_rate": {"type": "float", "low": 1e-4,
                                  "high": 1e-2, "log": True}})
    t = StubTrial()
    val = obj(t)
    assert np.isfinite(val) and val > 0
    assert "trainer.learning_rate" in t.suggested
    # the per-epoch pruning hook reported validation losses
    assert len(t.reports) == 2
    # each trial gets its own save_loc (training_log.csv is append-mode;
    # shared dirs would mix trials)
    import os

    assert os.path.exists(tmp_path / "trial_0000" / "training_log.csv")
