"""Metrics-only ensemble rollouts (reference:
applications/rollout_metrics.py, rollout_metrics_noisy_ic.py,
rollout_metrics_noisy_model.py)."""

import copy

import numpy as np
import pytest

from credit_tpu.applications.rollout_metrics import run_rollout_metrics

from tests.test_rollout_multi_init import CONF


def _run(perturbation, conf=None, members=3, steps=2):
    conf = copy.deepcopy(conf or CONF)
    conf.setdefault("predict", {})["ensemble"] = {
        "size": members, "perturbation": perturbation, "amplitude": 0.05}
    return run_rollout_metrics(conf, n_steps=steps, n_members=members,
                               perturbation=perturbation)


def test_noisy_ic_gaussian_rows():
    rows = _run("gaussian")
    assert len(rows) == 2
    for i, r in enumerate(rows):
        assert r["step"] == i + 1 and r["lead_hours"] == 6 * (i + 1)
        assert np.isfinite(r["crps"]) and np.isfinite(r["rmse"])
        assert r["spread"] > 0  # perturbed ICs diverge
        # per-channel CRPS columns (reference calculate_crps_per_channel)
        per_var = [v for k, v in r.items() if k.startswith("crps_")]
        assert per_var and all(np.isfinite(v) for v in per_var)
        assert abs(np.mean(per_var) - r["crps"]) < 1e-5


def test_noisy_model_spread_from_stochastic_model():
    """perturbation='model': identical ICs, spread comes from the model's own
    noise (reference rollout_metrics_noisy_model.py:333 repeats x across
    members and lets SDL noise make them diverge)."""
    conf = copy.deepcopy(CONF)
    # crossformer-ensemble carries SDL noise-injection layers
    conf["model"] = {
        "type": "crossformer-ensemble", "frames": 1, "output_frames": 1,
        "image_height": 32, "image_width": 64, "levels": 3, "channels": 1,
        "surface_channels": 1, "input_only_channels": 0,
        "output_only_channels": 0, "dim": [16, 32, 64, 128],
        "depth": [1, 1, 1, 1], "global_window_size": [2, 2, 2, 1],
        "local_window_size": 2, "dim_head": 8,
        "cross_embed_kernel_sizes": [[2, 4], [2, 2], [2, 2], [2, 2]],
        "cross_embed_strides": [2, 2, 2, 2], "use_spectral_norm": False,
        "interp": True, "noise_latent_dim": 8,
    }
    rows = _run("model", conf=conf, members=2, steps=1)
    assert rows[0]["spread"] > 0  # same x0, different noise streams
    assert np.isfinite(rows[0]["crps"])


def test_noisy_model_deterministic_model_has_zero_spread():
    """Sanity inverse: with a deterministic model, 'model' perturbation
    yields (near-)zero spread — members are bit-identical."""
    rows = _run("model", members=2, steps=1)
    assert rows[0]["spread"] < 1e-6
