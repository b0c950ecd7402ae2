"""Precip-type evidential classifier (reference: credit/credit_ptype.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.grid import Grid
from credit_tpu.ptype import (PTYPES, PTypeClassifier, dewpoint_from_q,
                              evidential_outputs)


def test_dewpoint_physics():
    # saturated air: Td == T. At T=20C, es ~ 2339 Pa -> q_sat at 1000 hPa
    t = 293.15
    es = 611.2 * np.exp(17.67 * (t - 273.15) / (t - 273.15 + 243.5))
    w = 0.622 * es / (1e5 - es)
    q = w / (1 + w)
    td = float(dewpoint_from_q(jnp.asarray(q), jnp.asarray(1e5)))
    assert abs(td - t) < 0.3
    # drier air -> lower dewpoint
    td_dry = float(dewpoint_from_q(jnp.asarray(q / 4), jnp.asarray(1e5)))
    assert td_dry < td - 5


def test_evidential_outputs_sane():
    ev = jnp.asarray([[10.0, 0.1, 0.1, 0.1], [0.0, 0.0, 0.0, 0.0]])
    out = evidential_outputs(ev)
    p = np.asarray(out["prob"])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
    assert p[0, 0] > 0.7                      # strong rain evidence
    assert out["u"][1] > out["u"][0]          # no evidence -> max uncertainty
    np.testing.assert_allclose(np.asarray(out["u"][1]), 1.0)


def test_classifier_fields_and_roundtrip(tmp_path):
    clf = PTypeClassifier(hidden=(8, 8))
    clf.init(jax.random.PRNGKey(0), n_features=6)
    t = jnp.asarray(np.random.default_rng(0).normal(270, 10, (4, 5, 3)),
                    jnp.float32)
    td = t - 2.0
    fields = clf(t, td)
    assert set(f"ML_{p}" for p in PTYPES) <= set(fields)
    assert fields["ML_rain"].shape == (4, 5)
    onehots = np.stack([fields[f"ML_c{p}"] for p in PTYPES], -1)
    np.testing.assert_allclose(onehots.sum(-1), 1.0)
    probs = np.stack([fields[f"ML_{p}"] for p in PTYPES], -1)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    clf.save(str(tmp_path / "w.npz"))
    clf2 = PTypeClassifier(weights_path=str(tmp_path / "w.npz"), hidden=(8, 8))
    f2 = clf2(t, td)
    np.testing.assert_allclose(f2["ML_rain"], fields["ML_rain"], rtol=1e-6)


def test_classify_state_from_flat_tensor():
    conf = {"data": {"source": {"ERA5": {
        "levels": [30000.0, 70000.0, 100000.0],
        "variables": {"prognostic": {"vars_3D": ["T", "Q"],
                                     "vars_2D": ["SP"]}}}}}}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(4, 8, levels=[30000.0, 70000.0, 100000.0])
    clf = PTypeClassifier(hidden=(8,))
    clf.init(jax.random.PRNGKey(0), n_features=6)
    rng = np.random.default_rng(1)
    y = np.zeros((1, 1, 4, 8, schema.n_target), np.float32)
    for i, n in enumerate(schema.target_names):
        if n.startswith("T"):
            y[..., i] = rng.normal(270, 5, (4, 8))
        elif n.startswith("Q"):
            y[..., i] = rng.uniform(1e-4, 5e-3, (4, 8))
        else:
            y[..., i] = 1e5
    fields = clf.classify_state(jnp.asarray(y), schema, grid)
    assert fields["ML_snow"].shape == (1, 1, 4, 8)
    assert np.isfinite(fields["ML_u"]).all()
