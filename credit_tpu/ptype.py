"""Precipitation-type classification post-processor.

TPU-native re-design of the reference's CreditPostProcessor
(reference: credit/credit_ptype.py:19 — a pretrained keras/mlguess
evidential MLP over (T, Td) height profiles producing rain/snow/ice-pellet/
freezing-rain probabilities with aleatoric+epistemic uncertainty, plus
dewpoint derivation via metpy). Here the classifier is a flax evidential
MLP (Dirichlet evidence head) whose weights load from npz, dewpoint comes
from an explicit Magnus inversion (no metpy), and the whole grid classifies
in one jitted call instead of per-column keras batches.

Output variable names match the reference's save_vars (ML_rain, ML_crain,
ML_rain_ale/epi, ... credit_ptype.py:21-39) so downstream netCDF consumers
are drop-in."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PTYPES = ("rain", "snow", "icep", "frzr")


def dewpoint_from_q(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Dewpoint (K) from specific humidity (kg/kg) and pressure (Pa) via the
    Magnus formula inverted on vapor pressure (reference uses
    metpy.dewpoint_from_specific_humidity, credit_ptype.py:50)."""
    w = q / jnp.maximum(1.0 - q, 1e-6)              # mixing ratio
    e = p * w / (0.622 + w)                         # vapor pressure (Pa)
    ln = jnp.log(jnp.maximum(e, 1e-3) / 611.2)
    td_c = 243.5 * ln / (17.67 - ln)
    return td_c + 273.15


class PTypeNet(nn.Module):
    """Evidential MLP over the concatenated (T, Td) column profile
    (the mlguess CategoricalDNN evidential architecture analogue)."""

    hidden: Sequence[int] = (64, 64)
    n_classes: int = len(PTYPES)

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden):
            x = nn.relu(nn.Dense(h, name=f"fc{i}")(x))
        # evidence >= 0 -> Dirichlet concentration alpha = evidence + 1
        return nn.softplus(nn.Dense(self.n_classes, name="evidence")(x))


def evidential_outputs(evidence: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Dirichlet evidence -> probabilities + uncertainties (mlguess
    evidential_cat_loss convention: alpha = e+1, S = sum alpha,
    p = alpha/S, epistemic u = K/S, aleatoric = p(1-p)*S/(S+1) var)."""
    alpha = evidence + 1.0
    s = alpha.sum(-1, keepdims=True)
    p = alpha / s
    k = evidence.shape[-1]
    epistemic = k / s[..., 0]
    aleatoric = (p * (1.0 - p) * s / (s + 1.0))
    return {"prob": p, "u": epistemic, "ale": aleatoric,
            "epi": p * (1.0 - p) / (s + 1.0)}


class PTypeClassifier:
    """Grid-wide precip-type classification (reference:
    credit_ptype.py:167 grid_predictions + :254 ptype_classification)."""

    def __init__(self, weights_path: Optional[str] = None,
                 hidden: Sequence[int] = (64, 64),
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None):
        self.net = PTypeNet(hidden=tuple(hidden))
        self.params = None
        self.mean, self.std = mean, std
        if weights_path:
            data = np.load(weights_path, allow_pickle=False)
            self.params = {}
            for key in data.files:
                if key in ("mean", "std"):
                    setattr(self, key, data[key])
                    continue
                node = self.params
                *path, leaf = key.split("/")
                for pkey in path:
                    node = node.setdefault(pkey, {})
                node[leaf] = data[key]

    def init(self, rng, n_features: int):
        self.params = self.net.init(rng, jnp.zeros((1, n_features)))["params"]
        return self.params

    def save(self, path: str):
        flat = {}

        def walk(tree, prefix=""):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, prefix + k + "/")
                else:
                    flat[prefix + k] = np.asarray(v)

        walk(self.params)
        if self.mean is not None:
            flat["mean"], flat["std"] = self.mean, self.std
        np.savez(path, **flat)

    def __call__(self, t_profile: jnp.ndarray, td_profile: jnp.ndarray
                 ) -> Dict[str, np.ndarray]:
        """t/td_profile: (..., L) column profiles (K). Returns the
        reference's ML_* fields on the leading grid shape."""
        if self.params is None:
            raise RuntimeError("classifier has no weights: call init() or "
                               "load from weights_path")
        feats = jnp.concatenate([t_profile, td_profile], axis=-1)
        if self.mean is not None:
            feats = (feats - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        grid_shape = feats.shape[:-1]
        flat = feats.reshape(-1, feats.shape[-1])
        ev = self.net.apply({"params": self.params}, flat)
        out = evidential_outputs(ev)
        prob = out["prob"].reshape(*grid_shape, len(PTYPES))
        ale = out["ale"].reshape(*grid_shape, len(PTYPES))
        epi = out["epi"].reshape(*grid_shape, len(PTYPES))
        winner = jnp.argmax(prob, axis=-1)
        fields: Dict[str, np.ndarray] = {
            "ML_u": np.asarray(out["u"].reshape(grid_shape))}
        for i, name in enumerate(PTYPES):
            fields[f"ML_{name}"] = np.asarray(prob[..., i])
            fields[f"ML_c{name}"] = np.asarray((winner == i).astype(np.float32))
            fields[f"ML_{name}_ale"] = np.asarray(ale[..., i])
            fields[f"ML_{name}_epi"] = np.asarray(epi[..., i])
        return fields

    def classify_state(self, y_pred, schema, grid, t_var: str = "T",
                       q_var: str = "Q", sp_var: str = "SP"):
        """Classify directly from a flat prediction tensor: derive the
        column pressures from SP + the grid's hybrid coefficients, dewpoint
        from Q, then run the evidential net (reference: dewpoint_temp +
        extract_variable_levels, credit_ptype.py:41,105)."""
        from credit_tpu.physics.interp import create_pressure_grid
        from credit_tpu.postblock import _VarView

        t = _VarView(schema, t_var).get(y_pred)
        q = _VarView(schema, q_var).get(y_pred)
        sp = _VarView(schema, sp_var).get(y_pred)
        if grid.ak is not None:
            _, p = create_pressure_grid(sp, jnp.asarray(grid.ak, jnp.float32),
                                        jnp.asarray(grid.bk, jnp.float32))
        else:
            p = jnp.broadcast_to(jnp.asarray(grid.levels, jnp.float32),
                                 t.shape)
        td = dewpoint_from_q(q, p)
        return self(t, td)
