"""Host-side spectral-norm state utilities.

Spectral-norm u/v vectors live in the 'spectral' variable collection,
mirroring the params tree (see layers.SNMixin). `converge_spectral` runs the
power iteration to convergence in numpy after `model.init` — so the first
forward already divides by a true spectral-norm estimate (the reference
reaches the same state via per-forward power iterations,
reference: credit/models/wxformer/crossformer.py:23 apply_spectral_norm).
Doing it host-side keeps the init XLA graph small (compiling ~60 tiny
while-loops into one module is pathologically slow on XLA-CPU).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _l2(x, eps=1e-12):
    return x / (np.linalg.norm(x) + eps)


def converge_spectral(variables: Dict[str, Any], n_iter: int = 30) -> Dict[str, Any]:
    """Return a copy of `variables` with spectral u/v converged against the
    current params. Structure: spectral subtree mirrors params subtree; each
    SN layer holds {'u': (O,), 'v': (rest,)} beside params {'kernel': ...}."""
    if "spectral" not in variables:
        return variables
    # one batched device_get for the whole tree — per-leaf np.asarray costs a
    # full host round-trip each (painful over remote-TPU links)
    host = jax.device_get({"params": variables["params"],
                           "spectral": variables["spectral"]})
    params = host["params"]
    spectral = host["spectral"]

    def walk(spec: dict, prm: dict):
        if "u" in spec and "v" in spec and "kernel" in prm:
            k = np.asarray(prm["kernel"], np.float64)
            w2d = k.reshape(-1, k.shape[-1]).T  # (O, rest)
            u, v = np.asarray(spec["u"], np.float64), np.asarray(spec["v"], np.float64)
            for _ in range(n_iter):
                v = _l2(w2d.T @ u)
                u = _l2(w2d @ v)
            spec["u"] = u.astype(np.float32)
            spec["v"] = v.astype(np.float32)
            return
        for key, sub in spec.items():
            if isinstance(sub, dict) and key in prm:
                walk(sub, prm[key])

    walk(spectral, params)
    out = dict(variables)
    out["spectral"] = spectral
    return out


def converge_spectral_device(variables: Dict[str, Any], n_iter: int = 30
                             ) -> Dict[str, Any]:
    """On-device converge: one jitted tree of unrolled power iterations —
    no host round-trip (the host path device_gets the FULL param tree,
    which over a remote-TPU tunnel costs minutes for a 124M-param model).
    Same math as converge_spectral; use on real accelerators."""
    if "spectral" not in variables:
        return variables
    import jax.numpy as jnp

    def one_layer(spec, prm):
        if isinstance(spec, dict) and "u" in spec and "v" in spec \
                and "kernel" in prm:
            k = prm["kernel"].astype(jnp.float32)
            w2d = k.reshape(-1, k.shape[-1]).T  # (O, rest)

            def l2(x):
                return x / (jnp.linalg.norm(x) + 1e-12)

            u, v = spec["u"].astype(jnp.float32), spec["v"].astype(jnp.float32)
            for _ in range(n_iter):
                v = l2(w2d.T @ u)
                u = l2(w2d @ v)
            return {**spec, "u": u, "v": v}
        if isinstance(spec, dict):
            return {key: one_layer(sub, prm.get(key, {}))
                    if isinstance(sub, dict) else sub
                    for key, sub in spec.items()}
        return spec

    @jax.jit
    def run(params, spectral):
        return one_layer(spectral, params)

    out = dict(variables)
    out["spectral"] = run(variables["params"], variables["spectral"])
    return out


def fold_spectral(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inference-time fold: kernel <- kernel / sigma(u, v), then DROP the
    spectral collection. Apply the model with use_spectral_norm=False
    afterwards — eliminates the per-layer sigma computation (reshape, two
    matvecs, divide) from every rollout step, which is pure loop-invariant
    overhead in a latency-bound autoregressive scan. Run converge_spectral
    (or _device) first so sigma is the true spectral norm. One jitted
    dispatch; no host round-trip."""
    if "spectral" not in variables:
        return variables
    import jax.numpy as jnp

    def walk(spec, prm):
        if isinstance(spec, dict) and "u" in spec and "v" in spec \
                and "kernel" in prm:
            k = prm["kernel"]
            w2d = k.astype(jnp.float32).reshape(-1, k.shape[-1]).T
            sigma = jnp.dot(spec["u"].astype(jnp.float32),
                            w2d @ spec["v"].astype(jnp.float32))
            return {**prm, "kernel": (k.astype(jnp.float32) / sigma
                                      ).astype(k.dtype)}
        if isinstance(spec, dict) and isinstance(prm, dict):
            return {key: walk(spec[key], sub) if key in spec
                    and isinstance(sub, dict) else sub
                    for key, sub in prm.items()}
        return prm

    @jax.jit
    def run(params, spectral):
        return walk(spectral, params)

    out = {k: v for k, v in variables.items() if k != "spectral"}
    out["params"] = run(variables["params"], variables["spectral"])
    return out


def power_iter_spectral(params: Dict[str, Any], spectral: Dict[str, Any],
                        n_iter: int = 1) -> Dict[str, Any]:
    """One (or n) power-iteration updates of every u/v pair against the
    current params — the OUT-OF-GRAPH half of external spectral norm.

    Jit this and run it once per optimizer step before the train step built
    with make_train_step(sn_external=True); the step then computes the
    differentiable sigma from the frozen vectors (layers.freeze_sn_updates).
    Together the two programs reproduce torch nn.utils.spectral_norm exactly
    (hook updates u/v under no_grad; sigma = u . W v carries grad — reference
    applies it to every conv/linear, credit/models/wxformer/crossformer.py:23)
    while keeping each XLA module under the remote-compile tunnel's body
    limit. Handles scan_blocks-stacked layers (u of shape (depth, O)) by
    vmapping over the leading axis."""
    import jax.numpy as jnp

    def one_kernel(k, u, v):
        w2d = k.astype(jnp.float32).reshape(-1, k.shape[-1]).T  # (O, rest)

        def l2(x):
            return x / (jnp.linalg.norm(x) + 1e-12)

        for _ in range(n_iter):
            v = l2(w2d.T @ u)
            u = l2(w2d @ v)
        return u, v

    def walk(spec, prm):
        if isinstance(spec, dict) and "u" in spec and "v" in spec \
                and "kernel" in prm:
            u = spec["u"].astype(jnp.float32)
            v = spec["v"].astype(jnp.float32)
            if u.ndim == 2:  # scan-stacked: (depth, O) / (depth, rest)
                u, v = jax.vmap(one_kernel)(prm["kernel"], u, v)
            else:
                u, v = one_kernel(prm["kernel"], u, v)
            return {**spec, "u": u, "v": v}
        if isinstance(spec, dict):
            return {key: walk(sub, prm.get(key, {}))
                    if isinstance(sub, dict) else sub
                    for key, sub in spec.items()}
        return spec

    return walk(spectral, params)


def spectral_sigmas(variables: Dict[str, Any]) -> Dict[str, float]:
    """Diagnostic: map of flattened layer path -> current sigma estimate."""
    out = {}
    if "spectral" not in variables:
        return out
    params = variables["params"]

    def walk(spec, prm, path):
        if isinstance(spec, dict) and "u" in spec and "kernel" in prm:
            k = np.asarray(prm["kernel"])
            w2d = k.reshape(-1, k.shape[-1]).T
            sigma = float(np.asarray(spec["u"]) @ (w2d @ np.asarray(spec["v"])))
            out[path] = sigma
            return
        if isinstance(spec, dict):
            for key, sub in spec.items():
                if key in prm:
                    walk(sub, prm[key], f"{path}/{key}" if path else key)

    walk(variables["spectral"], params, "")
    return out
