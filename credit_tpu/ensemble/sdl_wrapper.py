"""SDL inference wrapper: per-layer noise control + latent vector harness.

Functional re-design of the reference's SDLWrapper
(reference: credit/models/wxformer/sdl_inference_wrapper.py:36 — hurricane
track stylization: directional/intensity noise retuning on the frozen
pretrained model, latent Z capture for exact forecast reproduction, latent
interpolation for smooth ensemble exploration). Instead of mutating module
buffers, every operation here is variables-in/variables-out: noise factors
live as params (models/sdl.py), captured latents are plain pytrees, and
replay threads them back through the 'latents' collection — everything
stays jit/scan-compatible.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp

ENCODER_LAYERS = ("encoder_noise0", "encoder_noise1", "encoder_noise2")
DECODER_LAYERS = ("noise_inject1", "noise_inject2", "noise_inject3")
# manual control names (reference set_manual_factors: large/medium/fine map
# onto the decoder stages coarse->fine)
MANUAL_MAP = {"large_scale": "noise_inject1", "medium_scale": "noise_inject2",
              "fine_scale": "noise_inject3"}


def _noise_layer_names(params: Dict[str, Any]) -> List[str]:
    return [k for k in params
            if isinstance(params[k], dict) and "noise_factor" in params[k]]


class SDLInferenceWrapper:
    """Wraps (model, variables) of a crossformer-ensemble/-style model."""

    def __init__(self, model, variables: Dict[str, Any]):
        self.model = model
        # init() already ran the sow hooks: drop any stale 'captured'
        # collection or it pollutes later captures (tuples accumulate)
        self.variables = {k: v for k, v in variables.items()
                          if k != "captured"}
        self._original = {
            name: jnp.asarray(variables["params"][name]["noise_factor"])
            for name in _noise_layer_names(variables["params"])}
        self._stored: Dict[str, Dict] = {}

    # -- noise-factor control (reference :83-161) -----------------------
    def layer_names(self) -> List[str]:
        return sorted(self._original)

    def get_noise_factors(self) -> Dict[str, float]:
        p = self.variables["params"]
        return {n: float(p[n]["noise_factor"]) for n in self.layer_names()}

    def _set(self, names, factors):
        params = dict(self.variables["params"])
        if isinstance(factors, (int, float)):
            factors = [factors] * len(names)
        if len(factors) != len(names):
            raise ValueError(f"expected {len(names)} factors, got "
                             f"{len(factors)}")
        for n, f in zip(names, factors):
            if n not in params:
                continue
            layer = dict(params[n])
            layer["noise_factor"] = jnp.asarray(f, jnp.float32)
            params[n] = layer
        self.variables = {**self.variables, "params": params}

    def set_noise_factors(self, factors: Union[float, List[float]]):
        self._set(self.layer_names(), factors)

    def set_encoder_noise_factors(self, factors):
        self._set([n for n in ENCODER_LAYERS if n in self._original], factors)

    def set_decoder_noise_factors(self, factors):
        self._set([n for n in DECODER_LAYERS if n in self._original], factors)

    def set_manual_factors(self, large_scale: float, medium_scale: float,
                           fine_scale: float):
        for key, val in (("large_scale", large_scale),
                         ("medium_scale", medium_scale),
                         ("fine_scale", fine_scale)):
            self._set([MANUAL_MAP[key]], [val])

    def reset_to_original(self):
        self._set(list(self._original),
                  [float(v) for v in self._original.values()])

    # -- latent capture / replay (reference :162-324) -------------------
    def forward(self, x, key: Optional[jax.Array] = None,
                capture: bool = False, latents: Optional[Dict] = None):
        """One forward pass. capture=True returns (y, latents); latents=...
        replays stored noise EXACTLY (the RNG stream is unused then)."""
        variables = self.variables
        if latents is not None:
            # replay: stored pixel noise + the stored key (the style vector
            # is drawn from the RNG stream, so the key must match too)
            variables = {**variables, "latents": latents["latents"]}
            key = latents["key"] if key is None else key
        key = key if key is not None else jax.random.PRNGKey(0)
        if capture:
            y, mut = self.model.apply(variables, x, rngs={"noise": key},
                                      mutable=["captured"])
            lat = _unwrap_sown(mut["captured"])  # sow stores tuples
            return y, {"latents": lat, "key": key}
        y = self.model.apply(variables, x, rngs={"noise": key})
        return y

    def store_latents(self, name: str, latents: Dict):
        self._stored[name] = latents

    def get_stored_latents(self, name: str) -> Optional[Dict]:
        return self._stored.get(name)

    def list_stored_latents(self) -> List[str]:
        return sorted(self._stored)

    def clear_stored_latents(self, name: Optional[str] = None):
        if name is None:
            self._stored.clear()
        else:
            self._stored.pop(name, None)

    def interpolate_latents(self, name1: str, name2: str, t: float) -> Dict:
        """Lerp between two stored noise realizations — smooth trajectory
        morphing between ensemble members (reference :278)."""
        l1, l2 = self._stored[name1], self._stored[name2]
        lat = jax.tree_util.tree_map(lambda a, b: (1 - t) * a + t * b,
                                     l1["latents"], l2["latents"])
        return {"latents": lat, "key": l1["key"]}


def _unwrap_sown(tree):
    """flax sow() stores tuples of values; keep the first (single call) and
    rename 'pixel' entries for the 'latents' collection."""
    if isinstance(tree, tuple):
        return tree[-1]  # sow appends; the LAST entry is this run's value
    if isinstance(tree, dict):
        return {k: _unwrap_sown(v) for k, v in tree.items()}
    return tree
