"""Bred vectors for ensemble initial conditions.

Re-implementation of the reference's breeding cycle (reference:
credit/ensemble/bred_vector.py:15 BredVector,
generate_bred_vectors[_cycle]:352,424): perturb the IC, run the model
forward alongside the control, rescale the grown difference back to the
seed amplitude, repeat; the final differences become ensemble IC
perturbations.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp


def bred_cycle(step_fn: Callable, x_control: jnp.ndarray, x_pert: jnp.ndarray,
               amplitude: float, n_cycles: int = 3) -> jnp.ndarray:
    """One bred vector: run both states n_cycles steps, rescaling the
    perturbation to `amplitude` (RMS) after each step. Returns the final
    scaled perturbation (same shape as x)."""

    def one(carry, _):
        xc, xp = carry
        yc = step_fn(xc)
        yp = step_fn(xp)
        diff = yp - yc
        rms = jnp.sqrt(jnp.mean(diff**2) + 1e-12)
        xp_next = yc + diff * (amplitude / rms)
        return (yc, xp_next), None

    (xc, xp), _ = jax.lax.scan(one, (x_control, x_pert), None, length=n_cycles)
    return xp - xc


def generate_bred_vectors(step_fn: Callable, x0: jnp.ndarray, key: jax.Array,
                          n_members: int, amplitude: float = 0.01,
                          n_cycles: int = 3) -> List[jnp.ndarray]:
    """Ensemble of perturbed ICs: x0 + bred vector per member (and the
    mirrored -perturbation pairs, reference generate_bred_vectors:352)."""
    members = []
    half = (n_members + 1) // 2
    for i in range(half):
        key, sub = jax.random.split(key)
        seed = amplitude * jax.random.normal(sub, x0.shape, x0.dtype)
        bv = bred_cycle(step_fn, x0, x0 + seed, amplitude, n_cycles)
        members.append(x0 + bv)
        if len(members) < n_members:
            members.append(x0 - bv)
    return members[:n_members]
