"""Initial-condition optimization.

Re-implements the reference's ic-opt trainer (reference:
credit/trainers/ic_optimization.py — optimize the INPUT state against a
forecast-trajectory loss with the model frozen; 4D-Var-like analysis step):
in JAX this is a jitted gradient descent on x0 through the rollout.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from credit_tpu import registry
from credit_tpu.data.channels import ChannelSchema


@registry.register("trainer", "ic-opt")
def optimize_initial_condition(
    model, variables, schema: ChannelSchema, x0: jnp.ndarray,
    targets: jnp.ndarray, forcing: Optional[jnp.ndarray] = None,
    n_steps: int = 1, history_len: int = 1, iterations: int = 50,
    learning_rate: float = 1e-2, loss_fn: Optional[Callable] = None,
    background_weight: float = 0.0):
    """Return (x0_optimized, losses).

    targets: (B, S, H, W, C_t); forcing: (B, S, H, W, n_dyn) or None.
    background_weight adds a Tikhonov pull toward the first-guess x0.
    """
    if loss_fn is None:
        loss_fn = lambda t, p: jnp.mean((p - t) ** 2)  # noqa: E731

    x_guess = x0

    def trajectory_loss(x):
        total = 0.0
        xc = x
        for s in range(n_steps):
            y_pred = model.apply(variables, xc)
            total = total + loss_fn(targets[:, s][:, None], y_pred)
            if s + 1 < n_steps:
                f = None if forcing is None else forcing[:, s + 1][:, None]
                frame = schema.update_x(xc[:, -1:], y_pred[:, -1:], f)
                xc = jnp.concatenate([xc[:, 1:], frame], axis=1) if history_len > 1 else frame
        total = total / n_steps
        if background_weight > 0:
            total = total + background_weight * jnp.mean((x - x_guess) ** 2)
        return total

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(x, opt_state):
        loss, g = jax.value_and_grad(trajectory_loss)(x)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(x, updates), opt_state, loss

    opt_state = opt.init(x0)
    x = x0
    losses = []
    for _ in range(iterations):
        x, opt_state, loss = step(x, opt_state)
        losses.append(float(loss))
    return x, losses
