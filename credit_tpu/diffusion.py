"""Gaussian diffusion (DDPM/DDIM) for probabilistic forecast heads.

JAX re-design of the reference's diffusion wrapper (reference:
credit/diffusion.py — linear/cosine/sigmoid beta schedules :83-119,
GaussianDiffusion q/p machinery :122-290, DDPM sampling loop; wraps
crossformer-diffusion / unet-diffusion backbones). Sampling runs as one
lax.scan entirely on device; training draws (t, noise) from explicit keys.

The backbone predicts eps/x0/v given (condition, noisy target, t).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(T: int) -> np.ndarray:
    scale = 1000.0 / T
    return np.linspace(scale * 1e-4, scale * 0.02, T)


def cosine_beta_schedule(T: int, s: float = 0.008) -> np.ndarray:
    steps = np.arange(T + 1, dtype=np.float64)
    ac = np.cos((steps / T + s) / (1 + s) * np.pi / 2) ** 2
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(T: int, start=-3.0, end=3.0, tau=1.0) -> np.ndarray:
    t = np.linspace(0, T, T + 1, dtype=np.float64) / T
    v_start = 1 / (1 + np.exp(-start / tau))
    v_end = 1 / (1 + np.exp(-end / tau))
    ac = (-1 / (1 + np.exp(-((t * (end - start) + start) / tau))) + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return np.clip(betas, 1e-5, 0.999)


_SCHEDULES = {"linear": linear_beta_schedule, "cosine": cosine_beta_schedule,
              "sigmoid": sigmoid_beta_schedule}


@dataclasses.dataclass
class GaussianDiffusion:
    """Functional diffusion process around a backbone apply function.

    backbone(variables, cond, y_noisy, t_frac) -> prediction (same shape as y)
    """

    backbone: Callable
    timesteps: int = 1000
    sampling_timesteps: int = 50
    beta_schedule: str = "sigmoid"
    objective: Literal["pred_noise", "pred_x0", "pred_v"] = "pred_v"
    ddim_eta: float = 0.0

    def __post_init__(self):
        betas = _SCHEDULES[self.beta_schedule](self.timesteps)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
        self.sqrt_ac = jnp.asarray(np.sqrt(ac), jnp.float32)
        self.sqrt_1mac = jnp.asarray(np.sqrt(1 - ac), jnp.float32)

    # ------------------------------------------------------------------
    def q_sample(self, y0, t, noise):
        """Forward noising: y_t = sqrt(ac_t) y0 + sqrt(1-ac_t) eps."""
        a = self.sqrt_ac[t][..., None, None, None, None]
        b = self.sqrt_1mac[t][..., None, None, None, None]
        return a * y0 + b * noise

    def _to_x0_eps(self, y_t, t, pred):
        a = self.sqrt_ac[t][..., None, None, None, None]
        b = self.sqrt_1mac[t][..., None, None, None, None]
        if self.objective == "pred_noise":
            eps = pred
            x0 = (y_t - b * eps) / a
        elif self.objective == "pred_x0":
            x0 = pred
            eps = (y_t - a * x0) / b
        else:  # pred_v: v = a*eps - b*x0
            x0 = a * y_t - b * pred
            eps = b * y_t + a * pred
        return x0, eps

    def target(self, y0, t, noise):
        if self.objective == "pred_noise":
            return noise
        if self.objective == "pred_x0":
            return y0
        a = self.sqrt_ac[t][..., None, None, None, None]
        b = self.sqrt_1mac[t][..., None, None, None, None]
        return a * noise - b * y0

    # ------------------------------------------------------------------
    def loss(self, variables, cond, y0, key):
        """Training loss: MSE on the chosen objective at a random t."""
        kt, kn = jax.random.split(key)
        b = y0.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.timesteps)
        noise = jax.random.normal(kn, y0.shape, y0.dtype)
        y_t = self.q_sample(y0, t, noise)
        pred = self.backbone(variables, cond, y_t, t / self.timesteps)
        return jnp.mean((pred - self.target(y0, t, noise)) ** 2)

    # ------------------------------------------------------------------
    def sample(self, variables, cond, key, shape):
        """DDIM sampling (eta=0 deterministic) with `sampling_timesteps`
        steps, as one on-device scan."""
        times = np.linspace(-1, self.timesteps - 1, self.sampling_timesteps + 1)
        times = times.astype(int)[::-1]  # T-1 ... -1
        pairs = np.stack([times[:-1], times[1:]], axis=1)  # (S, 2)

        def body(carry, tp):
            y_t, k = carry
            t, t_next = tp[0], tp[1]
            tb = jnp.full((shape[0],), t, jnp.int32)
            pred = self.backbone(variables, cond, y_t, tb / self.timesteps)
            x0, eps = self._to_x0_eps(y_t, tb, pred)
            ac_next = jnp.where(t_next >= 0, self.alphas_cumprod[jnp.maximum(t_next, 0)], 1.0)
            ac_t = self.alphas_cumprod[t]
            sigma = self.ddim_eta * jnp.sqrt(
                (1 - ac_t / ac_next) * (1 - ac_next) / (1 - ac_t))
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, shape, y_t.dtype)
            c = jnp.sqrt(jnp.clip(1 - ac_next - sigma**2, 0.0))
            y_next = jnp.sqrt(ac_next) * x0 + c * eps + sigma * noise
            return (y_next, k), None

        key, sub = jax.random.split(key)
        y = jax.random.normal(sub, shape)
        (y, _), _ = jax.lax.scan(body, (y, key), jnp.asarray(pairs))
        return y
