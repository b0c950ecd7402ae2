"""SKEBS — Stochastic Kinetic Energy Backscatter (Berner et al. 2009).

JAX re-design of the reference SKEBS (reference: credit/skebs.py:264 — AR(1)
red-noise spectral pattern initialize_pattern:553 / cycle_pattern:578,
backscatter networks :37-242, wind perturbation forward:596-760). The
reference carries hidden module state (spec_coef, iteration counters); here
state is an explicit (spec_coef, step) carry threaded with the RNG key —
jit/scan friendly by construction.

Pattern math (cycle_pattern parity):
  Gamma = sum_l l(l+1)(2l+1) l^{2p}
  b     = sqrt(4 pi R^2 alpha dE / (variance * Gamma))
  g_n   = b * l^p
  coef' = (1 - alpha) coef + g_n sqrt(alpha) * variance * eta,  eta ~ CN(0, I)
then a per-degree lowpass 'pattern filter' with cosine annealing between
(anneal_start, max_wavenum).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.ops.sht import SHT
from credit_tpu.physics.constants import RAD_EARTH


def annealed_filter(lmax: int, max_wavenum: int, anneal_start: int) -> np.ndarray:
    """1 below anneal_start, cosine-anneal to 0 at max_wavenum, 0 above
    (reference skebs.py filter_init:515-531)."""
    f = np.ones(lmax, np.float32)
    ramp = np.arange(anneal_start, min(max_wavenum, lmax))
    if ramp.size:
        f[ramp] = 0.5 * (1 + np.cos(np.pi * (ramp - anneal_start) / max(ramp.size, 1)))
    f[min(max_wavenum, lmax):] = 0.0
    return f


@dataclasses.dataclass
class SKEBSParams:
    """Trainable/clippable scalars (reference clip ranges skebs.py:543-551)."""

    alpha: float = 0.05       # AR(1) 1-alpha memory; clip (eps, 1)
    variance: float = 1.0     # noise std; clip (eps, 10)
    p: float = -1.62          # spectral slope; clip (-10, -eps)
    dE: float = 1e-4          # backscattered energy fraction; clip (eps, 1)
    r: float = 0.5            # dissipation ratio; clip (eps, 1)

    def clipped(self) -> "SKEBSParams":
        eps = 1e-6
        return SKEBSParams(
            alpha=float(np.clip(self.alpha, eps, 1.0)),
            variance=float(np.clip(self.variance, eps, 10.0)),
            p=float(np.clip(self.p, -10.0, -eps)),
            dE=float(np.clip(self.dE, eps, 1.0)),
            r=float(np.clip(self.r, eps, 1.0)),
        )


class SKEBS:
    """Functional SKEBS: state = (spec_coef, step)."""

    def __init__(self, grid, params: Optional[SKEBSParams] = None,
                 lmax: Optional[int] = None, mmax: Optional[int] = None,
                 max_pattern_wavenum: int = 60,
                 pattern_filter_anneal_start: int = 40,
                 max_backscatter_wavenum: int = 100,
                 backscatter_filter_anneal_start: int = 90,
                 backscatter: float | Callable = 1e-5):
        self.sht = SHT(np.asarray(grid.lat), grid.nlon, lmax=lmax, mmax=mmax,
                       grid="equiangular")
        self.params = (params or SKEBSParams()).clipped()
        self.lrange = jnp.arange(1, self.sht.lmax + 1, dtype=jnp.float32)[:, None]
        self.pattern_filter = jnp.asarray(annealed_filter(
            self.sht.lmax, max_pattern_wavenum, pattern_filter_anneal_start))[:, None]
        self.backscatter_filter = jnp.asarray(annealed_filter(
            self.sht.lmax, max_backscatter_wavenum, backscatter_filter_anneal_start))[:, None]
        # 'prescribed'/'uniform' dissipation rate (m^3/s^3) or a callable
        # network state -> rate field (the FCNN/CNN/Unet variants of the
        # reference are pluggable here)
        self.backscatter = backscatter

    # ------------------------------------------------------------------
    def zero_state(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.sht.lmax, self.sht.mmax), jnp.complex64)

    def init_state(self, key: jax.Array, batch: int, iters: int = 5) -> jnp.ndarray:
        """Spin the AR(1) pattern up from zero (reference initialize_pattern)."""
        coef = self.zero_state(batch)
        for i in range(iters):
            key, sub = jax.random.split(key)
            coef = self.cycle(coef, sub)
        return coef

    def cycle(self, spec_coef: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        p = self.params
        lr = self.lrange
        gamma = jnp.sum(lr * (lr + 1.0) * (2 * lr + 1.0) * lr ** (2.0 * p.p))
        b = jnp.sqrt((4.0 * jnp.pi * RAD_EARTH**2) / (p.variance * gamma)
                     * p.alpha * p.dE)
        g_n = b * lr ** p.p  # (lmax, 1)
        kr, ki = jax.random.split(key)
        shape = spec_coef.shape
        noise = (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape))
        noise = p.variance * noise
        new = (1.0 - p.alpha) * spec_coef + g_n * jnp.sqrt(p.alpha) * noise
        return new * self.pattern_filter

    # ------------------------------------------------------------------
    def backscatter_rate(self, x_phys: Optional[jnp.ndarray]) -> jnp.ndarray:
        if callable(self.backscatter):
            rate = self.backscatter(x_phys)
            rate = self.filter_rate(rate)
            return rate
        return jnp.asarray(self.backscatter, jnp.float32)

    def filter_rate(self, rate: jnp.ndarray) -> jnp.ndarray:
        """Spectrally low-pass a predicted backscatter-rate field, then ReLU
        (reference skebs.py:662-667 spectral_backscatter_filter + relu1)."""
        spec = self.sht.grid2spec(rate) * self.backscatter_filter
        return jnp.maximum(self.sht.spec2grid(spec), 0.0)

    def perturb_winds(self, u: jnp.ndarray, v: jnp.ndarray,
                      spec_coef: jnp.ndarray, key: jax.Array,
                      x_phys: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One SKEBS step: cycle pattern, build the perturbation winds from
        the pattern gradient, scale by sqrt(r * D / dE), add to (u, v).

        u, v: (B, ..., lat, lon) physical winds. Returns (u', v', new_coef).
        """
        new_coef = self.cycle(spec_coef, key)
        u_chi, v_chi = self.sht.grad_from_spec(new_coef)  # (B, lat, lon)
        # broadcast over any level/time axes between batch and lat
        extra = u.ndim - u_chi.ndim
        for _ in range(extra):
            u_chi = u_chi[:, None]
            v_chi = v_chi[:, None]
        rate = self.backscatter_rate(x_phys)
        diss = jnp.sqrt(self.params.r * rate / self.params.dE)
        return u + diss * u_chi, v + diss * v_chi, new_coef
