"""Loss registry: elementwise, spectral, and CRPS-family losses + the
lat/variable-weighted total-loss wrapper.

Functional JAX re-implementations with the same math as the reference
registry (credit/losses/__init__.py:12-26). Tensor layout is channels-last
(B, T, lat, lon, C); ensemble losses take pred with an explicit ensemble axis
(B, E, T, lat, lon, C).

Elementwise losses return UNREDUCED fields; `WeightedLoss` applies latitude /
per-variable weights and reduces (reference: credit/losses/weighted_loss.py:85
VariableTotalLoss2D).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu import registry

# --------------------------------------------------------------------------
# elementwise losses (target, pred) -> unreduced field


@registry.register("loss", "mse")
def mse(target, pred):
    return (pred - target) ** 2


@registry.register("loss", "mae")
def mae(target, pred):
    return jnp.abs(pred - target)


@registry.register("loss", "msle")
def msle(target, pred):
    return (jnp.log1p(pred) - jnp.log1p(target)) ** 2


@registry.register("loss", "huber")
def huber(target, pred, delta: float = 1.0):
    err = jnp.abs(pred - target)
    quad = jnp.minimum(err, delta)
    return 0.5 * quad**2 + delta * (err - quad)


@registry.register("loss", "logcosh")
def logcosh(target, pred):
    e = target - pred + 1e-12
    # numerically stable log(cosh(e))
    return e + jax.nn.softplus(-2.0 * e) - jnp.log(2.0)


@registry.register("loss", "xtanh")
def xtanh(target, pred):
    e = target - pred + 1e-12
    return e * jnp.tanh(e)


@registry.register("loss", "xsigmoid")
def xsigmoid(target, pred):
    e = target - pred + 1e-12
    return 2.0 * e * jax.nn.sigmoid(e) - e


# --------------------------------------------------------------------------
# CRPS family (ensemble) — pred has ensemble axis 1: (B, E, ...)


def kcrps(target, pred, biased: bool = False):
    """Kernel CRPS, O(m log m) via sorting (reference: credit/losses/kcrps.py
    — the Zamo & Naveau fair estimator when biased=False). Returns the CRPS
    field with shape of `target`."""
    m = pred.shape[1]
    skill = jnp.abs(pred - target[:, None]).mean(axis=1)
    ps = jnp.sort(pred, axis=1)
    i = jnp.arange(1, m + 1, dtype=pred.dtype)
    denom = m * m if biased else m * (m - 1)
    factor = (2 * i - m - 1) / denom
    spread = jnp.tensordot(factor, jnp.moveaxis(ps, 1, 0), axes=1)
    return skill - spread


registry.register("loss", "KCRPS")(kcrps)


@registry.register("loss", "almost-fair-crps")
def almost_fair_crps(target, pred, alpha: float = 1.0):
    """Almost-fair kernel CRPS (reference: credit/losses/almost_fair_crps.py):
    skill - (1 - eps) * spread with eps = (1-alpha)/m; spread excludes i==j."""
    m = pred.shape[1]
    eps = (1.0 - alpha) / m
    skill = jnp.abs(pred - target[:, None]).mean(axis=1)
    diffs = jnp.abs(pred[:, :, None] - pred[:, None, :])  # (B, m, m, ...)
    spread = diffs.sum(axis=(1, 2)) / (2.0 * m * (m - 1))
    return skill - (1.0 - eps) * spread


def crps_ensemble(target, pred):
    """Unreduced fair kernel CRPS per grid point (alias used by metrics)."""
    return kcrps(target, pred, biased=False)


# --------------------------------------------------------------------------
# spectral-domain losses (scalars)


@registry.register("loss", "spectral")
def spectral_loss(target, pred, lat_weights: Optional[jnp.ndarray] = None,
                  wavenum_init: int = 20):
    """FFT-amplitude loss over longitude (reference: credit/losses/spectral.py
    — rfft over lon, |.|, average over lat (optionally weighted), squared
    error over wavenumbers >= wavenum_init). Layout (..., lat, lon, C): we
    fft over axis -2."""
    p = jnp.moveaxis(pred.astype(jnp.float32), -1, -3)   # (..., C, lat, lon)
    t = jnp.moveaxis(target.astype(jnp.float32), -1, -3)
    pf = jnp.abs(jnp.fft.rfft(p, axis=-1))
    tf = jnp.abs(jnp.fft.rfft(t, axis=-1))
    if lat_weights is not None:
        w = (lat_weights / lat_weights.shape[-1]).astype(jnp.float32)
        pm = jnp.einsum("l,...lk->...k", w, pf)
        tm = jnp.einsum("l,...lk->...k", w, tf)
    else:
        pm = pf.mean(axis=-2)
        tm = tf.mean(axis=-2)
    return jnp.mean((pm[..., wavenum_init:] - tm[..., wavenum_init:]) ** 2)


@registry.register("loss", "power")
def power_loss(target, pred, lat_weights: Optional[jnp.ndarray] = None,
               wavenum_init: int = 20):
    """Log-PSD squared-error loss (reference: credit/losses/power.py)."""

    def psd(x):
        xk = jnp.fft.rfft(x.astype(jnp.float32), axis=-1, norm="forward")
        mag = (xk * jnp.conj(xk)).real
        scale = jnp.ones(mag.shape[-1], jnp.float32).at[1:].set(2.0)
        return mag * scale

    p = jnp.moveaxis(pred, -1, -3)
    t = jnp.moveaxis(target, -1, -3)
    diff = (jnp.log(psd(t) + 1e-8) - jnp.log(psd(p) + 1e-8))[..., wavenum_init:] ** 2
    nlat = diff.shape[-2]
    if lat_weights is None:
        w = jnp.full((nlat,), 1.0 / nlat, jnp.float32)
    else:
        w = (lat_weights / lat_weights.sum()).astype(jnp.float32)
    return jnp.mean(jnp.einsum("l,...lk->...k", w, diff))


@registry.register("loss", "covmse")
def covariance_weighted_mse(target, pred):
    """MSE weighted by per-channel inverse error covariance proxy — the
    reference's CovarianceWeightedMSELoss reduces to lat-mean MSE scaled by
    per-channel variance of the target anomaly; we use the plain per-channel
    normalized MSE form."""
    err = (pred - target) ** 2
    var = jnp.var(target, axis=tuple(range(target.ndim - 1)), keepdims=True) + 1e-8
    return err / var


def load_loss(name: str, **kw) -> Callable:
    """Look up a loss by config key (reference: credit/losses/__init__.py:176)."""
    import functools

    fn = registry.get("loss", name)
    return functools.partial(fn, **kw) if kw else fn


def is_crps_loss(name: str) -> bool:
    return "crps" in name.lower() or name == "KCRPS"


# --------------------------------------------------------------------------


class WeightedLoss:
    """Latitude- + variable-weighted total loss with optional spectral/power
    auxiliary terms (reference: VariableTotalLoss2D,
    credit/losses/weighted_loss.py:85).

    Args:
      base: loss key, e.g. 'mse'.
      lat_weights: (nlat,) cos-lat weights normalized to mean 1, or None.
      var_weights: (C,) per-channel weights, or None.
      spectral_lambda / power_lambda: aux-term coefficients (0 disables).
    """

    def __init__(self, base: str = "mse", lat_weights=None, var_weights=None,
                 spectral_lambda: float = 0.0, power_lambda: float = 0.0,
                 wavenum_init: int = 20, validation: bool = False, **base_kw):
        self.base_name = base
        self.base = load_loss(base, **base_kw)
        self.lat_weights = None if lat_weights is None else jnp.asarray(lat_weights, jnp.float32)
        self.var_weights = None if var_weights is None else jnp.asarray(var_weights, jnp.float32)
        self.spectral_lambda = 0.0 if validation else spectral_lambda
        self.power_lambda = 0.0 if validation else power_lambda
        self.wavenum_init = wavenum_init
        self.is_ensemble = is_crps_loss(base)

    @classmethod
    def from_config(cls, conf: dict, grid=None, validation: bool = False) -> "WeightedLoss":
        # downscaling configs (multi-dataset `data.datasets` key) get the
        # un-latitude-weighted downscaling loss regardless of weight flags
        # (reference: credit/losses/__init__.py:217 `is_downscaling =
        # "datasets" in conf["data"]` -> DownscalingLoss)
        if cls is WeightedLoss and "datasets" in (conf.get("data") or {}):
            return DownscalingLoss.from_config(conf, grid, validation)
        lconf = conf.get("loss", {})
        key = "validation_loss" if (validation and "validation_loss" in lconf) else "training_loss"
        base = lconf.get(key, "mse")
        lat_w = None
        if lconf.get("use_latitude_weights") and grid is not None:
            lat_w = grid.coslat_weights()
        var_w = None
        if lconf.get("use_variable_weights"):
            vw = lconf["variable_weights"]
            flat = []
            for v in vw.values():
                flat.extend(v if isinstance(v, (list, tuple)) else [v])
            var_w = np.asarray(flat, np.float32)
        return cls(
            base=base, lat_weights=lat_w, var_weights=var_w,
            spectral_lambda=lconf.get("spectral_lambda_reg", 0.0) if lconf.get("use_spectral_loss") else 0.0,
            power_lambda=lconf.get("spectral_lambda_reg", 0.0) if lconf.get("use_power_loss") else 0.0,
            wavenum_init=lconf.get("spectral_wavenum_init", 20),
            validation=validation,
        )

    def __call__(self, target: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """target: (B, T, lat, lon, C); pred same, or (B, E, T, lat, lon, C)
        for ensemble CRPS losses. Returns scalar."""
        field = self.base(target, pred)  # (B, T, lat, lon, C)
        if self.lat_weights is not None:
            field = field * self.lat_weights[:, None, None]
        if self.var_weights is not None:
            field = field * self.var_weights
        loss = jnp.mean(field)
        p2 = pred if pred.ndim == target.ndim else pred.mean(axis=1)
        if self.power_lambda:
            loss = loss + self.power_lambda * power_loss(
                target, p2, self.lat_weights, self.wavenum_init)
        if self.spectral_lambda:
            loss = loss + self.spectral_lambda * spectral_loss(
                target, p2, self.lat_weights, self.wavenum_init)
        return loss


class DownscalingLoss(WeightedLoss):
    """Loss for regional-downscaling configs: the base loss on the target
    grid with NO latitude weighting (the regional target grid is not a
    global lat-lon graticule), validation defaulting to L1, and CRPS-family
    training losses reused for validation (reference:
    credit/losses/downscaling_loss.py:63 DownscalingLoss)."""

    @classmethod
    def from_config(cls, conf: dict, grid=None, validation: bool = False) -> "DownscalingLoss":
        import warnings

        lconf = dict(conf.get("loss", {}))
        if lconf.get("use_latitude_weights"):
            warnings.warn("latitude weights not applicable to downscaling")
        train_base = lconf.get("training_loss", "mse")
        if validation:
            if is_crps_loss(train_base):
                base = train_base  # ensembles validate with the same CRPS
            else:
                base = lconf.get("validation_loss", "mae")
        else:
            base = train_base
        return cls(
            base=base,
            spectral_lambda=lconf.get("spectral_lambda_reg", 0.0)
            if lconf.get("use_spectral_loss") else 0.0,
            power_lambda=lconf.get("spectral_lambda_reg", 0.0)
            if lconf.get("use_power_loss") else 0.0,
            wavenum_init=lconf.get("spectral_wavenum_init", 20),
            validation=validation,
        )


@registry.register("loss", "ring-crps")
def ring_crps_loss(target, pred, axis_name: Optional[str] = None):
    """Ring CRPS (reference: credit/losses/crps.py RingCRPSLoss — one member
    per dp device, K-1 ppermute shifts). Inside shard_map/pjit with
    `axis_name` set, uses the O(1)-memory device ring
    (credit_tpu.parallel.ring_crps.ring_crps); otherwise falls back to the
    numerically identical dense fair estimator on the ensemble axis."""
    if axis_name is not None:
        from credit_tpu.parallel.ring_crps import ring_crps as _ring

        return _ring(pred, target, axis_name)
    return kcrps(target, pred, biased=False)
