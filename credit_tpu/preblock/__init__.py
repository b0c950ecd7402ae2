"""Preblock pipeline: composable input processors applied before the model.

Re-design of the reference's gen2 preblocks (reference:
credit/preblock/__init__.py:134 build_preblocks / :271 apply_preblocks;
blocks log/sqrt transforms, era5_normalizer preblock/norm.py:35, fill_values,
concat, regrid, hybrid_level_interp, semilagrangian_advection) on flat
channels-last tensors: blocks are callables x -> x with static schema
addressing, built per phase ('ic_only' runs once at t=1, 'per_step' every
rollout step — same phase contract as the reference).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp

from credit_tpu import registry
from credit_tpu.data.channels import ChannelSchema
from credit_tpu.postblock import _VarView


class BasePreblock:
    phase = "per_step"

    def __call__(self, x):
        raise NotImplementedError


@registry.register("preblock", "era5_normalizer")
class NormalizePreblock(BasePreblock):
    """z-score normalize the flat input tensor (reference preblock/norm.py)."""

    def __init__(self, schema=None, normalizer=None, **_):
        self.norm = normalizer

    def __call__(self, x):
        return self.norm.normalize_input(x)


@registry.register("preblock", "log_transform")
class LogTransform(BasePreblock):
    """log1p on selected variables (inverse pairs with postblock 'exp')."""

    def __init__(self, schema: ChannelSchema, variables: Sequence[str],
                 epsilon: float = 0.0, **_):
        self.views = [_VarView(schema, v, target=False) for v in variables]
        self.eps = epsilon

    def __call__(self, x):
        for view in self.views:
            x = view.set(x, jnp.log1p(jnp.clip(view.get(x) + self.eps, 0.0)))
        return x


@registry.register("preblock", "sqrt_transform")
class SqrtTransform(BasePreblock):
    def __init__(self, schema: ChannelSchema, variables: Sequence[str], **_):
        self.views = [_VarView(schema, v, target=False) for v in variables]

    def __call__(self, x):
        for view in self.views:
            x = view.set(x, jnp.sqrt(jnp.clip(view.get(x), 0.0)))
        return x


@registry.register("preblock", "fill_values")
class FillValues(BasePreblock):
    """Replace NaN/inf (reference preblock fill_values)."""

    def __init__(self, schema=None, fill_value: float = 0.0, **_):
        self.fill = fill_value

    def __call__(self, x):
        return jnp.where(jnp.isfinite(x), x, self.fill)


@registry.register("preblock", "clamp")
class Clamp(BasePreblock):
    """IC clamp (the trainer-side clamp in trainer_gen2)."""

    def __init__(self, schema=None, min: float = -1e4, max: float = 1e4, **_):
        self.lo, self.hi = min, max

    def __call__(self, x):
        return jnp.clip(x, self.lo, self.hi)


def build_preblocks(conf: dict, schema: ChannelSchema, normalizer=None,
                    phase: str = "per_step", grid=None) -> List[Callable]:
    """Build from conf['preblocks'] = [{type:..., phase:..., args...}]."""
    blocks = []
    for entry in (conf.get("preblocks") or []):
        entry = dict(entry)
        btype = entry.pop("type")
        if entry.pop("phase", "per_step") != phase:
            continue
        cls = registry.get("preblock", btype)
        kwargs = dict(schema=schema, normalizer=normalizer, **entry)
        if btype in ("regrid", "semilagrangian_advection"):
            kwargs["grid"] = grid
        blocks.append(cls(**kwargs))
    return blocks


def apply_preblocks(blocks: Sequence[Callable], x):
    for b in blocks:
        x = b(x)
    return x


@registry.register("preblock", "regrid")
class RegridPreblock(BasePreblock):
    """Horizontal regrid of the whole input tensor onto the model grid
    (reference: credit/preblock/regrid.py Regridder — xesmf weights there,
    precomputed index/weight gathers here via credit_tpu/ops/regrid.py)."""

    def __init__(self, schema=None, src_lat=None, src_lon=None,
                 dst_lat=None, dst_lon=None, method: str = "bilinear",
                 grid=None, **_):
        from credit_tpu.ops.regrid import make_regridder
        import numpy as np

        if dst_lat is None and grid is not None:
            dst_lat, dst_lon = grid.lat, grid.lon
        self.rg = make_regridder(method, np.asarray(src_lat),
                                 np.asarray(src_lon), np.asarray(dst_lat),
                                 np.asarray(dst_lon))

    def __call__(self, x):
        b, t, h, w, c = x.shape
        flat = x.transpose(0, 1, 4, 2, 3).reshape(b * t * c, h, w)
        out = self.rg(flat)
        h2, w2 = out.shape[-2:]
        return out.reshape(b, t, c, h2, w2).transpose(0, 1, 3, 4, 2)


@registry.register("preblock", "bridgescaler_transform")
class BridgeScalerTransform(BasePreblock):
    """Distribution-aware per-channel scaling (reference:
    credit/preblock/scaler.py BridgeScalerTransform on bridgescaler's
    DQuantile/DStandard/DMinMax tensors). kind='quantile' maps each channel
    through its stored quantiles to normal scores (monotone piecewise-linear
    CDF + probit), 'standard' z-scores, 'minmax' rescales to [0, 1].
    Stats come from `credit-tpu preprocess --scaler ...` (scaler.npz)."""

    def __init__(self, schema=None, path: str = None, kind: str = "quantile",
                 inverse: bool = False, **_):
        import numpy as np

        data = np.load(path)
        self.kind = kind
        self.inverse = inverse
        if kind == "quantile":
            self.quantiles = jnp.asarray(data["quantiles"])  # (C, n_q)
            nq = self.quantiles.shape[1]
            # clip the uniform scores away from 0/1 so probit stays finite
            self.probs = jnp.linspace(1.0 / (nq + 1), nq / (nq + 1.0), nq)
        elif kind == "standard":
            self.mean = jnp.asarray(data["mean"])
            self.std = jnp.asarray(data["std"])
        elif kind == "minmax":
            self.lo = jnp.asarray(data["min"])
            self.hi = jnp.asarray(data["max"])
        else:
            raise ValueError(f"unknown scaler kind {kind!r}")

    def __call__(self, x):
        import jax
        from jax.scipy.special import ndtri
        from jax.scipy.stats import norm

        if self.kind == "standard":
            return ((x * self.std + self.mean) if self.inverse
                    else (x - self.mean) / self.std)
        if self.kind == "minmax":
            rng = self.hi - self.lo
            return (x * rng + self.lo) if self.inverse else (x - self.lo) / rng

        def chan(v, q):
            if self.inverse:
                u = jnp.clip(norm.cdf(v), self.probs[0], self.probs[-1])
                return jnp.interp(u, self.probs, q)
            u = jnp.interp(v, q, self.probs)
            return ndtri(u)

        cols = [chan(x[..., c], self.quantiles[c])
                for c in range(x.shape[-1])]
        return jnp.stack(cols, axis=-1)


@registry.register("preblock", "hybrid_level_interp")
class HybridLevelInterp(BasePreblock):
    """Interpolate 3-D input variables from source hybrid levels onto the
    model's hybrid levels (reference: credit/preblock/hybrid_interp.py
    HybridLevelInterpPre on the interp engine)."""

    def __init__(self, schema: ChannelSchema, variables: Sequence[str],
                 ak_in=None, bk_in=None, ak_out=None, bk_out=None,
                 sp_var: str = "SP", **_):
        from credit_tpu.physics.interp import create_pressure_grid

        self.vars = [(v, _levels_view(schema, v)) for v in variables]
        self.sp = _VarView(schema, sp_var, target=False)
        self._cpg = create_pressure_grid
        self.ak_in = jnp.asarray(ak_in, jnp.float32)
        self.bk_in = jnp.asarray(bk_in, jnp.float32)
        self.ak_out = jnp.asarray(ak_out, jnp.float32)
        self.bk_out = jnp.asarray(bk_out, jnp.float32)

    def __call__(self, x):
        from credit_tpu.physics.interp import interp_hybrid_to_hybrid

        sp = self.sp.get(x)
        _, p_in = self._cpg(sp, self.ak_in, self.bk_in)   # full levels
        _, p_out = self._cpg(sp, self.ak_out, self.bk_out)
        for _, view in self.vars:
            x = view.set(x, interp_hybrid_to_hybrid(view.get(x), p_in, p_out))
        return x


@registry.register("preblock", "semilagrangian_advection")
class AdvectionPreblock(BasePreblock):
    """Advect input tracers one step with the input winds BEFORE the model
    (reference: credit/preblock/advect.py SemiLagrangianAdvectionPre)."""

    def __init__(self, schema: ChannelSchema, grid=None, a_half=None,
                 b_half=None, tracer_vars: Sequence[str] = ("Q",),
                 U_var="U", V_var="V", sp_var="SP",
                 timestep_seconds: float = 21600.0, n_iterations: int = 2, **_):
        from credit_tpu.physics.advection import SemiLagrangianAdvection

        self.engine = SemiLagrangianAdvection(grid, a_half, b_half,
                                              timestep_seconds, n_iterations)
        self.tracers = [_VarView(schema, v, target=False) for v in tracer_vars]
        self.U = _VarView(schema, U_var, target=False)
        self.V = _VarView(schema, V_var, target=False)
        self.sp = _VarView(schema, sp_var, target=False)

    def __call__(self, x):
        b, t = x.shape[:2]
        u = self.U.get(x).reshape(b * t, *x.shape[2:4], -1)
        v = self.V.get(x).reshape(b * t, *x.shape[2:4], -1)
        sp = self.sp.get(x).reshape(b * t, *x.shape[2:4])
        for tv in self.tracers:
            f = tv.get(x)
            flat = f.reshape(b * t, *x.shape[2:4], -1)
            adv = self.engine.advect([flat], u, v, sp)[0]
            x = tv.set(x, adv.reshape(f.shape))
        return x


def _levels_view(schema: ChannelSchema, base: str):
    return _VarView(schema, base, target=False)
