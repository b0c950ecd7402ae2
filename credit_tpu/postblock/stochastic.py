"""Stateful postblocks: SKEBS perturbation and semi-Lagrangian advection.

The reference runs SKEBS inside the model's gen1 PostBlock with hidden
module state (reference: credit/postblock/gen1.py:37 ordered op list with
SKEBS second; credit/skebs.py carries spec_coef across forward calls). Here
they are *stateful postblocks*: explicit (state, key) threading that the
rollout engine carries — jit/scan-safe by construction.

Protocol:
  block.init_state(batch_size) -> state pytree
  block(y_pred, x, state, key) -> (y_pred, new_state)
Stateless postblocks keep the plain (y_pred, x) -> y_pred signature.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

from credit_tpu import registry
from credit_tpu.data.channels import ChannelSchema
from credit_tpu.postblock import BasePostblock, _VarView


class StatefulPostblock(BasePostblock):
    is_stateful = True

    def init_state(self, batch_size: int):
        raise NotImplementedError

    def __call__(self, y_pred, x, state, key):
        raise NotImplementedError


@registry.register("postblock", "skebs")
class SKEBSPostblock(StatefulPostblock):
    """Perturb predicted winds with the SKEBS backscatter pattern
    (reference: skebs.py:596 forward — perturbation applied to U/V channels
    of y_pred in physical space).

    With `backscatter_net` configured (e.g. {'type': 'fcnn'}), the
    dissipation rate is PREDICTED from the input state by a trainable flax
    network whose parameters live under params['_postblocks'][i] and are
    updated by the optimizer with the model (reference: learned
    FCNN/CNN/Unet backscatter, skebs.py:37-242,553-760)."""

    def __init__(self, schema: ChannelSchema, grid, U_var="U", V_var="V",
                 backscatter_net=None, dissipation_scaling: float = 1.0,
                 write_rollout_debug_files: bool = False,
                 save_loc: str = ".", iteration_stop: int = 0,
                 **skebs_kwargs):
        from credit_tpu.physics.skebs import SKEBS, SKEBSParams

        params = SKEBSParams(**{k: skebs_kwargs.pop(k) for k in
                                ("alpha", "variance", "p", "dE", "r")
                                if k in skebs_kwargs})
        skebs_kwargs.pop("activate", None)
        skebs_kwargs.pop("write_train_debug_files", None)
        skebs_kwargs.pop("write_train_every", None)
        # rollout debug writers (reference: skebs.py:426-440 — dumps the
        # stream-function pattern + perturbation winds per step so SKEBS
        # behavior can be audited offline)
        self.write_rollout_debug_files = bool(write_rollout_debug_files)
        self.debug_save_loc = os.path.join(save_loc, "debug_skebs")
        self.iteration_stop = int(iteration_stop)
        self.skebs = SKEBS(grid, params, **skebs_kwargs)
        self.U = _VarView(schema, U_var)
        self.V = _VarView(schema, V_var)
        self.scaling = dissipation_scaling
        self.net = None
        if backscatter_net:
            from credit_tpu.physics.skebs_nets import build_backscatter_net

            n_lev = max(getattr(schema, "n_levels", 1), 1)
            self.net = build_backscatter_net(backscatter_net, n_lev)
        self.is_trainable = self.net is not None

    def init_state(self, batch_size: int):
        coef = self.skebs.init_state(jax.random.PRNGKey(0), batch_size)
        # state = (AR(1) spectral pattern, iteration counter) — the counter
        # drives iteration_stop (reference skebs.py:443 early shutoff)
        return (coef, jnp.zeros((), jnp.int32))

    def init_params(self, key, x_sample):
        """x_sample: (B, T, H, W, C_in) — net sees the last input frame."""
        if self.net is None:
            return None
        return self.net.init(key, x_sample[:, -1])["params"]

    def _rate(self, x, net_params):
        if self.net is None:
            return self.skebs.backscatter_rate(None), False
        rate = self.net.apply({"params": net_params}, x[:, -1])  # (B,H,W,L)
        rate = self.scaling * rate
        # spectral low-pass per level: SHT acts on trailing (lat, lon)
        rate = jnp.moveaxis(rate, -1, 1)               # (B, L, H, W)
        rate = self.skebs.filter_rate(rate)
        rate = jnp.moveaxis(rate, 1, -1)               # (B, H, W, L)
        return rate, True

    def __call__(self, y_pred, x, state, key, net_params=None):
        coef, it = state
        u = self.U.get(y_pred)  # (B, T, H, W, L) or (B, T, H, W)
        v = self.V.get(y_pred)
        has_lev = u.ndim == 5
        # SKEBS pattern is (B, lat, lon); broadcast over T (and levels)
        new_coef = self.skebs.cycle(coef, key)
        u_chi, v_chi = self.skebs.sht.grad_from_spec(new_coef)
        pert_u = u_chi[:, None, :, :]
        pert_v = v_chi[:, None, :, :]
        if has_lev:
            pert_u = pert_u[..., None]
            pert_v = pert_v[..., None]
        rate, learned = self._rate(x, net_params)
        if learned:
            rate = rate[:, None]                       # (B, 1, H, W, L)
            if not has_lev:
                rate = rate.mean(-1)
            # ReLU'd rates hit exact 0 where sqrt' blows up — dead-zone
            # clamp keeps the gradient finite (0 below threshold)
            rate = jnp.maximum(rate, 1e-10)
        diss = jnp.sqrt(self.skebs.params.r * rate / self.skebs.params.dE)
        if self.iteration_stop:
            # early shutoff (reference skebs.py:443): zero the perturbation
            # once the counter reaches iteration_stop — jit-friendly select
            on = (it < self.iteration_stop).astype(diss.dtype)
            diss = diss * on
        y_pred = self.U.set(y_pred, u + diss * pert_u)
        y_pred = self.V.set(y_pred, v + diss * pert_v)
        return y_pred, (new_coef, it + 1)

    def dump_debug(self, step: int, state):
        """Write the step's SKEBS pattern fields to netCDF (reference:
        skebs.py write_rollout_debug_files). Host-side; called by the
        rollout engine between jitted steps."""
        import numpy as np

        from credit_tpu.utils.ncio import Dataset

        os.makedirs(self.debug_save_loc, exist_ok=True)
        coef = jnp.asarray(state[0])
        u_chi, v_chi = self.skebs.sht.grad_from_spec(coef)
        psi = self.skebs.sht.spec2grid(coef)
        path = os.path.join(self.debug_save_loc, f"skebs_{step:04d}.nc")
        Dataset({
            "psi_pattern": (("batch", "lat", "lon"), np.asarray(psi)),
            "pert_u": (("batch", "lat", "lon"), np.asarray(u_chi)),
            "pert_v": (("batch", "lat", "lon"), np.asarray(v_chi)),
        }).to_netcdf(path)
        return path


@registry.register("postblock", "semilagrangian_advection")
class AdvectionPostblock(BasePostblock):
    """Advect tracers one step with the predicted winds (reference:
    credit/postblock/advect.py:426). Stateless: winds/SP come from y_pred."""

    def __init__(self, schema: ChannelSchema, grid, a_half, b_half,
                 tracer_vars: Sequence[str] = ("Q",), U_var="U", V_var="V",
                 sp_var="SP", timestep_seconds: float = 21600.0,
                 n_iterations: int = 2, **_):
        from credit_tpu.physics.advection import SemiLagrangianAdvection

        self.engine = SemiLagrangianAdvection(
            grid, a_half, b_half, timestep_seconds, n_iterations)
        self.tracers = [_VarView(schema, v) for v in tracer_vars]
        self.U = _VarView(schema, U_var)
        self.V = _VarView(schema, V_var)
        self.sp = _VarView(schema, sp_var)

    def __call__(self, y_pred, x):
        b, t = y_pred.shape[:2]
        u = self.U.get(y_pred).reshape(b * t, *y_pred.shape[2:4], -1)
        v = self.V.get(y_pred).reshape(b * t, *y_pred.shape[2:4], -1)
        sp = self.sp.get(y_pred).reshape(b * t, *y_pred.shape[2:4])
        fields = [tv.get(y_pred) for tv in self.tracers]
        flat = [f.reshape(b * t, *y_pred.shape[2:4], -1) for f in fields]
        out = self.engine.advect(flat, u, v, sp)
        for tv, orig, adv in zip(self.tracers, fields, out):
            y_pred = tv.set(y_pred, adv.reshape(orig.shape))
        return y_pred


def apply_postblocks_stateful(blocks, y_pred, x, states: dict, key,
                              params: dict = None):
    """Apply a mixed stateless/stateful pipeline; returns (y_pred, states).
    `params` maps block index -> trainable params (params['_postblocks'])."""
    new_states = dict(states)
    for i, b in enumerate(blocks):
        if getattr(b, "is_stateful", False):
            key, sub = jax.random.split(key)
            if getattr(b, "is_trainable", False):
                y_pred, new_states[i] = b(y_pred, x, states[i], sub,
                                          net_params=(params or {}).get(str(i)))
            else:
                y_pred, new_states[i] = b(y_pred, x, states[i], sub)
        else:
            y_pred = b(y_pred, x)
    return y_pred, new_states


def init_postblock_states(blocks, batch_size: int) -> dict:
    return {i: b.init_state(batch_size) for i, b in enumerate(blocks)
            if getattr(b, "is_stateful", False)}


def init_postblock_params(blocks, key, x_sample) -> dict:
    """Trainable-postblock params, keyed by str(index) — merged into the
    train state under params['_postblocks'] (reference: backscatter nets are
    parameters of the wrapped model)."""
    out = {}
    for i, b in enumerate(blocks):
        if getattr(b, "is_trainable", False):
            key, sub = jax.random.split(key)
            out[str(i)] = b.init_params(sub, x_sample)
    return out
