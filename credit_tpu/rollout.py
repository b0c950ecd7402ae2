"""Autoregressive rollout engine (inference).

Re-designs the reference rollout loop (reference:
credit/applications/rollout_to_netcdf.py:195 predict and
credit/trainers/rollout_utils.py:113 run_forecast) as a single jitted step
that stays on device between steps:

    step: x -> y_pred = model(x); x' = update_x(x, y_pred, forcing_next)

Only the (optional) denormalized output leaves the device; forcing for the
next step is prefetched on host and fed in. NetCDF writes go through an async
thread pool (the reference uses a process pool; host threads suffice since
the heavy work is on-device).
"""

from __future__ import annotations

import concurrent.futures
import logging
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.normalize import Normalizer

logger = logging.getLogger(__name__)


def _tree_has_key(tree, key: str) -> bool:
    """True if any nested dict in `tree` has an entry named `key`."""
    if not isinstance(tree, dict):
        return False
    return any(k == key or _tree_has_key(v, key) for k, v in tree.items())


class RolloutEngine:
    def __init__(self, model, variables: Dict[str, Any], schema: ChannelSchema,
                 normalizer: Optional[Normalizer] = None, history_len: int = 1,
                 postblocks: Optional[Sequence[Callable]] = None,
                 use_ema: bool = False, fold_sn: bool = True):
        # inference fold: divide kernels by their converged sigma once and
        # drop the spectral collection — the per-step sigma math is pure
        # loop-invariant latency in an autoregressive rollout
        if fold_sn and "spectral" in variables and variables["spectral"] \
                and getattr(model, "use_spectral_norm", False):
            from credit_tpu.models.spectral_utils import fold_spectral

            src = {"params": (variables.get("ema_params")
                              if use_ema and variables.get("ema_params")
                              is not None else variables["params"]),
                   "spectral": variables["spectral"]}
            variables = {**variables, **fold_spectral(src), "spectral": {}}
            if use_ema:
                variables.pop("ema_params", None)
                use_ema = False  # already selected above
            model = model.clone(use_spectral_norm=False)
        self.model = model
        self.schema = schema
        self.normalizer = normalizer
        self.history_len = history_len
        self.postblocks = list(postblocks or [])
        params = variables.get("ema_params") if use_ema else None
        params = params if params is not None else variables["params"]
        # trainable postblock nets ride under params['_postblocks'] in
        # checkpoints; split them from the model params for apply
        self.pb_params = None
        if isinstance(params, dict) and "_postblocks" in params:
            self.pb_params = params["_postblocks"]
            params = {k: v for k, v in params.items() if k != "_postblocks"}
        self.variables = {
            "params": params,
            "spectral": variables.get("spectral", {}),
        }
        from credit_tpu.postblock.stochastic import (
            apply_postblocks_stateful, init_postblock_states)

        self._init_states = init_postblock_states
        self._has_stateful = any(getattr(b, "is_stateful", False)
                                 for b in self.postblocks)

        def make_step(fill: bool):
            def step(variables, x, forcing_next, states, key):
                """x: (B, T_hist, H, W, C_in); forcing_next: (B, 1, H, W, n_dyn)
                or None. Returns (y_pred, x_next, states, dpb_cache) — y_pred in
                normalized space."""
                key, noise_key = jax.random.split(key)
                if fill:
                    y_pred, mut = self.model.apply(
                        variables, x, rngs={"noise": noise_key},
                        mutable=["dpb_cache"])
                else:
                    y_pred = self.model.apply(variables, x,
                                              rngs={"noise": noise_key})
                    mut = {}
                y_pred, states = apply_postblocks_stateful(
                    self.postblocks, y_pred, x, states, key,
                    params=self.pb_params)
                new_frame = self.schema.update_x(x[:, -1:], y_pred[:, -1:],
                                                 forcing_next)
                if self.history_len > 1:
                    x_next = jnp.concatenate([x[:, 1:], new_frame], axis=1)
                else:
                    x_next = new_frame
                return y_pred, x_next, states, mut.get("dpb_cache", {})

            return step

        step = make_step(fill=False)
        self._step = jax.jit(step)
        self._step_nofrc = jax.jit(
            lambda variables, x, states, key: step(variables, x, None, states,
                                                   key))
        # first-call fill step: same forward, but also materializes the
        # loop-invariant position-bias tables (see make_scan_rollout); only
        # compiled for models that carry a DynamicPositionBias
        fill = make_step(fill=True)
        self._step_fill = jax.jit(fill)
        self._step_fill_nofrc = jax.jit(
            lambda variables, x, states, key: fill(variables, x, None, states,
                                                   key))
        prm = self.variables.get("params", {})
        self._dpb_pending = (_tree_has_key(prm, "dpb")
                             or _tree_has_key(prm, "cpb_fc1"))
        self._states = {}
        self._key = jax.random.PRNGKey(0)

    def reset(self, batch_size: int = 1, seed: int = 0):
        """(Re)initialize stateful-postblock state (SKEBS pattern etc.)."""
        self._states = self._init_states(self.postblocks, batch_size)
        self._key = jax.random.PRNGKey(seed)

    def step(self, x, forcing_next=None):
        if self._has_stateful and not self._states:
            self.reset(x.shape[0])
        self._key, sub = jax.random.split(self._key)
        if self._dpb_pending:
            # first step doubles as the DPB-cache fill; later dispatches
            # carry the tables and skip the per-layer bias MLPs
            self._dpb_pending = False
            if forcing_next is None:
                y, x2, self._states, cache = self._step_fill_nofrc(
                    self.variables, x, self._states, sub)
            else:
                y, x2, self._states, cache = self._step_fill(
                    self.variables, x, forcing_next, self._states, sub)
            if cache:
                self.variables = {**self.variables, "dpb_cache": cache}
            return y, x2
        if forcing_next is None:
            y, x2, self._states, _ = self._step_nofrc(self.variables, x,
                                                      self._states, sub)
        else:
            y, x2, self._states, _ = self._step(self.variables, x,
                                                forcing_next, self._states,
                                                sub)
        return y, x2

    def run(self, x0: jnp.ndarray, n_steps: int,
            forcing_provider: Optional[Callable[[int], np.ndarray]] = None,
            on_step: Optional[Callable[[int, np.ndarray], None]] = None,
            denormalize: bool = True, async_writers: int = 2) -> List[np.ndarray]:
        """Run n_steps; returns the list of (denormalized) predictions unless
        on_step is given (then predictions stream to it and [] is returned).

        forcing_provider(step_index) -> (B, 1, H, W, n_dyn) for the NEXT
        input, in PHYSICAL units (normalized on entry when a normalizer is
        set — the engine runs the model in normalized space throughout and
        denormalizes only the emitted predictions).
        """
        x = jnp.asarray(x0)
        if self.normalizer is not None:
            x = self.normalizer.normalize_input(x)
        outs: List[np.ndarray] = []
        pool = concurrent.futures.ThreadPoolExecutor(async_writers) if on_step else None
        futures = []
        for s in range(n_steps):
            f_next = None
            if forcing_provider is not None:
                f = forcing_provider(s + 1)
                if f is not None:
                    f_next = jnp.asarray(f)
                    if self.normalizer is not None:
                        f_next = self.normalizer.normalize_forcing(f_next, self.schema)
            y_pred, x = self.step(x, f_next)
            # per-step debug writers on stateful postblocks (reference:
            # skebs.py write_rollout_debug_files) — host-side, between
            # jitted steps
            for i, pb in enumerate(self.postblocks):
                if getattr(pb, "write_rollout_debug_files", False) and \
                        i in (self._states or {}):
                    pb.dump_debug(s, self._states[i])
            y = y_pred
            if denormalize and self.normalizer is not None:
                y = self.normalizer.denormalize_target(y)
            if on_step is not None:
                y_host = np.asarray(y)
                futures.append(pool.submit(on_step, s, y_host))
            else:
                outs.append(np.asarray(y))
        if pool is not None:
            for fu in futures:
                fu.result()
            pool.shutdown()
        return outs


def rk4_step(apply_fn, x: jnp.ndarray) -> jnp.ndarray:
    """Runge-Kutta-4 composition of the single-step model (reference:
    crossformer.py:738 rk4 — treats the model output as a state estimate and
    averages four staged evaluations). apply_fn: x -> y_pred with matching
    prognostic channel count."""
    k1 = apply_fn(x)
    k2 = apply_fn(x + 0.5 * (k1 - x))
    k3 = apply_fn(x + 0.5 * (k2 - x))
    k4 = apply_fn(x + (k3 - x))
    return (k1 + 2 * k2 + 2 * k3 + k4) / 6.0


def make_scan_rollout(model, schema: ChannelSchema, n_steps: int,
                      history_len: int = 1, with_forcing: bool = False,
                      unroll: int = 1, mesh=None):
    """Fully on-device N-step rollout as one lax.scan — a single dispatch,
    no host round-trips between steps (the BASELINE.json north-star
    requirement). Returns (final_x, per-step per-channel means) so the
    whole chain materializes.

    run(variables, x0[, forcings]) where forcings: (S, B, 1, H, W, n_dyn).

    mesh: pass the domain-sharded Mesh to trace under the explicit-halo
    context — convs run per-shard inside shard_map (ops/conv.explicit_halo)
    and the models' pallas 'auto' gates stay ON multi-chip.
    """

    def run(variables, x0, forcings=None):
        if mesh is not None:
            from credit_tpu.ops.conv import explicit_halo

            with explicit_halo(mesh):
                return _run(variables, x0, forcings)
        return _run(variables, x0, forcings)

    def _run(variables, x0, forcings=None):
        def advance(x, y_pred, f):
            new_frame = schema.update_x(x[:, -1:], y_pred[:, -1:], f)
            if history_len > 1:
                x_next = jnp.concatenate([x[:, 1:], new_frame], axis=1)
            else:
                x_next = new_frame
            # keep the carry dtype stable (bf16 models emit bf16 frames;
            # feed a bf16 x0 to run the whole carry at half width)
            x_next = x_next.astype(x.dtype)
            stats = jnp.mean(y_pred, axis=(0, 1, 2, 3))  # (C,)
            return x_next, stats

        # Step 1 runs with mutable=["dpb_cache"]: its forward IS the first
        # rollout step, and as a side effect it materializes the static
        # position-bias tables (models.layers.WindowAttention). The scan
        # body closes over the filled tables as loop constants, so steps
        # 2..N skip the per-layer DPB MLPs (loop-invariant work).
        y0, mut = model.apply(variables, x0, mutable=["dpb_cache"])
        v_cached = {**variables, **mut} if mut.get("dpb_cache") else variables
        x1, stats0 = advance(x0, y0, forcings[0] if with_forcing else None)

        def body(x, f):
            return advance(x, model.apply(v_cached, x), f)

        if n_steps == 1:
            return x1, stats0[None]
        if with_forcing:
            final_x, stats = jax.lax.scan(body, x1, forcings[1:],
                                          length=n_steps - 1, unroll=unroll)
        else:
            final_x, stats = jax.lax.scan(lambda x, _: body(x, None), x1,
                                          None, length=n_steps - 1,
                                          unroll=unroll)
        return final_x, jnp.concatenate([stats0[None], stats], axis=0)

    return run
