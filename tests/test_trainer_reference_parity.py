"""Trainer-LEVEL parity gate vs the reference training loop.

Runs the reference's REAL TrainerERA5Gen2.train_one_epoch (in place, as an
oracle — reference: credit/trainers/trainer_gen2.py:270-497, with the real
ConcatToTensor preblock, Reconstruct postblock and assemble_rollout_batch
splice) and our jitted train step from the SAME converted weights and the
SAME synthetic multi-step batches, then asserts the loss trajectories agree.

This gates the training-step SEMANTICS — forcing-frame alignment, the
prognostic splice between rollout steps, the stop-gradient/detach boundary,
backprop_on_timestep selection, SN power-iteration scheduling and AdamW —
which model-forward parity tests (test_torch_parity.py) cannot see: the
round-3 forcing-frame off-by-one lived through two rounds of green tests
precisely because only forwards were oracle-gated.

Loss-normalization convention note: the reference backwards each selected
step's loss and LOGS THE SUM (accum_log); our step accumulates grads and
divides both loss and grads by n_backprop. With backprop on the LAST step
only the factor is 1 and everything below compares exactly; the [1,2] test
checks sum == 2 x mean explicitly.
"""

import copy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from credit_tpu.convert_torch import convert_crossformer
from credit_tpu.data.channels import ChannelSchema
from credit_tpu.losses import WeightedLoss
from credit_tpu.models import load_model
from credit_tpu.trainers.trainer import (TrainState, make_optimizer,
                                         make_train_step)
from tests.reference_oracle import (TINY_KW, build_reference_crossformer,
                                    install_reference)

B, H, W = 1, 32, 64
N_PROG, N_DYN, N_DIAG = 6, 1, 1  # 2 vars_3D x 2 levels + 2 vars_2D; TISR; PRECIP


def _data_conf(forecast_len: int) -> dict:
    return {
        "forecast_len": forecast_len,
        "history_len": 1,
        "retain_graph": False,
        "source": {
            "era5": {
                "levels": [0.0, 1.0],
                "variables": {
                    "prognostic": {"vars_3D": ["U", "T"],
                                   "vars_2D": ["SP", "T2M"]},
                    "diagnostic": {"vars_3D": [], "vars_2D": ["PRECIP"]},
                    "dynamic_forcing": {"vars_2D": ["TISR"]},
                    "static": {"vars_2D": []},
                },
            }
        },
    }


def _make_fields(rng, n_groups):
    """Random physical fields per batch group: initial state P0/F0, per-step
    forcing F (valid at t0+t) and targets P/D (valid at t0+t)."""
    g = []
    for _ in range(n_groups):
        g.append({
            "P0": rng.standard_normal((B, N_PROG, 1, H, W)).astype(np.float32) * 0.5,
            "F": [rng.standard_normal((B, N_DYN, 1, H, W)).astype(np.float32) * 0.5
                  for _ in range(3)],  # F[0]=t0 forcing; F[t]=forcing at t0+t
            "P": [rng.standard_normal((B, N_PROG, 1, H, W)).astype(np.float32) * 0.5
                  for _ in range(3)],  # P[t]=prognostic target at t0+t
            "D": [rng.standard_normal((B, N_DIAG, 1, H, W)).astype(np.float32) * 0.5
                  for _ in range(3)],
        })
    return g


class _Loader:
    """Yields the reference's per-rollout-step nested batches: t=1 carries the
    full initial input; t>1 only the step's dynamic forcing (exactly what the
    gen2 datasets return for step > 0; base_dataset.py:311)."""

    dataset = type("D", (), {})()
    sampler = None

    def __init__(self, groups, forecast_len):
        self.groups = groups
        self.flen = forecast_len

    def __len__(self):
        return len(self.groups) * self.flen

    @staticmethod
    def _nested_prog(P):
        return {
            "era5/prognostic/3d/U": torch.from_numpy(P[:, 0:2]),
            "era5/prognostic/3d/T": torch.from_numpy(P[:, 2:4]),
            "era5/prognostic/2d/SP": torch.from_numpy(P[:, 4:5]),
            "era5/prognostic/2d/T2M": torch.from_numpy(P[:, 5:6]),
        }

    def __iter__(self):
        for f in self.groups:
            for t in range(1, self.flen + 1):
                target = {**self._nested_prog(f["P"][t]),
                          "era5/diagnostic/2d/PRECIP":
                              torch.from_numpy(f["D"][t])}
                if t == 1:
                    inp = {**self._nested_prog(f["P0"]),
                           "era5/dynamic_forcing/2d/TISR":
                               torch.from_numpy(f["F"][0])}
                else:
                    inp = {"era5/dynamic_forcing/2d/TISR":
                               torch.from_numpy(f["F"][t - 1])}
                yield {"input": {"era5": inp}, "target": {"era5": target}}


def _run_reference(groups, forecast_len, backprop_on, tmp_path, seed=7):
    """Drive the REAL reference trainer; returns (per-call losses, model)."""
    install_reference()
    from credit.trainers.trainer_gen2 import TrainerERA5Gen2

    torch.manual_seed(seed)
    model, kw = build_reference_crossformer(use_spectral_norm=True)
    init_sd = copy.deepcopy(model.state_dict())

    conf = {
        "save_loc": str(tmp_path),
        "trainer": {
            "mode": "none", "start_epoch": 0, "epochs": 1, "num_epoch": 1,
            "amp": False, "use_scheduler": False, "use_ema": False,
            "use_tensorboard": False, "skip_validation": True,
            "train_batch_size": B, "batches_per_epoch": len(groups),
            "valid_batches_per_epoch": 1, "grad_max_norm": 0.0,
            "backprop_on_timestep": backprop_on,
        },
        "data": _data_conf(forecast_len),
        "preblocks": {"per_step": {"concat": {"type": "concat"}}},
        "postblocks": {"per_step": {"reconstruct": {"type": "reconstruct"}}},
    }
    trainer = TrainerERA5Gen2(model, rank=0, conf=conf)
    model.train()
    optimizer = torch.optim.AdamW(model.parameters(), lr=1e-3,
                                  betas=(0.9, 0.95), weight_decay=0.0)

    losses = []
    mse = torch.nn.MSELoss()

    def criterion(y, y_pred):
        val = mse(y_pred, y)
        losses.append(float(val.detach()))
        return val

    scaler = torch.amp.GradScaler("cpu", enabled=False)
    trainer.train_one_epoch(
        epoch=0, trainloader=_Loader(groups, forecast_len),
        optimizer=optimizer, criterion=criterion, scaler=scaler,
        scheduler=None, metrics=lambda p, y: {})
    return losses, init_sd, kw


def _run_ours(groups, forecast_len, backprop_on_0based, init_sd, kw):
    """Our jitted multi-step train step from the converted initial weights on
    the same batches; returns the per-optimizer-step mean losses."""
    conf = {"model": {"type": "crossformer", **{
        k: (list(v) if isinstance(v, tuple) else v) for k, v in kw.items()}},
        "data": _data_conf(forecast_len)}
    schema = ChannelSchema.from_config(conf)
    model = load_model(conf)
    assert schema.n_input == model.base_input_channels
    assert schema.n_target == model.base_output_channels

    x0 = jnp.zeros((B, 1, H, W, schema.n_input), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    variables = convert_crossformer(init_sd, variables, strict=True)

    optimizer = make_optimizer({"trainer": {}}, lambda _: 1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       spectral=variables["spectral"],
                       opt_state=optimizer.init(variables["params"]))
    step = jax.jit(make_train_step(model, WeightedLoss(base="mse"), optimizer,
                                   schema, forecast_len=forecast_len,
                                   backprop_on_timestep=backprop_on_0based,
                                   history_len=1))

    def chlast(t):  # (B, C, T, H, W) -> (B, T, H, W, C)
        return np.transpose(t, (0, 2, 3, 4, 1))

    losses = []
    for f in groups:
        x = jnp.asarray(chlast(np.concatenate([f["P0"], f["F"][0]], axis=1)))
        y = jnp.concatenate(
            [jnp.asarray(chlast(np.concatenate([f["P"][t], f["D"][t]], axis=1)))
             for t in range(1, forecast_len + 1)], axis=1)
        forcing = jnp.concatenate(
            [jnp.asarray(chlast(f["F"][t])) for t in range(1, forecast_len + 1)],
            axis=1)
        state, m = step(state, {"x": x, "y": y, "forcing": forcing},
                        jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    return losses


def test_loss_trajectory_parity_backprop_last():
    """backprop on the LAST step only (n_bp=1: gradients identical by
    construction) — two optimizer steps; the second group's loss has the
    first update compiled in, so any divergence in splice/forcing/detach/
    AdamW semantics shows up here."""
    import tempfile

    rng = np.random.default_rng(42)
    groups = _make_fields(rng, n_groups=2)
    with tempfile.TemporaryDirectory() as td:
        ref_losses, init_sd, kw = _run_reference(
            groups, forecast_len=2, backprop_on=[2], tmp_path=td)
    ours = _run_ours(groups, forecast_len=2, backprop_on_0based=[1],
                     init_sd=init_sd, kw=kw)
    # reference records one criterion call per group (t=2 only)
    assert len(ref_losses) == 2 and len(ours) == 2
    np.testing.assert_allclose(ours, ref_losses, rtol=2e-3)
    # the two groups must differ (the optimizer stepped in between)
    assert abs(ref_losses[1] - ref_losses[0]) > 1e-7


def test_loss_trajectory_parity_backprop_all():
    """backprop on BOTH steps: the reference logs the SUM of step losses,
    ours the mean over n_bp — sum == n_bp x mean, pre-update exact."""
    import tempfile

    rng = np.random.default_rng(43)
    groups = _make_fields(rng, n_groups=1)
    with tempfile.TemporaryDirectory() as td:
        ref_losses, init_sd, kw = _run_reference(
            groups, forecast_len=2, backprop_on=[1, 2], tmp_path=td)
    ours = _run_ours(groups, forecast_len=2, backprop_on_0based=[0, 1],
                     init_sd=init_sd, kw=kw)
    assert len(ref_losses) == 2  # criterion called at t=1 and t=2
    np.testing.assert_allclose(ours[0], sum(ref_losses) / 2.0, rtol=2e-3)
