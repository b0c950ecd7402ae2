"""Per-domain trainer behaviors driven purely by config through the
load_trainer aliases (round-2 VERDICT item 8):

- samudra: the wet-mask postblock inside the train step zeroes LAND
  gradients (reference: credit/trainers/trainer_om4_samudra.py + the
  wet_mask_samudra postblock).
- multi-step-wrf: boundary forcing channels enter EVERY rollout step via
  the per-step update_x splice (reference: credit/trainers/train_wrf_multi.py
  — boundary-forced regional multi-step).
"""

import jax
import jax.numpy as jnp
import numpy as np

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.synthetic import SyntheticDataset
from credit_tpu.grid import Grid
from credit_tpu.losses import WeightedLoss
from credit_tpu.models import load_model
from credit_tpu.trainers.trainer import load_trainer
from credit_tpu.utils.ncio import Dataset, Variable

H, W = 12, 16


def test_samudra_wet_mask_zeroes_land_gradients(tmp_path):
    rng = np.random.default_rng(0)
    mask = (rng.uniform(0, 1, (H, W)) > 0.4).astype(np.float32)  # 1 = ocean
    mask_path = str(tmp_path / "wet_mask.nc")
    Dataset({"wet_mask": Variable(("lat", "lon"), mask)}).to_netcdf(mask_path)

    conf = {
        "save_loc": str(tmp_path),
        "data": {"source": {"OM4": {
            "levels": [0.0, 1.0],
            "variables": {"prognostic": {"vars_3D": ["thetao"],
                                         "vars_2D": ["zos"]}},
        }}, "history_len": 1, "forecast_len": 1},
        "trainer": {"type": "samudra", "learning_rate": 1e-3,
                    "train_batch_size": 2, "valid_batch_size": 2,
                    "batches_per_epoch": 2, "valid_batches_per_epoch": 1,
                    "num_epoch": 1, "preflight": False},
        "model": {"type": "debugger", "image_height": H, "image_width": W,
                  "levels": 2, "channels": 1, "surface_channels": 1,
                  "input_only_channels": 0, "output_only_channels": 0,
                  "frames": 1, "output_frames": 1,
                  "post_conf": {"activate": True,
                                "wet_mask_samudra": {"activate": True,
                                                     "wet_mask": mask_path}}},
        "loss": {"training_loss": "mse"},
    }
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(H, W, levels=[0.0, 1.0])
    ds = SyntheticDataset(schema, grid, history_len=1, n_times=16, seed=1)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    cls = load_trainer(conf)
    trainer = cls(conf, model, loss, loss, schema, ds, save_loc=str(tmp_path))
    assert len(trainer.train_postblocks) == 1  # mask compiled into the step

    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in ds.batch([2, 3], 1).items()
             if v is not None}
    key = jax.random.PRNGKey(5)
    # undonated step: jax.grad re-invokes the jit after the primal
    # execution, which would hit donated (deleted) buffers
    step = trainer._train_step_for(trainer.forecast_len, donate=False)

    def loss_of(x):
        _, m = step(state, dict(batch, x=x), key)
        return m["loss"]

    g = np.asarray(jax.grad(loss_of)(batch["x"]))  # (B, T, H, W, C)
    land = mask == 0
    ocean = mask == 1
    # the debugger model is pointwise (1x1 linear): the wet mask must kill
    # every land pixel's gradient and leave ocean gradients alive
    np.testing.assert_allclose(g[:, :, land, :], 0.0, atol=1e-9)
    assert np.abs(g[:, :, ocean, :]).max() > 1e-6

    # and the full fit loop runs under the 'samudra' alias
    st = trainer.fit(seed=0)
    assert np.isfinite(float(jax.device_get(st.step)))


def test_wrf_multi_boundary_forcing_enters_each_step(tmp_path):
    """Boundary (dynamic_forcing) channels are spliced into x before EVERY
    rollout step: the step-2 loss must depend on the step-2 boundary
    values (reference: train_wrf_multi.py boundary-forced multi-step)."""
    pi = dict(image_height=H, image_width=W + 8, patch_height=2,
              patch_width=2, levels=2, frames=1, frame_patch_size=1,
              channels=1, surface_channels=1, input_only_channels=2,
              output_only_channels=0, dim=32)
    conf = {
        "save_loc": str(tmp_path),
        "data": {"source": {"WRF": {
            "levels": [0.0, 1.0],
            "variables": {
                "prognostic": {"vars_3D": ["T"], "vars_2D": ["PSFC"]},
                "dynamic_forcing": {"vars_2D": ["U_BDY", "V_BDY"]},
            },
        }}, "history_len": 1, "forecast_len": 2},
        "trainer": {"type": "multi-step-wrf", "learning_rate": 1e-3,
                    "train_batch_size": 2, "valid_batch_size": 2,
                    "batches_per_epoch": 2, "valid_batches_per_epoch": 1,
                    "num_epoch": 1, "preflight": False},
        "model": {"type": "wrf", "param_interior": pi,
                  "time_encode_dim": 4, "depth": 1, "num_heads": 4,
                  "window_size": 4, "num_groups": 8,
                  "use_spectral_norm": False},
        "loss": {"training_loss": "mse"},
    }
    schema = ChannelSchema.from_config(conf)
    assert schema.n_input == 5  # T x2 + PSFC + 2 boundary channels
    grid = Grid.regular(H, W + 8, levels=[0.0, 1.0])
    ds = SyntheticDataset(schema, grid, history_len=1, n_times=16, seed=2)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    cls = load_trainer(conf)
    trainer = cls(conf, model, loss, loss, schema, ds, save_loc=str(tmp_path))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in ds.batch([2, 3], 2).items()
             if v is not None}
    assert batch["forcing"].shape[1] == 2  # one boundary frame per step
    key = jax.random.PRNGKey(5)
    # undonated step: loss_of is called repeatedly with the same state
    step = trainer._train_step_for(trainer.forecast_len, donate=False)

    def loss_of(forcing):
        _, m = step(state, dict(batch, forcing=forcing), key)
        return float(m["loss"])

    # boundary frames align with target times [t+1, t+2]: the state at t+1
    # (step-2 input) carries frame 0 via update_x — the loss must CHANGE
    # when frame 0 changes. Gradients are intentionally stopped between
    # steps (the reference detaches the assembled next input too,
    # trainer_gen2.py:239), so test value influence, not grads.
    base = loss_of(batch["forcing"])
    bumped = loss_of(batch["forcing"].at[:, 0].add(1.0))
    assert abs(bumped - base) > 1e-7, "step-2 boundary unused"
    # frame 1 (t+2) is valid only AFTER the final prediction — it must be
    # inert; this pins the state-time convention (a forcing off-by-one
    # would flip both assertions)
    same = loss_of(batch["forcing"].at[:, 1].add(1.0))
    assert abs(same - base) < 1e-9, "t+2 boundary leaked into the rollout"

    st = trainer.fit(seed=0)
    assert np.isfinite(float(jax.device_get(st.step)))
