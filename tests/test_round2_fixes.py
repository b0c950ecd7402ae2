"""Round-2 robustness + in-step pipeline tests.

Covers the VERDICT round-1 weak items: data_parallel_coords correctness,
dry-globe water-fixer guard, loud dp/batch mismatch, postblocks + per-variable
LatWeightedMetrics wired into the jitted train step (reference semantics:
credit/trainers/trainer_gen2.py:270-497)."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.grid import Grid
from credit_tpu.parallel.mesh import build_mesh, data_parallel_coords, local_dp_rows
from credit_tpu.postblock import GlobalWaterFixer, _VarView


def test_data_parallel_coords_single_process():
    mesh = build_mesh(dp=2, tp=2, domain=1, devices=jax.devices()[:4])
    rank, size = data_parallel_coords(mesh)
    assert size == 2
    assert rank == 0  # single process owns row 0 (and all others)
    assert local_dp_rows(mesh) == (0, 1)


def test_data_parallel_coords_dp_only():
    mesh = build_mesh(dp=4, devices=jax.devices()[:4])
    rank, size = data_parallel_coords(mesh)
    assert (rank, size) == (0, 4)
    assert local_dp_rows(mesh) == (0, 1, 2, 3)


# ---------------------------------------------------------------------------
H, W, NLEV = 8, 16, 4

FIX_CONF = {
    "data": {
        "source": {
            "ERA5": {
                "levels": [1000.0, 10000.0, 50000.0, 100000.0],
                "variables": {
                    "prognostic": {"vars_3D": ["Q"], "vars_2D": ["SP"]},
                    "diagnostic": {"vars_2D": ["total_precipitation",
                                               "evaporation"]},
                },
            }
        }
    }
}


def _water_env():
    schema = ChannelSchema.from_config(FIX_CONF)
    grid = Grid.regular(H, W, levels=list(range(NLEV)))
    ak = np.array([10000.0, 5000.0, 1500.0, 0.0])
    bk = np.array([0.0, 0.3, 0.8, 1.0])
    rng = np.random.default_rng(0)
    x = np.zeros((1, 1, H, W, schema.n_input), np.float32)
    y = np.zeros((1, 1, H, W, schema.n_target), np.float32)
    for arr, entries in ((x, schema.input_entries), (y, schema.target_entries)):
        for e in entries:
            base = e.name.rpartition("_L")[0] or e.name
            if base == "Q":
                arr[..., e.index] = rng.uniform(0.001, 0.008)
            elif e.name == "SP":
                arr[..., e.index] = rng.normal(1.0e5, 100, (H, W))
    return schema, grid, ak, bk, jnp.asarray(x), jnp.asarray(y)


def test_water_fixer_dry_globe_is_finite():
    """All-zero precip (easy early in training) must not produce NaN/inf
    (round-1 weak item 8: unguarded division by p_sum)."""
    schema, grid, ak, bk, x, y = _water_env()
    fixer = GlobalWaterFixer(schema, grid, ak=ak, bk=bk, midpoint=False)
    y_fixed = fixer(y, x)  # precip and evap are exactly zero in y
    assert bool(jnp.all(jnp.isfinite(y_fixed)))
    pv = _VarView(schema, "total_precipitation", target=True)
    np.testing.assert_allclose(np.asarray(pv.get(y_fixed)), 0.0)


# ---------------------------------------------------------------------------
TRAIN_CONF = {
    "seed": 0,
    "data": {
        "source": {
            "ERA5": {
                "levels": [1000.0, 10000.0, 50000.0, 100000.0],
                "variables": {
                    "prognostic": {"vars_3D": ["Q"], "vars_2D": ["SP"]},
                    "diagnostic": {"vars_2D": ["total_precipitation",
                                               "evaporation"]},
                },
            }
        },
        "history_len": 1,
        "forecast_len": 1,
    },
    "trainer": {
        "type": "era5-v2",
        "learning_rate": 1e-3,
        "train_batch_size": 2,
        "valid_batch_size": 2,
        "batches_per_epoch": 2,
        "valid_batches_per_epoch": 1,
        "num_epoch": 1,
        "preflight": False,
    },
    "model": {
        "type": "debugger",
        "image_height": H,
        "image_width": W,
        "levels": NLEV,
        "channels": 1,
        "surface_channels": 1,
        "input_only_channels": 0,
        "output_only_channels": 2,
        "frames": 1,
        "output_frames": 1,
        "post_conf": {
            "activate": True,
            "global_mass_fixer": {
                "activate": True,
                "q_var": "Q", "sp_var": "SP",
                "ak": [10000.0, 5000.0, 1500.0, 0.0],
                "bk": [0.0, 0.3, 0.8, 1.0],
                "midpoint": False,
            },
        },
    },
    "loss": {"training_loss": "mse"},
}


def _make_trainer(tmp_path):
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import Trainer

    conf = {**TRAIN_CONF, "save_loc": str(tmp_path)}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(H, W, levels=[1000.0, 10000.0, 50000.0, 100000.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=24, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    vloss = WeightedLoss.from_config(conf, grid, validation=True)
    return conf, schema, grid, dataset, Trainer(
        conf, model, loss, vloss, schema, dataset, save_loc=str(tmp_path))


def test_postblocks_and_metrics_in_train_step(tmp_path):
    """Mass fixer active inside the train step: the dry-air budget closes on
    y_pred, and training_log.csv carries per-variable metric columns."""
    from credit_tpu.physics.core import HybridSigmaPhysics

    conf, schema, grid, dataset, trainer = _make_trainer(tmp_path)
    assert trainer.metrics_fn is not None
    state = trainer.fit(seed=0)

    # per-variable columns present (reference: base_trainer.py:663-703)
    with open(os.path.join(str(tmp_path), "training_log.csv")) as f:
        rows = list(csv.DictReader(f))
    cols = rows[0].keys()
    assert any(c.startswith("train_rmse_") for c in cols), sorted(cols)
    assert "train_rmse_SP" in cols

    # budget closes on a fresh prediction through the same step's postblocks
    batch = {k: jnp.asarray(v) for k, v in dataset.batch([2, 3], 1).items()
             if v is not None}
    # run one more train step and check its y_pred via the fixer directly:
    # apply model + postblock exactly as the step does
    y_pred, _ = trainer.model.apply(
        {"params": state.params, "spectral": state.spectral}, batch["x"],
        train=True, mutable=["spectral"], rngs={"noise": jax.random.PRNGKey(0)})
    post = trainer._build_train_postblocks()
    assert len(post) == 1
    y_fixed = post[0](y_pred, batch["x"])

    core = HybridSigmaPhysics(grid, np.array([10000.0, 5000.0, 1500.0, 0.0]),
                              np.array([0.0, 0.3, 0.8, 1.0]), midpoint=False)
    qv = _VarView(schema, "Q", target=True)
    spv = _VarView(schema, "SP", target=True)
    qi = _VarView(schema, "Q", target=False)
    spi = _VarView(schema, "SP", target=False)
    m_in = core.total_dry_air_mass(qi.get(batch["x"]), spi.get(batch["x"]))
    m_fixed = core.total_dry_air_mass(qv.get(y_fixed), spv.get(y_fixed))
    np.testing.assert_allclose(np.asarray(m_fixed), np.asarray(m_in), rtol=1e-4)


def test_batch_dp_mismatch_is_loud(tmp_path):
    """train_batch_size % dp != 0 must raise, not silently run dp=1."""
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import Trainer

    conf = {**TRAIN_CONF, "save_loc": str(tmp_path)}
    conf["trainer"] = {**conf["trainer"], "train_batch_size": 2,
                       "parallelism": {"data": 4, "tensor": 2, "domain": 1}}
    conf["model"] = {**conf["model"], "post_conf": {}}
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(H, W, levels=[1000.0, 10000.0, 50000.0, 100000.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=24, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(conf, model, loss, loss, schema, dataset, save_loc=str(tmp_path))


def test_fold_spectral_matches_sn_forward():
    """Inference fold: model with SN == model without SN on folded kernels
    (the rollout-latency lever: sigma math leaves the per-step graph)."""
    import jax.numpy as jnp

    from credit_tpu.models import load_model
    from credit_tpu.models.spectral_utils import (converge_spectral,
                                                  fold_spectral)

    base = dict(type="crossformer", frames=1, output_frames=1,
                image_height=32, image_width=64, levels=2, channels=2,
                surface_channels=1, input_only_channels=0,
                output_only_channels=0, dim=[16, 32, 64, 128],
                depth=[1, 1, 1, 1], global_window_size=[2, 2, 2, 1],
                local_window_size=2, dim_head=8,
                cross_embed_kernel_sizes=[[2, 4], [2, 2], [2, 2], [2, 2]],
                cross_embed_strides=[2, 2, 2, 2], interp=True)
    m_sn = load_model({"model": {**base, "use_spectral_norm": True}})
    m_plain = load_model({"model": {**base, "use_spectral_norm": False}})
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 64, 5))
    v = jax.jit(m_sn.init)(jax.random.PRNGKey(0), x)
    v = converge_spectral(v)
    y_sn = m_sn.apply(v, x)
    folded = fold_spectral(v)
    assert "spectral" not in folded
    y_fold = m_plain.apply(folded, x)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_sn),
                               rtol=2e-5, atol=2e-5)


def test_rollout_engine_fold_parity():
    """RolloutEngine(fold_sn=True) reproduces the unfolded engine."""
    from credit_tpu.models import load_model
    from credit_tpu.models.spectral_utils import converge_spectral
    from credit_tpu.rollout import RolloutEngine

    conf = {"data": {"source": {"ERA5": {
        "levels": [0.0, 1.0],
        "variables": {"prognostic": {"vars_3D": ["T"], "vars_2D": ["SP"]}},
    }}}}
    schema = ChannelSchema.from_config(conf)
    model = load_model({"model": dict(
        type="crossformer", frames=1, output_frames=1, image_height=32,
        image_width=64, levels=2, channels=1, surface_channels=1,
        input_only_channels=0, output_only_channels=0,
        dim=[16, 32, 64, 128], depth=[1, 1, 1, 1],
        global_window_size=[2, 2, 2, 1], local_window_size=2, dim_head=8,
        cross_embed_kernel_sizes=[[2, 4], [2, 2], [2, 2], [2, 2]],
        cross_embed_strides=[2, 2, 2, 2], use_spectral_norm=True,
        interp=True)})
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 64, 3))
    v = converge_spectral(jax.jit(model.init)(jax.random.PRNGKey(0), x0))
    e1 = RolloutEngine(model, v, schema, fold_sn=False)
    e2 = RolloutEngine(model, v, schema, fold_sn=True)
    assert e2.model.use_spectral_norm is False
    y1 = e1.run(x0, 2)
    y2 = e2.run(x0, 2)
    for a, b in zip(y1, y2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_all_reference_trainer_keys_resolve():
    """Every trainer key the reference registry accepts
    (credit/trainers/__init__.py:7-78) must load a trainer class here."""
    from credit_tpu.trainers.trainer import load_trainer

    keys = ["era5-gen1", "era5", "gen2", "era5-gen2", "era5-diffusion",
            "era5-ensemble", "cam", "ic-opt", "conus404", "standard-les",
            "standard-wrf", "multi-step-wrf", "samudra"]
    for k in keys:
        cls = load_trainer({"trainer": {"type": k}})
        assert cls is not None, k
