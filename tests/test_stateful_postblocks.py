"""Stateful postblock (SKEBS) + advection postblock rollout integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from credit_tpu.data.channels import ChannelSchema
from credit_tpu.data.synthetic import SyntheticDataset
from credit_tpu.grid import Grid
from credit_tpu.models import load_model
from credit_tpu.rollout import RolloutEngine

NLEV = 2
CONF = {
    "model": {"type": "debugger", "image_height": 17, "image_width": 32,
              "levels": NLEV, "channels": 3, "surface_channels": 1,
              "input_only_channels": 0, "output_only_channels": 0},
    "data": {"source": {"E": {"levels": [0.0, 1.0], "variables": {
        "prognostic": {"vars_3D": ["U", "V", "Q"], "vars_2D": ["SP"]}}}}},
}


@pytest.fixture(scope="module")
def env():
    schema = ChannelSchema.from_config(CONF)
    grid = Grid.regular(17, 32)
    model = load_model(CONF)
    ds = SyntheticDataset(schema, grid, n_times=12, seed=1)
    x = jnp.asarray(ds.input_at(2)[None])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return schema, grid, model, variables, ds


def test_skebs_postblock_in_rollout(env):
    from credit_tpu.postblock.stochastic import SKEBSPostblock

    schema, grid, model, variables, ds = env
    pb = SKEBSPostblock(schema, grid, backscatter=1e-5, lmax=12, mmax=12)
    engine = RolloutEngine(model, variables, schema, postblocks=[pb])
    engine_plain = RolloutEngine(model, variables, schema)
    x0 = jnp.asarray(ds.input_at(2)[None])
    outs = engine.run(x0, 3, denormalize=False)
    plain = engine_plain.run(x0, 3, denormalize=False)
    assert all(np.isfinite(o).all() for o in outs)
    # SKEBS must actually perturb winds
    ui = schema.target_names.index("U_L0")
    diff = np.abs(outs[0][..., ui] - plain[0][..., ui]).max()
    assert diff > 0
    # and the pattern state must evolve between steps (different perturbation)
    d01 = np.abs((outs[1] - plain[1]) - (outs[0] - plain[0])).max()
    assert d01 > 0


def test_skebs_rollout_debug_files(env, tmp_path):
    """write_rollout_debug_files dumps the per-step pattern + perturbation
    winds to debug_skebs/ (reference: skebs.py:426-440)."""
    from credit_tpu.postblock.stochastic import SKEBSPostblock
    from credit_tpu.utils.ncio import open_dataset

    schema, grid, model, variables, ds = env
    pb = SKEBSPostblock(schema, grid, backscatter=1e-5, lmax=12, mmax=12,
                        write_rollout_debug_files=True,
                        save_loc=str(tmp_path))
    engine = RolloutEngine(model, variables, schema, postblocks=[pb])
    x0 = jnp.asarray(ds.input_at(2)[None])
    engine.run(x0, 2, denormalize=False)
    import os

    files = sorted(os.listdir(tmp_path / "debug_skebs"))
    assert files == ["skebs_0000.nc", "skebs_0001.nc"]
    d = open_dataset(str(tmp_path / "debug_skebs" / files[0]))
    for v in ("psi_pattern", "pert_u", "pert_v"):
        arr = np.asarray(d[v].values)
        assert arr.shape == (1, 17, 32) and np.isfinite(arr).all()
    # the AR(1) pattern evolves between steps
    d1 = open_dataset(str(tmp_path / "debug_skebs" / files[1]))
    assert not np.allclose(np.asarray(d["psi_pattern"].values),
                           np.asarray(d1["psi_pattern"].values))


def test_skebs_iteration_stop(env):
    """iteration_stop zeroes the perturbation after N steps (reference
    skebs.py:443 early shutoff)."""
    from credit_tpu.postblock.stochastic import SKEBSPostblock

    schema, grid, model, variables, ds = env
    pb = SKEBSPostblock(schema, grid, backscatter=1e-5, lmax=12, mmax=12,
                        iteration_stop=1)
    engine = RolloutEngine(model, variables, schema, postblocks=[pb])
    plain = RolloutEngine(model, variables, schema)
    x0 = jnp.asarray(ds.input_at(2)[None])
    outs = engine.run(x0, 2, denormalize=False)
    ref = plain.run(x0, 2, denormalize=False)
    ui = schema.target_names.index("U_L0")
    # step 0 perturbed, step 1 shut off (identical up to feedback of step 0)
    assert np.abs(outs[0][..., ui] - ref[0][..., ui]).max() > 0
    # rerun with stop=0 (never) to contrast step-1 perturbation presence
    pb2 = SKEBSPostblock(schema, grid, backscatter=1e-5, lmax=12, mmax=12)
    outs2 = RolloutEngine(model, variables, schema,
                          postblocks=[pb2]).run(x0, 2, denormalize=False)
    d_stop = np.abs(outs[1] - ref[1]).max()
    d_on = np.abs(outs2[1] - ref[1]).max()
    assert d_on > d_stop  # shutoff reduces the step-1 deviation


def test_advection_postblock_runs(env):
    from credit_tpu.postblock.stochastic import AdvectionPostblock

    schema, grid, model, variables, ds = env
    pb = AdvectionPostblock(schema, grid,
                            a_half=np.linspace(1000, 0, NLEV + 1),
                            b_half=np.linspace(0, 1, NLEV + 1),
                            tracer_vars=["Q"])
    engine = RolloutEngine(model, variables, schema, postblocks=[pb])
    x0 = jnp.asarray(ds.input_at(2)[None])
    outs = engine.run(x0, 2, denormalize=False)
    assert all(np.isfinite(o).all() for o in outs)
