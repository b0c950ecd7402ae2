"""CLI: credit-tpu {init,train,rollout,preprocess,convert,metrics,plot,
submit,serve}.

Mirrors the reference CLI surface (reference: credit/cli/_parser.py:32-123,
357 — subcommands init/preprocess/train/rollout/realtime/submit/convert/
plot/metrics; the `ask` LLM agent is an explicit non-goal, SURVEY.md). The
launcher (`submit`) generates TPU-pod launch scripts instead of PBS/SLURM
GPU scripts — the reference's scheduler generation (credit/pbs.py,
credit/slurm.py) maps onto GKE/`gcloud compute tpus` style multi-worker
launches, plus plain SLURM for TPU-VM clusters.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("credit_tpu")

TEMPLATE = """\
save_loc: ./experiment
seed: 1000

data:
  source:
    ERA5:
      dataset_type: synthetic   # synthetic | local (+ zarr sources when installed)
      levels: [0., 1., 2., 3.]
      variables:
        prognostic:
          vars_3D: ['U', 'V', 'T', 'Q']
          vars_2D: ['SP', 'VAR_2T']
        dynamic_forcing:
          vars_2D: ['tsi']
        static:
          vars_2D: ['lsm']
        diagnostic:
          vars_2D: ['total_precipitation']
  history_len: 1
  forecast_len: 1
  lead_time_periods: 6

trainer:
  type: era5-v2
  learning_rate: 1.0e-4
  weight_decay: 0.0
  train_batch_size: 2
  batches_per_epoch: 10
  num_epoch: 2
  grad_max_norm: 1.0
  use_ema: false
  parallelism:
    data: none
    tensor: 1
    domain: 1

model:
  type: crossformer
  frames: 1
  image_height: 64
  image_width: 128
  levels: 4
  channels: 4
  surface_channels: 2
  input_only_channels: 2
  output_only_channels: 1
  dim: [32, 64, 128, 256]
  depth: [1, 1, 2, 1]
  global_window_size: [4, 2, 2, 1]
  local_window_size: 2
  cross_embed_kernel_sizes: [[4, 8], [2, 4], [2, 4], [2, 4]]
  cross_embed_strides: [2, 2, 2, 2]
  use_spectral_norm: true
  interp: true
  padding_conf: {activate: true, mode: earth, pad_lat: [16, 16], pad_lon: [0, 0]}

loss:
  training_loss: mse
  use_latitude_weights: true

predict:
  forecast_steps: 4
"""


def _load(args):
    from credit_tpu.config import load_config

    return load_config(args.config)


def cmd_init(args):
    path = args.config or "config.yml"
    if os.path.exists(path) and not args.force:
        print(f"{path} exists; use --force to overwrite", file=sys.stderr)
        return 1
    with open(path, "w") as f:
        f.write(TEMPLATE)
    print(f"wrote template config to {path}")
    return 0


def cmd_train(args):
    from credit_tpu.applications import run_training

    conf = _load(args)
    # multi-host bootstrap BEFORE any device use (reference:
    # credit/distributed.py:32 setup); no-op for single-process configs
    from credit_tpu.parallel.distributed import maybe_initialize

    maybe_initialize(conf)
    if args.profile:
        import jax

        trace_dir = os.path.join(conf.get("save_loc", "."), "profile")
        with jax.profiler.trace(trace_dir):
            run_training(conf, seed=args.seed)
        print(f"profiler trace written to {trace_dir} "
              f"(view with TensorBoard or xprof)")
        return 0
    run_training(conf, seed=args.seed)
    return 0


def cmd_rollout(args):
    from credit_tpu.applications import run_rollout

    paths = run_rollout(_load(args), n_steps=args.steps, save_dir=args.out,
                        use_ema=args.ema)
    for p in paths:
        print(p)
    if getattr(args, "diff_against", None):
        # HF-checkpoint parity acceptance (docs/HF_PARITY.md): compare the
        # produced netCDFs against reference rollout files and fail loudly
        from credit_tpu.applications.experiment import diff_rollout

        report = diff_rollout(paths, args.diff_against,
                              rtol=args.diff_rtol, atol=args.diff_atol)
        worst = 0.0
        ok = True
        for e in report:
            ok = ok and e["ok"]
            tag = "OK  " if e["ok"] else "FAIL"
            print(f"[diff {tag}] {e['path']} vs {e.get('ref')}")
            for name, v in sorted(e.get("vars", {}).items()):
                if "rel" in v:
                    worst = max(worst, v["rel"])
                    print(f"    {name:24s} max_abs={v['max_abs']:.3e} "
                          f"rel={v['rel']:.3e} {'' if v['ok'] else '  <-- OVER'}")
                else:
                    print(f"    {name:24s} {v}")
        print(f"[diff] worst relative error {worst:.3e} "
              f"(rtol={args.diff_rtol}, atol={args.diff_atol}*scale) -> "
              f"{'PASS' if ok else 'FAIL'}")
        return 0 if ok else 1
    return 0


def cmd_realtime(args):
    """Realtime NWP-initialized rollout (reference: rollout_realtime.py +
    credit/nwp.py build_GFS_init)."""
    from credit_tpu.applications.realtime import load_fields_npz, run_realtime

    conf = _load(args)
    fields = coords = None
    if args.fields:
        fields, coords = load_fields_npz(args.fields)
    paths = run_realtime(conf, n_steps=args.steps, save_dir=args.out,
                         fields=fields, coords=coords)
    for p in paths:
        print(p)
    return 0


def cmd_preprocess(args):
    """Fit per-channel normalization stats over training samples and write
    them next to the checkpoint (reference: credit preprocess,
    applications/preprocess.py)."""
    import numpy as np

    from credit_tpu.applications.experiment import build_data
    from credit_tpu.config import load_config

    # data-only configs (no `model` section) are valid here, matching the
    # reference whose preprocess never touches the model
    conf = load_config(args.config, require_model=False)
    exp = build_data(conf)
    ds, schema = exp["dataset"], exp["schema"]
    n = min(len(ds) - 2, args.samples)
    xs, ys = [], []
    for t in range(ds.history_len, ds.history_len + n):
        s = ds.sample(t, 1)
        xs.append(s["x"].reshape(-1, schema.n_input))
        ys.append(s["y"].reshape(-1, schema.n_target))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    save_loc = conf.get("save_loc", ".")
    os.makedirs(save_loc, exist_ok=True)
    out = os.path.join(save_loc, "normalization.npz")
    np.savez(out, input_mean=x.mean(0), input_std=x.std(0) + 1e-8,
             target_mean=y.mean(0), target_std=y.std(0) + 1e-8)
    if args.scaler:
        # bridgescaler-analogue distribution scalers (reference:
        # applications/preprocess.py fits DQuantile/DMinMax over workers;
        # here per-channel over the sampled rows)
        sout = os.path.join(save_loc, "scaler.npz")
        if args.scaler == "quantile":
            nq = int(args.quantiles)
            qs = np.linspace(0, 100, nq)
            np.savez(sout, quantiles=np.stack(
                [np.percentile(x[:, c], qs) for c in range(x.shape[1])]))
        elif args.scaler == "minmax":
            np.savez(sout, min=x.min(0), max=x.max(0) + 1e-8)
        else:
            np.savez(sout, mean=x.mean(0), std=x.std(0) + 1e-8)
        print(f"wrote {sout} ({args.scaler})")
    schema.save(save_loc)
    print(f"wrote {out} (from {n} samples)")
    return 0


def cmd_convert(args):
    """Legacy gen1 config -> gen2 nested schema (reference: credit convert)."""
    import yaml

    from credit_tpu.config import convert_legacy

    with open(args.config) as f:
        conf = yaml.safe_load(f)
    conv = convert_legacy(conf)
    out = args.out or args.config.replace(".yml", "_gen2.yml")
    with open(out, "w") as f:
        yaml.safe_dump(conv, f, sort_keys=False)
    print(f"wrote {out}")
    return 0


def cmd_metrics(args):
    """Lat-weighted metrics of forecast files vs the dataset truth."""
    import numpy as np

    from credit_tpu.applications.experiment import build_experiment
    from credit_tpu.metrics import LatWeightedMetrics
    from credit_tpu.utils.ncio import open_dataset

    conf = _load(args)
    exp = build_experiment(conf)
    metrics = LatWeightedMetrics(exp["grid"], exp["schema"].target_names)
    rows = []
    for path in args.files:
        ds = open_dataset(path)
        step = int(float(ds.attrs.get("lead_hours", 6))) // int(
            conf.get("data", {}).get("lead_time_periods", 6))
        truth = exp["dataset"].target_at(exp["dataset"].history_len + step)
        flat = np.stack([
            (np.asarray(ds[e.name.rpartition("_L")[0] or e.name].values)
             [:, int(e.name.rpartition("_L")[2])] if "_L" in e.name
             and e.name.rpartition("_L")[2].isdigit()
             else np.asarray(ds[e.name].values))
            for e in exp["schema"].target_entries
        ], axis=-1)
        out = metrics(truth[None].astype(np.float32),
                      flat[None].astype(np.float32))
        rows.append({"file": os.path.basename(path),
                     **{k: float(v) for k, v in out.items()
                        if k in ("rmse", "mae", "acc")}})
    print(json.dumps(rows, indent=1))
    return 0


def cmd_ensemble_eval(args):
    """Offline ensemble verification over a saved rollout tree (reference:
    applications/ensemble_eval.py — spread-error, binned spread-skill,
    zonal + div/rot spectra from netCDF files, no model run)."""
    from credit_tpu.applications.ensemble_eval import run_ensemble_eval

    conf = _load(args)
    run_ensemble_eval(conf, args.root, n_bins=args.bins, out_path=args.out)
    return 0


def cmd_plot(args):
    """Truth-vs-pred map plot, or an animation across forecast files
    (reference: credit plot cli/_plot.py + credit/animation.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from credit_tpu.utils.ncio import open_dataset

    def field(path, var=None):
        ds = open_dataset(path)
        var = var or next(iter(ds.keys()))
        arr = np.asarray(ds[var].values)
        while arr.ndim > 2:
            arr = arr[0]
        return var, arr

    from credit_tpu.visualization import (colormap_extend,
                                          convert_for_display, draw_field,
                                          panel_grid, pick_colormap,
                                          round_range, variable_range)

    files = sorted(args.files)
    if len(files) > 1 or args.animate:
        from matplotlib import animation as manim

        var, first = field(files[0], args.var)
        frames = [convert_for_display(var, field(f, var)[1])[0]
                  for f in files]
        units = convert_for_display(var, first)[1]
        vmin, vmax = round_range(*variable_range(np.stack(frames)))
        fig, ax = plt.subplots(figsize=(8, 4))
        im = ax.imshow(frames[0], aspect="auto", cmap=pick_colormap(var),
                       vmin=vmin, vmax=vmax)
        fig.colorbar(im, ax=ax, extend=colormap_extend(
            (min(f.min() for f in frames), max(f.max() for f in frames)),
            (vmin, vmax)))
        title = ax.set_title("")
        label = f"{var} [{units}]" if units else var

        def update(i):
            im.set_data(frames[i])
            title.set_text(f"{label} — {os.path.basename(files[i])}")
            return [im, title]

        ani = manim.FuncAnimation(fig, update, frames=len(frames))
        out = args.out or (os.path.splitext(files[0])[0] + f"_{var}.gif")
        ani.save(out, writer=manim.PillowWriter(fps=args.fps))
        print(out)
        return 0
    ds = open_dataset(files[0])
    names = ([args.var] if args.var else
             [k for k in ds.keys()][:6])  # panel up to 6 vars (reference
    # visualization_tools.figure_panel_planner)
    rows, cols = panel_grid(len(names))
    fig, axes = plt.subplots(rows, cols, figsize=(6.5 * cols, 3.5 * rows),
                             squeeze=False)
    for i, name in enumerate(names):
        arr = np.asarray(ds[name].values)
        while arr.ndim > 2:
            arr = arr[0]
        ax = axes[i // cols][i % cols]
        im = draw_field(ax, arr, name)
        fig.colorbar(im, ax=ax)
    for j in range(len(names), rows * cols):
        axes[j // cols][j % cols].axis("off")
    var = names[0]
    out = args.out or (os.path.splitext(files[0])[0] + f"_{var}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)
    return 0


def cmd_submit(args):
    """Generate a multi-host TPU launch script (reference: credit submit,
    cli/_submit.py + pbs.py/slurm.py — adapted for TPU pods)."""
    conf = _load(args)
    name = conf.get("save_loc", "credit-tpu-job").strip("./").replace("/", "-") or "credit-tpu"
    if args.scheduler == "pbs":
        script = f"""#!/bin/bash
#PBS -N {name}
#PBS -l select={args.nodes}:ncpus=64
#PBS -l walltime=12:00:00
#PBS -j oe
cd $PBS_O_WORKDIR
# multi-node rendezvous: process 0 of the node list is the coordinator
NODES=($(sort -u $PBS_NODEFILE)); export CREDIT_NUM_PROCESSES=${{#NODES[@]}}
export CREDIT_COORDINATOR=${{NODES[0]}}:29500
export CREDIT_PROCESS_ID=$(grep -n $(hostname) <(printf '%s\\n' "${{NODES[@]}}") | cut -d: -f1 | head -1 | awk '{{print $1-1}}')
python -m credit_tpu.cli train {args.config}
"""
    elif args.scheduler == "gcloud":
        script = f"""#!/bin/bash
# Launch on every worker of a TPU pod slice (GSPMD single-program):
gcloud compute tpus tpu-vm ssh {args.tpu_name or 'TPU_NAME'} \\
  --zone={args.zone or 'ZONE'} --worker=all \\
  --command="cd $(pwd) && CREDIT_DISTRIBUTED=auto python -m credit_tpu.cli train {args.config}"
# CREDIT_DISTRIBUTED=auto -> jax.distributed.initialize() autodetects the pod
"""
    else:
        script = f"""#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --nodes={args.nodes}
#SBATCH --exclusive
export CREDIT_NUM_PROCESSES=$SLURM_NNODES
export CREDIT_COORDINATOR=$(scontrol show hostnames $SLURM_JOB_NODELIST | head -1):29500
srun bash -c 'CREDIT_PROCESS_ID=$SLURM_PROCID python -m credit_tpu.cli train {args.config}'
"""
    out = args.out or f"launch_{name}.sh"
    with open(out, "w") as f:
        f.write(script)
    os.chmod(out, 0o755)
    print(out)
    if getattr(args, "resubmit", 0) > 0:
        # chained restart-based fault tolerance (reference: credit submit
        # --resubmit N, cli/_submit.py:628 _compute_chain — each restart
        # resumes from the checkpoint; scheduler holds restart i until
        # restart i-1 finished)
        n = args.resubmit
        if args.scheduler == "pbs":
            chain = (f"#!/bin/bash\nPREV=$(qsub {out})\necho $PREV\n"
                     f"for i in $(seq {n}); do\n"
                     f"  PREV=$(qsub -W depend=afterok:$PREV {out})\n"
                     f"  echo $PREV\ndone\n")
        elif args.scheduler == "slurm":
            chain = (f"#!/bin/bash\nPREV=$(sbatch --parsable {out})\n"
                     f"echo $PREV\nfor i in $(seq {n}); do\n"
                     f"  PREV=$(sbatch --parsable --dependency=afterok:$PREV {out})\n"
                     f"  echo $PREV\ndone\n")
        else:  # gcloud: no scheduler — sequential reruns resume from ckpt
            chain = (f"#!/bin/bash\nfor i in $(seq 0 {n}); do\n"
                     f"  bash {out}\ndone\n")
        chain_out = os.path.splitext(out)[0] + "_chain.sh"
        with open(chain_out, "w") as f:
            f.write(chain)
        os.chmod(chain_out, 0o755)
        print(chain_out)
    return 0


def cmd_benchmark(args):
    if getattr(args, "halo", False):
        # GSPMD auto-halo vs explicit shard_map halo exchange
        from credit_tpu.applications.benchmark import benchmark_halo

        print(json.dumps(benchmark_halo(steps=args.steps), indent=1))
        return 0
    from credit_tpu.applications.benchmark import benchmark_parallelism

    combos = None
    if args.combos:
        combos = [tuple(int(v) for v in c.split("x")) for c in args.combos.split(",")]
    rows = benchmark_parallelism(_load(args), combos=combos, steps=args.steps)
    print(json.dumps(rows, indent=1))
    return 0


def cmd_rollout_metrics(args):
    """Ensemble rollout verification (reference: rollout_metrics apps)."""
    from credit_tpu.applications.rollout_metrics import run_rollout_metrics

    rows = run_rollout_metrics(_load(args), n_steps=args.steps,
                               n_members=args.members,
                               perturbation=args.perturbation)
    print(json.dumps(rows, indent=1))
    return 0


def cmd_solar(args):
    """Precompute accumulated TOA solar radiation (TSI forcing) files over
    a date range (reference: applications/calc_global_solar.py — MPI
    rank-strided; here --rank/--world stride times the same way, one
    process per submit-generated task)."""
    import numpy as np

    from credit_tpu.data.timeclock import TimeClock
    from credit_tpu.physics.solar import tisr_accumulated
    from credit_tpu.utils.ncio import Dataset, Variable

    lat = np.linspace(90.0, -90.0, args.nlat)
    lon = np.arange(args.nlon) * (360.0 / args.nlon)
    clock = TimeClock(args.start, args.end, args.step, args.calendar,
                      history_len=1, num_forecast_steps=0)
    times = list(clock.all_times)
    os.makedirs(args.out, exist_ok=True)
    import datetime as _dt

    # accumulation period from the SAME parser the clock uses — '30min',
    # '1d' etc. must accumulate over the requested cadence, not 1 hour
    from credit_tpu.data.timeclock import parse_timestep

    period = float(parse_timestep(args.step) / np.timedelta64(1, "s")) / 3600.0
    written = []
    from credit_tpu.data.tisr import _doy_hour

    for i in range(args.rank, len(times), args.world):
        t = times[i]
        doy, hour = _doy_hour(t)
        when = _dt.datetime(2001, 1, 1) + _dt.timedelta(days=doy - 1,
                                                        hours=hour)
        field = np.asarray(tisr_accumulated(lat, lon, when, period,
                                            tsi=args.tsi), np.float32)
        stamp = str(t).replace(" ", "_").replace(":", "")
        path = os.path.join(args.out, f"{args.var}_{stamp}.nc")
        Dataset({args.var: Variable(("time", "lat", "lon"), field[None],
                                    {"units": "J m**-2",
                                     "long_name": "TOA incident solar "
                                                  "radiation (accumulated)"})},
                coords={"time": np.array([float(i)]), "lat": lat,
                        "lon": lon},
                attrs={"calendar": args.calendar}).to_netcdf(path)
        written.append(path)
    print(json.dumps({"files": len(written), "rank": args.rank,
                      "world": args.world}))
    return 0


def cmd_tune(args):
    """Optuna hyperparameter search over `train` (reference: the
    echo/Optuna Objective classes; space from config `optuna.parameters`)."""
    try:
        import optuna
    except ImportError:
        print("optuna is not installed; `pip install optuna` to run "
              "hyperparameter search (the Objective class in "
              "credit_tpu/tuning.py also works with any echo-compatible "
              "driver)", file=sys.stderr)
        return 2
    from credit_tpu.tuning import Objective

    conf = _load(args)
    study = optuna.create_study(
        direction="minimize", study_name=args.study,
        storage=args.storage, load_if_exists=bool(args.storage),
        pruner=optuna.pruners.MedianPruner())
    study.optimize(Objective(conf, metric=args.metric),
                   n_trials=args.trials)
    best = study.best_trial
    print(json.dumps({"best_value": best.value, "params": best.params}))
    return 0


def cmd_summary(args):
    """Model parameter summary (reference: applications/model_summary.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from credit_tpu.applications.experiment import build_experiment

    conf = _load(args)
    exp = build_experiment(conf)
    model, schema = exp["model"], exp["schema"]
    x = jnp.zeros((1, int(conf.get("data", {}).get("history_len", 1)) or 1,
                   conf["model"]["image_height"], conf["model"]["image_width"],
                   schema.n_input), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    rows = []
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(shapes.get("params", shapes))[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        n = int(np.prod(leaf.shape))
        total += n
        rows.append((name, tuple(leaf.shape), n))
    top = conf.get("model", {}).get("type")
    print(f"model: {top}  input channels: {schema.n_input}  "
          f"target channels: {schema.n_target}")
    if args.verbose:
        for name, shape, n in rows:
            print(f"  {name:70s} {str(shape):22s} {n:>12,}")
    by_block = {}
    for name, shape, n in rows:
        by_block[name.split("/")[0]] = by_block.get(name.split("/")[0], 0) + n
    for blk, n in sorted(by_block.items(), key=lambda kv: -kv[1]):
        print(f"  {blk:30s} {n:>14,}  ({100*n/total:.1f}%)")
    print(f"total parameters: {total:,} ({total/1e6:.2f}M)")
    return 0


def cmd_convert_checkpoint(args):
    """Convert a reference PyTorch checkpoint (.pt) into this framework's
    orbax checkpoint (the HF wxformer weights interchange path)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from credit_tpu.applications.experiment import build_experiment
    from credit_tpu.convert_torch import (
        convert_crossformer, convert_fuxi, load_torch_checkpoint)

    conf = _load(args)
    manifest = getattr(args, "dry_run_manifest", None)
    if manifest:
        # validate the HF interchange path without network: exact key/shape
        # layout of the published checkpoint, synthesized values
        from credit_tpu.manifests import (MANIFEST_MODEL_CONF,
                                          synthesize_state_dict)

        conf = dict(conf)
        conf["model"] = dict(MANIFEST_MODEL_CONF[manifest])
        sd = synthesize_state_dict(manifest)
    exp = build_experiment(conf)
    model, schema = exp["model"], exp["schema"]
    x = jnp.zeros((1, int(conf.get("data", {}).get("history_len", 1)) or 1,
                   conf["model"]["image_height"], conf["model"]["image_width"],
                   schema.n_input), jnp.float32)
    if manifest:
        # shapes/structure only — every leaf is overwritten by the converter
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        sd = load_torch_checkpoint(args.torch_checkpoint)
    convert = (convert_fuxi if conf["model"]["type"] == "fuxi"
               else convert_crossformer)
    variables = convert(sd, variables, strict=not args.lenient)
    out = os.path.abspath(args.out or os.path.join(
        conf.get("save_loc", "."), "checkpoint"))
    ckptr = ocp.StandardCheckpointer()
    import numpy as np

    ckptr.save(out, {"params": variables["params"],
                     "spectral": variables["spectral"],
                     "step": np.zeros((), "int32")}, force=True)
    ckptr.wait_until_finished()
    print(out)
    return 0


def cmd_serve(args):
    from credit_tpu.serve import serve

    serve(_load(args), host=args.host, port=args.port)
    return 0


def build_parser():
    p = argparse.ArgumentParser("credit-tpu",
                                description="TPU-native AI-NWP framework")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init", help="write a template config")
    sp.add_argument("config", nargs="?")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("train", help="train a model")
    sp.add_argument("config")
    sp.add_argument("--seed", type=int, default=None)
    sp.add_argument("--profile", action="store_true",
                    help="capture a jax profiler trace of the run")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("rollout", help="autoregressive forecast to netCDF")
    sp.add_argument("config")
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--ema", action="store_true")
    sp.add_argument("--diff-against", default=None,
                    help="reference netCDF file/dir: per-variable allclose "
                         "report, exit 1 on mismatch (HF parity runbook)")
    sp.add_argument("--diff-rtol", type=float, default=2e-4)
    sp.add_argument("--diff-atol", type=float, default=2e-4)
    sp.set_defaults(fn=cmd_rollout)

    sp = sub.add_parser("realtime",
                        help="NWP-initialized realtime forecast to netCDF")
    sp.add_argument("config")
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--fields", default=None,
                    help="npz of decoded NWP fields (lat/lon/pressure + vars)")
    sp.set_defaults(fn=cmd_realtime)

    sp = sub.add_parser("preprocess", help="fit normalization stats")
    sp.add_argument("config")
    sp.add_argument("--samples", type=int, default=32)
    sp.add_argument("--scaler", default=None,
                    choices=["quantile", "standard", "minmax"],
                    help="also fit a bridgescaler-style scaler.npz")
    sp.add_argument("--quantiles", type=int, default=101)
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("convert", help="convert legacy gen1 config to gen2")
    sp.add_argument("config")
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("metrics", help="score forecast files")
    sp.add_argument("config")
    sp.add_argument("files", nargs="+")
    sp.set_defaults(fn=cmd_metrics)

    sp = sub.add_parser("plot", help="plot a forecast field (or animate many)")
    sp.add_argument("files", nargs="+")
    sp.add_argument("--var", default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--animate", action="store_true")
    sp.add_argument("--fps", type=int, default=4)
    sp.set_defaults(fn=cmd_plot)

    sp = sub.add_parser("submit", help="generate TPU pod launch script")
    sp.add_argument("config")
    sp.add_argument("--scheduler", choices=["gcloud", "slurm", "pbs"], default="gcloud")
    sp.add_argument("--nodes", type=int, default=1)
    sp.add_argument("--tpu-name", default=None)
    sp.add_argument("--zone", default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--resubmit", type=int, default=0,
                    help="also write a chain script submitting N dependent "
                         "restarts (afterok) that resume from checkpoint")
    sp.set_defaults(fn=cmd_submit)

    sp = sub.add_parser("ensemble-eval",
                        help="offline ensemble verification of saved rollouts")
    sp.add_argument("config")
    sp.add_argument("root", help="rollout output tree (init dirs + _eNN members)")
    sp.add_argument("--bins", type=int, default=6)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_ensemble_eval)

    sp = sub.add_parser("rollout-metrics",
                        help="noisy-IC ensemble rollout + verification metrics")
    sp.add_argument("config")
    sp.add_argument("--steps", type=int, default=None)
    sp.add_argument("--members", type=int, default=None)
    sp.add_argument("--perturbation",
                    choices=["gaussian", "spherical", "bred", "model"],
                    default=None)
    sp.set_defaults(fn=cmd_rollout_metrics)

    sp = sub.add_parser("summary", help="model parameter summary")
    sp.add_argument("config")
    sp.add_argument("-v", "--verbose", action="store_true")
    sp.set_defaults(fn=cmd_summary)

    sp = sub.add_parser("tune", help="optuna hyperparameter search "
                        "(space: config optuna.parameters)")
    sp.add_argument("config")
    sp.add_argument("--trials", type=int, default=10)
    sp.add_argument("--metric", default="val_loss")
    sp.add_argument("--study", default="credit-tpu")
    sp.add_argument("--storage", default=None,
                    help="optuna storage URL (sqlite:///study.db) for "
                    "resumable/parallel sweeps")
    sp.set_defaults(fn=cmd_tune)

    sp = sub.add_parser("convert-checkpoint",
                        help="torch .pt checkpoint -> orbax checkpoint")
    sp.add_argument("config")
    sp.add_argument("torch_checkpoint", nargs="?", default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--lenient", action="store_true")
    sp.add_argument("--dry-run-manifest", default=None,
                    help="validate against a vendored HF key/shape manifest "
                         "(wxformer_6h | fuxi_6h) instead of a .pt file")
    sp.set_defaults(fn=cmd_convert_checkpoint)

    sp = sub.add_parser("benchmark", help="parallelism micro-benchmark")
    sp.add_argument("config", nargs="?", default=None)
    sp.add_argument("--steps", type=int, default=5)
    sp.add_argument("--combos", default=None,
                    help="comma list of dpxtpxdomain, e.g. 1x1x1,2x1x2")
    sp.add_argument("--halo", action="store_true",
                    help="GSPMD auto-halo vs explicit halo-exchange bench")
    sp.set_defaults(fn=cmd_benchmark)

    sp = sub.add_parser("solar", help="precompute TSI solar-forcing files")
    sp.add_argument("--start", default="2000-01-01")
    sp.add_argument("--end", default="2000-01-02")
    sp.add_argument("--step", default="6h")
    sp.add_argument("--calendar", default="standard")
    sp.add_argument("--nlat", type=int, default=181)
    sp.add_argument("--nlon", type=int, default=360)
    sp.add_argument("--tsi", type=float, default=1361.0)
    sp.add_argument("--var", default="tsi")
    sp.add_argument("--out", default="./solar")
    sp.add_argument("--rank", type=int, default=0)
    sp.add_argument("--world", type=int, default=1)
    sp.set_defaults(fn=cmd_solar)

    sp = sub.add_parser("serve", help="HTTP forecast server")
    sp.add_argument("config")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8000)
    sp.set_defaults(fn=cmd_serve)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
