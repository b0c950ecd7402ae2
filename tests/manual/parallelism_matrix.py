"""Parallelism smoke matrix: fresh + resume per (dp, tp, domain) combo with
loss-trajectory parity gates (the reference's tests/manual/gen2_parallelism
design, adapted to the mesh runtime).

Usage:  python tests/manual/parallelism_matrix.py <config.yml> [--epochs 2]
Runs on whatever devices are visible (real pod or
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a dry run).
"""

from __future__ import annotations

import argparse
import copy
import json
import sys


def run_combo(conf, dp, tp, dom, save_loc, resume=False):
    import jax

    from credit_tpu.applications.experiment import build_experiment
    from credit_tpu.trainers.trainer import load_trainer

    conf = copy.deepcopy(conf)
    conf["save_loc"] = save_loc
    conf.setdefault("trainer", {})["parallelism"] = {
        "data": dp, "tensor": tp, "domain": dom}
    conf["trainer"]["load_weights"] = resume
    exp = build_experiment(conf)
    cls = load_trainer(conf)
    trainer = cls(conf, exp["model"], exp["loss"], exp["valid_loss"],
                  exp["schema"], exp["dataset"], exp["valid_dataset"],
                  save_loc=save_loc, normalizer=exp["normalizer"])
    state = None
    if resume:
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = trainer.load_checkpoint(state)
    trainer.fit(state, seed=int(conf.get("seed", 0)))
    import csv

    with open(f"{save_loc}/training_log.csv") as f:
        return [float(r["train_loss"]) for r in csv.DictReader(f)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/parallelism_matrix")
    args = ap.parse_args()

    import jax

    from credit_tpu.config import load_config

    conf = load_config(args.config)
    conf.setdefault("trainer", {})["num_epoch"] = args.epochs
    conf["trainer"]["batches_per_epoch"] = min(
        int(conf["trainer"].get("batches_per_epoch", 4)), 4)

    n = len(jax.devices())
    combos = [(1, 1, 1)]
    if n >= 2:
        combos += [(2, 1, 1), (1, 1, 2)]
    if n >= 4:
        combos += [(2, 1, 2), (2, 2, 1)]
    if n >= 8:
        combos += [(2, 2, 2)]

    results = {}
    for dp, tp, dom in combos:
        tag = f"{dp}x{tp}x{dom}"
        loc = f"{args.out}/{tag}"
        fresh = run_combo(conf, dp, tp, dom, loc, resume=False)
        resumed = run_combo(conf, dp, tp, dom, loc, resume=True)
        results[tag] = {"fresh": fresh, "resumed": resumed}
        print(f"{tag}: fresh={fresh} resumed={resumed}", flush=True)

    base = results["1x1x1"]["fresh"][0]
    failures = []
    for tag, r in results.items():
        rel = abs(r["fresh"][0] - base) / max(abs(base), 1e-9)
        if rel > 1e-3:
            failures.append(f"{tag}: epoch-0 loss {r['fresh'][0]} vs baseline "
                            f"{base} (rel {rel:.2e})")
        if not r["resumed"]:
            failures.append(f"{tag}: resume produced no epochs")
    print(json.dumps(results, indent=1))
    if failures:
        print("PARITY FAILURES:\n  " + "\n  ".join(failures))
        sys.exit(1)
    print("parity gates passed")


if __name__ == "__main__":
    main()
