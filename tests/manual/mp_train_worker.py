"""Worker for the 2-process CPU parity test (tests/test_multiprocess.py).

Run as:  python mp_train_worker.py <process_id> <num_processes> <port> <outdir>
with num_processes=1 meaning single-process baseline (no jax.distributed).
Trains 1 epoch of the debugger model under a dp=2 mesh and writes the final
train loss to <outdir>/loss_<pid>.txt plus the batch init-time indices each
process consumed to <outdir>/batches_<pid>.txt (disjointness evidence).
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    replay = len(sys.argv) > 5 and sys.argv[5] == "replay"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        os.environ["CREDIT_COORDINATOR"] = f"127.0.0.1:{port}"
        os.environ["CREDIT_NUM_PROCESSES"] = str(nproc)
        os.environ["CREDIT_PROCESS_ID"] = str(pid)
        from credit_tpu.parallel.distributed import maybe_initialize

        assert maybe_initialize({})
        assert jax.process_count() == nproc, jax.process_count()

    from credit_tpu.data.channels import ChannelSchema
    from credit_tpu.data.synthetic import SyntheticDataset
    from credit_tpu.grid import Grid
    from credit_tpu.losses import WeightedLoss
    from credit_tpu.models import load_model
    from credit_tpu.trainers.trainer import Trainer

    H, W, NLEV = 8, 16, 3
    conf = {
        "save_loc": os.path.join(outdir, "ckpt"),
        "data": {
            "source": {"ERA5": {
                "levels": [1.0, 2.0, 3.0],
                "variables": {"prognostic": {"vars_3D": ["T"], "vars_2D": ["SP"]}},
            }},
            "history_len": 1, "forecast_len": 1,
        },
        "trainer": {
            "type": "era5-v2", "learning_rate": 1e-3,
            "train_batch_size": 4, "valid_batch_size": 2,
            "batches_per_epoch": 2, "valid_batches_per_epoch": 1,
            "num_epoch": 1, "preflight": False,
            "metrics_fetch_every": 0, "log_variable_metrics": False,
            "parallelism": {"data": 2, "tensor": 1, "domain": 1},
        },
        "model": {"type": "debugger", "image_height": H, "image_width": W,
                  "levels": NLEV, "channels": 1, "surface_channels": 1,
                  "input_only_channels": 0, "output_only_channels": 0,
                  "frames": 1, "output_frames": 1},
        "loss": {"training_loss": "mse"},
    }
    schema = ChannelSchema.from_config(conf)
    grid = Grid.regular(H, W, levels=[1.0, 2.0, 3.0])
    dataset = SyntheticDataset(schema, grid, history_len=1, n_times=30, seed=3)
    model = load_model(conf)
    loss = WeightedLoss.from_config(conf, grid)

    # record which init times this process consumes (disjointness check)
    from credit_tpu.data.sampler import MultiStepSampler
    from credit_tpu.parallel.mesh import build_mesh, local_dp_rows

    mesh = build_mesh(2, 1, 1)
    rows = local_dp_rows(mesh) if nproc > 1 else (0, 1)
    consumed = []
    for r in rows:
        s = MultiStepSampler(30, 2, 1, 1, dp_rank=r, dp_size=2, seed=0,
                             batches_per_epoch=2)
        s.set_epoch(0)
        for b in s:
            consumed.extend(int(i) for i in b)
    with open(os.path.join(outdir, f"batches_{pid}.txt"), "w") as f:
        json.dump(consumed, f)

    if replay:
        # multi-process replay: pure dp — every process stores its OWN dp
        # rows' predicted states (whole samples) in its local buffer
        conf["trainer"]["replay"] = {"capacity": 16, "probability": 0.5}
    trainer = Trainer(conf, model, loss, loss, schema, dataset,
                      save_loc=conf["save_loc"])
    trainer.fit(seed=0)
    if replay:
        with open(os.path.join(outdir, f"replay_{pid}.txt"), "w") as f:
            f.write(str(len(trainer.replay)))
    import csv

    if jax.process_index() == 0:
        with open(os.path.join(conf["save_loc"], "training_log.csv")) as f:
            row = list(csv.DictReader(f))[-1]
        with open(os.path.join(outdir, f"loss_{pid}.txt"), "w") as f:
            f.write(f"{row['train_loss']} {row['valid_loss']}")


if __name__ == "__main__":
    main()
