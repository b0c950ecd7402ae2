"""2-process CPU parity test for the multi-host execution path.

VERDICT round-1 item 1 'done' criterion: two `jax.distributed` processes on
localhost train with loss identical to a single-process run of the same
config, each process feeding only its dp rows (disjoint init times), and
orbax checkpointing succeeding collectively.

Reference contract: credit/distributed.py:32-233 (bootstrap),
credit/parallel/mesh.py:115-160 (per-host dp coords),
credit/parallel/fsdp2.py:205-286 (sharded-state checkpointing)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "manual", "mp_train_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_local_devices: int):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # no TPU tunnel in subprocesses
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    env["PYTHONPATH"] = REPO
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    # single-process baseline: 2 local devices, dp=2
    base = tmp_path / "single"
    base.mkdir()
    r = subprocess.run([sys.executable, WORKER, "0", "1", "0", str(base)],
                       env=_env(2), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    # two processes, 1 device each, same seed/config
    mp = tmp_path / "multi"
    mp.mkdir()
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(mp)],
        env=_env(1), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    l_single = np.loadtxt(base / "loss_0.txt")
    l_multi = np.loadtxt(mp / "loss_0.txt")
    np.testing.assert_allclose(l_multi, l_single, rtol=1e-5)

    # per-host batch disjointness: the two processes consumed disjoint
    # init-time sets whose union equals the single-process set
    b0 = set(json.load(open(mp / "batches_0.txt")))
    b1 = set(json.load(open(mp / "batches_1.txt")))
    ball = set(json.load(open(base / "batches_0.txt")))
    assert b0.isdisjoint(b1)
    assert (b0 | b1) == ball

    # collective orbax checkpoint restored fine implies save worked; assert
    # the checkpoint dir exists with committed metadata
    assert (mp / "ckpt" / "checkpoint").exists()


@pytest.mark.slow
def test_two_process_replay_training(tmp_path):
    """Replay training under 2 processes (pure dp): each process stores its
    own dp rows' predicted states locally — the fit completes, both buffers
    fill, and the loss is finite (round-2 advisor limitation lifted for the
    tensor=domain=1 case)."""
    mp = tmp_path / "replay"
    mp.mkdir()
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(mp), "replay"],
        env=_env(1), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    n0 = int((mp / "replay_0.txt").read_text())
    n1 = int((mp / "replay_1.txt").read_text())
    assert n0 > 0 and n1 > 0, (n0, n1)
    loss = np.loadtxt(mp / "loss_0.txt")
    assert np.isfinite(loss).all()
