"""Multi-host (2-process) fake-cluster test.

Covers the reference's multi-node surface (NCCL DDP + DistributedSampler,
stylegan2/train_ffhq.py:500-585) the TPU-native way: two OS processes each
owning 4 virtual CPU devices join one jax.distributed coordination service
and run the sharded train chunk over the global 8-device mesh, with
cross-process Gloo collectives standing in for ICI/DCN. The reference
itself could not test this without a GPU cluster (SURVEY.md §4).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_trains_identically(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)  # drop the axon TPU site hook
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             str(port), str(i), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert (tmp_path / f"ok_{i}").is_file(), out[-3000:]
    sums = [
        (tmp_path / f"params_{i}.txt").read_text().strip() for i in range(2)
    ]
    # pmean'd grads + identical key streams => both hosts hold the exact
    # same replicated parameters after training
    assert sums[0] == sums[1], sums
