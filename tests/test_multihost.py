"""Multi-process SPMD: two real processes form one 4-device global mesh via
``init_multihost`` and train a step on process-local batch shards.

This is the DCN-level analogue of the virtual-mesh tests: jax.distributed
wires two CPU processes exactly as it would wire two TPU hosts, and
``shard_batch_pytree`` assembles global arrays from per-process shards
through ``jax.make_array_from_process_local_data``.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_processes(model: str):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), model],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS")]
        assert lines, f"no loss line in:\n{out}"
        losses.append([float(x) for x in lines[0].split()[1:]])
    # SPMD: every process computes the same global losses
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert all(v == v for v in losses[0])  # not NaN


@pytest.mark.slow
def test_two_process_training_step():
    _run_two_processes("shapenet")


@pytest.mark.slow
def test_two_process_gan_step():
    """G+D steps across two processes: BatchNorm means are global over DCN
    (the reference's 740-LoC sync_batchnorm, as one mesh annotation)."""
    _run_two_processes("gan")
