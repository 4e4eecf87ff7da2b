"""Multi-host bootstrap: two jax.distributed CPU processes run one sharded
Trainer.fit window with per-host data sharding (reference
distributed/utils.py:210-345 distributed_init + per-rank batches)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_sharded_fit():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_worker.py")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            OFASYS_COORDINATOR=f"127.0.0.1:{port}",
            OFASYS_NUM_PROCESSES="2",
            OFASYS_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, f"rank {pid} missing marker:\n{out[-3000:]}"
    # both ranks observe the same (globally reduced) loss
    losses = [o.split("loss=")[1].split()[0] for o in outs]
    assert losses[0] == losses[1], losses
