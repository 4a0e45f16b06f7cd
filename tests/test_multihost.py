"""Multi-host (DCN) data parallelism: 2 coordinated processes, one mesh.

Spawns 2 fresh python processes (no sitecustomize, so the env vars work)
that each own 2 CPU devices, rendezvous through jax.distributed.initialize,
and verify cross-process pmean gradients against the single-process oracle
(tests/helpers/dcn_worker.py). This is the TPU-pod DCN story scaled down:
the same code path (global mesh + shard_map + collectives over the
coordination service) is what jax.distributed.initialize() gives on real
multi-host TPU slices.
"""

import os
import socket
import subprocess
import sys

HELPER = os.path.join(os.path.dirname(__file__), "helpers", "dcn_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_grads_match_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, HELPER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-4000:]}"
        assert "DCN_OK" in out, out
