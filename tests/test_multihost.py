"""Multi-host (DCN) rehearsal: 2 real processes over jax.distributed.

End-to-end rehearsal of the documented pod-slice deployment recipe
(elektronn3_tpu/parallel/distributed.py): two OS processes, each with 4
virtual CPU devices, initialize jax.distributed against a shared
coordinator, build the 8-device global mesh, feed host-local batch
shards and run jitted dp-sharded train steps. Both processes must see
identical losses and end with identical parameters — proof that the
gradient all-reduce crossed the process (DCN-analog) boundary.

The reference has no multi-node support at all (SURVEY.md §2.2); this
is the TPU-native capability that replaces it.
"""

import os
import socket
import subprocess
import sys

import pytest



pytestmark = pytest.mark.slow  # multi-minute on the 1-core CI host

def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(900)
def test_two_process_distributed_training():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    flags = env.get("XLA_FLAGS", "")
    if "xla_backend_optimization_level" not in flags:
        flags += " --xla_backend_optimization_level=0"
    env["XLA_FLAGS"] = flags.strip()

    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)], env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=800)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, losses, checksum = line.split()
                results[pid] = (losses, checksum)
    assert set(results) == {"0", "1"}, results
    # Same losses and same final params on both hosts.
    assert results["0"] == results["1"], results
