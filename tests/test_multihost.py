"""True multi-process smoke tests of the distributed training path.

Spawns 2 CPU processes (4 virtual devices each), joins them via
``jax.distributed.initialize`` through ``parallel/mesh.py``'s real
multi-host branch, runs DistributedTrainer chunks over the global
8-device mesh, and asserts:

* both processes complete with identical replicated learner params — the
  pmean gradient sync crossed the process boundary correctly;
* a mid-run save/resume from process-local checkpoint shards is bitwise
  identical to the unbroken run (the multi-host resume path).

Parameterized over BOTH production engines (VERDICT-r4 item 6): the jnp
shard_map tick and the Pallas ring engine (interpret-mode on CPU) — the
single-process suite (tests/test_distributed.py) can't reach this code
path; everything there runs over 8 virtual devices in one process.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["jnp", "ring"])
def test_two_process_training_chunk(tmp_path, engine):
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path),
             engine],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"

    results = []
    for i in range(2):
        with open(tmp_path / f"result_{engine}_{i}.json") as f:
            results.append(json.load(f))
    # Replicated learner state must be identical on both hosts.
    assert results[0]["params_hash"] == results[1]["params_hash"]
    assert results[0]["epsilon"] == results[1]["epsilon"]
    assert results[0]["step"] == results[1]["step"]
    assert all(r["rewards_finite"] for r in results)
    assert results[0]["epsilon"] < 1.0  # training actually advanced
    # Resuming from process-local checkpoint shards reproduced the
    # unbroken run bit-for-bit on every process.
    assert all(r["resume_bitwise"] for r in results)
