"""Real multi-process jax.distributed coverage (VERDICT r3 #4).

Spawns 2 subprocesses (localhost coordinator, 4 virtual CPU devices each) that
call ``initialize_distributed`` — executing the ``jax.distributed.initialize``
branch of cardiax/parallel/distributed.py for real — assemble a global batch
from per-host shards with ``shard_global_batch``, and run one flagship train
step over the global 8-device mesh. Asserts both processes agree and the loss
matches the single-process 1-device run (the reference has no distribution
story at all; SURVEY.md §2.13/§5.8).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(os.environ)
    # the workers set their own XLA_FLAGS device count (4 each)
    env.pop("XLA_FLAGS", None)
    env["CARDIAX_NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    worker = str(REPO / "tests" / "mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), "2", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        results.append(json.loads(out.strip().splitlines()[-1]))

    results.sort(key=lambda r: r["process"])
    assert [r["process"] for r in results] == [0, 1]
    for r in results:
        assert r["process_count"] == 2
        assert r["devices"] == 8  # 2 processes x 4 local devices, one mesh
    # both processes computed the SAME global step
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["param_leaf0_sum"] == pytest.approx(
        results[1]["param_leaf0_sum"], rel=1e-5)

    # the 2-process global loss must match a plain single-process run of the
    # same step on the same (seeded) synthetic batch
    import __graft_entry__ as ge
    import jax
    from cardiax.parallel.mesh import get_mesh

    cfg = ge._flagship_config(batch=8)
    host_batch = ge._synthetic_batch(batch=8)
    mesh1 = get_mesh((1,), ("data",), devices=jax.devices("cpu")[:1])
    losses, _ = ge._run_step_on_mesh(mesh1, host_batch, cfg, n_steps=1)
    assert results[0]["loss"] == pytest.approx(losses[0], rel=1e-4)
