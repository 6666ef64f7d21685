"""Checkpoint/resume: exact state restore (SURVEY.md section 5.4 build goal)."""

import jax.numpy as jnp
import numpy as np

from cardiax.io.checkpoints import CheckpointManager


def test_save_restore_roundtrip(tmp_path):
    params = {"LMA": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}}
    opt = {"LMA": {"mu": jnp.zeros((2, 3)), "count": jnp.asarray(7)}}
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    assert mgr.latest_epoch() is None
    mgr.save(0, params, opt, extra={"epoch": 0, "best_val": 1.5}, force=True)
    mgr.save(1, params, opt, extra={"epoch": 1, "best_val": 0.5}, force=True)
    mgr.wait()
    assert mgr.latest_epoch() == 1
    state = mgr.restore(template={"params": params, "opt_states": opt,
                                  "extra": {"epoch": 0, "best_val": 0.0}})
    np.testing.assert_array_equal(np.asarray(state["params"]["LMA"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert state["extra"]["epoch"] == 1
    assert state["extra"]["best_val"] == 0.5
    mgr.close()


def test_retention_policy(tmp_path):
    params = {"m": jnp.ones(2)}
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    for e in range(5):
        mgr.save(e, params, {}, extra={"epoch": e}, force=True)
    mgr.wait()
    assert mgr.latest_epoch() == 4
    # only 2 kept
    kept = sorted(int(p.name) for p in (tmp_path / "ck").iterdir()
                  if p.name.isdigit())
    assert len(kept) <= 2
    mgr.close()
