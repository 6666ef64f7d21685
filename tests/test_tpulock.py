"""Cooperative TPU lock: acquire/release, live-holder blocking, stale steal."""

import json
import os

import pytest


@pytest.fixture()
def lockmod(tmp_path, monkeypatch):
    import cardiax.utils.tpulock as tl
    monkeypatch.setattr(tl, "LOCK_PATH", tmp_path / "tpu.lock")
    return tl


def test_acquire_release_roundtrip(lockmod):
    assert lockmod.holder() is None
    assert lockmod.acquire("t1", timeout=0)
    h = lockmod.holder()
    assert h["pid"] == os.getpid() and h["tag"] == "t1"
    lockmod.release()
    assert lockmod.holder() is None


def test_reentrant_for_same_pid(lockmod):
    assert lockmod.acquire("a", timeout=0)
    assert lockmod.acquire("b", timeout=0)   # same pid may retag
    assert lockmod.holder()["tag"] == "b"
    lockmod.release()


def test_stale_lock_is_stolen(lockmod):
    # a dead pid's lock counts as free (1 is init: alive but not ours — use
    # an impossible pid instead)
    lockmod.LOCK_PATH.write_text(json.dumps({"pid": 2 ** 22 + 12345,
                                             "tag": "ghost", "ts": 0}))
    assert lockmod.holder() is None
    assert lockmod.acquire("new", timeout=0)
    assert lockmod.holder()["pid"] == os.getpid()
    lockmod.release()


def test_live_holder_blocks_and_times_out(lockmod):
    lockmod.LOCK_PATH.write_text(json.dumps({"pid": 1, "tag": "init",
                                             "ts": 0}))   # pid 1 is alive
    assert lockmod.holder() is not None
    assert not lockmod.acquire("me", timeout=0.1, poll=0.05)
    with pytest.raises(TimeoutError, match="TPU lock held"):
        with lockmod.tpu_lock("me", timeout=0.1):
            pass


def test_release_only_own_lock(lockmod):
    lockmod.LOCK_PATH.write_text(json.dumps({"pid": 1, "tag": "init",
                                             "ts": 0}))
    lockmod.release()          # not ours -> untouched
    assert lockmod.holder()["pid"] == 1


def test_corrupt_lockfile_counts_as_free(lockmod):
    lockmod.LOCK_PATH.write_text("{not json")
    assert lockmod.holder() is None
    assert lockmod.acquire("x", timeout=0)
    lockmod.release()
