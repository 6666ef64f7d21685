"""Cooperative single-process TPU lock.

The axon tunnel does NOT queue a second client: a newcomer can steal the chip
and freeze the first process forever mid-step (observed round 3: a 400-epoch
run orphaned by a quick CLI drive; the round-3 driver bench then failed on the
dead tunnel). Every tool in this repo that touches the TPU takes this lock
first, so two cooperative processes can never collide; stale locks (dead pid)
are stolen automatically.

Not a kernel-enforced lock — an uncooperative process can still grab the chip
— but all in-repo entry points (bench.py, tools/*, cardiax.main via the
``CARDIAX_TPU_LOCK=1`` env opt-in) go through it.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

LOCK_PATH = Path(os.environ.get("CARDIAX_TPU_LOCK_PATH", "/tmp/cardiax_tpu.lock"))


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def holder() -> dict | None:
    """Return {'pid': int, 'tag': str, 'ts': float} of a LIVE holder, else None
    (missing, unreadable, or stale locks count as free)."""
    try:
        info = json.loads(LOCK_PATH.read_text())
        pid = int(info["pid"])
    except (OSError, ValueError, KeyError, TypeError):
        return None
    return info if _pid_alive(pid) else None


def acquire(tag: str = "", timeout: float = 0.0, poll: float = 2.0) -> bool:
    """Try to take the lock for the current process.

    Waits up to ``timeout`` seconds for a live holder to release; returns True
    on success, False on timeout. Stale locks (holder pid dead) are stolen.
    """
    deadline = time.monotonic() + timeout
    while True:
        h = holder()
        if h is None or h.get("pid") == os.getpid():
            tmp = LOCK_PATH.with_suffix(f".{os.getpid()}.tmp")
            tmp.write_text(json.dumps(
                {"pid": os.getpid(), "tag": tag, "ts": time.time()}))
            os.replace(tmp, LOCK_PATH)  # atomic on POSIX
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(poll)


def release() -> None:
    """Release only if held by this process (safe to call unconditionally)."""
    try:
        info = json.loads(LOCK_PATH.read_text())
        if int(info.get("pid", -1)) == os.getpid():
            LOCK_PATH.unlink()
    except (OSError, ValueError, TypeError):
        pass


class tpu_lock:
    """Context manager: ``with tpu_lock('bench', timeout=600): ...``

    Raises TimeoutError if a live holder doesn't release in time — callers can
    turn that into a structured error instead of hanging on a stolen tunnel.
    """

    def __init__(self, tag: str = "", timeout: float = 600.0):
        self.tag, self.timeout = tag, timeout

    def __enter__(self):
        if not acquire(self.tag, timeout=self.timeout):
            h = holder()
            raise TimeoutError(
                f"TPU lock held by pid {h and h.get('pid')} "
                f"(tag={h and h.get('tag')!r}) after {self.timeout:.0f}s")
        return self

    def __exit__(self, *exc):
        release()
        return False
