"""Poll the axon TPU tunnel until it answers; log transitions.

Each probe is a subprocess (a dead tunnel hangs jax.devices() forever — the
parent kills by exact PID), spaced --interval seconds apart. Exits 0 the
first time the backend answers. Used to detect tunnel recovery without
risking the one-process trap (the probe holds the cooperative lock only
while its child runs).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROBE_SRC = (
    "import jax, sys; d = jax.devices(); "
    "print(f'TPU_OK {len(d)}x {d[0].platform} {d[0].device_kind}', flush=True)"
)


def probe_once(timeout: float) -> tuple[bool, str]:
    proc = subprocess.Popen([sys.executable, "-c", PROBE_SRC],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    try:
        out, _ = proc.communicate(timeout=timeout)
        return proc.returncode == 0 and "TPU_OK" in out, out.strip()
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        return False, f"timeout after {timeout:.0f}s"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--probe-timeout", type=float, default=90.0)
    ap.add_argument("--max-minutes", type=float, default=600.0)
    args = ap.parse_args(argv)

    from cardiax.utils.tpulock import tpu_lock

    deadline = time.monotonic() + args.max_minutes * 60
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        try:
            with tpu_lock("tpu-probe", timeout=30):
                ok, msg = probe_once(args.probe_timeout)
        except TimeoutError as e:
            ok, msg = False, f"lock busy: {e}"
        stamp = time.strftime("%H:%M:%S")
        print(f"[{stamp}] probe {attempt}: {'UP' if ok else 'down'} — {msg}",
              flush=True)
        if ok:
            return 0
        time.sleep(args.interval)
    print("giving up: tunnel never answered", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
