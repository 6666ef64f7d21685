"""Build the native data-engine shared library with the system compiler."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

SRC = Path(__file__).parent / "augment.cpp"
OUT = Path(__file__).parent / "libcardiax_native.so"


def build(force: bool = False) -> Path | None:
    if OUT.exists() and not force and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    cxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if cxx is None:
        return None
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(OUT), str(SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return OUT


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}" if path else "build FAILED (no compiler?)")
