"""Probe the fused EPDiff scan's Mosaic compile boundary on real hardware.

The fused step kernel keeps ~10 live (h, w) f32 planes; Mosaic's scoped-VMEM
stack accounting (~4x a naive live-array estimate, CLAUDE.md) makes the safe
plane size hardware-empirical. Round-3 measurements on v5e (recorded in
STATUS.md and pinned by tests/test_kernel_selection.py):

    256 x 256  compiles + runs fwd+bwd  -> _MAX_FUSED_SCAN_PIXELS = 256*256
    512 x 256  Mosaic compile crash (scoped-VMEM stack)
    512 x 512  Mosaic compile crash

Re-run after kernel changes or on new TPU generations; if a larger plane
passes, raise `cardiax.ops.epdiff_pallas._MAX_FUSED_SCAN_PIXELS` and the
pinned shapes in tests/test_kernel_selection.py together.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_scan_boundary.py \
        [--shapes 256x256 512x256 512x512]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def probe(h: int, w: int, force_fused: bool = False) -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cardiax.ops import epdiff_pallas, shooting
    from cardiax.ops.shooting import expmap_shooting, scan_plan

    saved_cap = epdiff_pallas._MAX_FUSED_SCAN_PIXELS
    saved_force = shooting._FORCE_FUSED
    if force_fused:
        # Probe the FUSED kernel itself above the shipped cap (otherwise
        # expmap_shooting silently falls back to the composite scan and the
        # probe measures the wrong path).
        epdiff_pallas._MAX_FUSED_SCAN_PIXELS = max(saved_cap, h * w)
        shooting._FORCE_FUSED = True
    try:
        print(f"--- scan grid {h}x{w}: plan={scan_plan(h, w, 8)}"
              + (" (forced fused)" if force_fused else ""), flush=True)
        rng = np.random.default_rng(0)
        m0 = jnp.asarray(
            rng.normal(size=(2, 2, h, w)).astype(np.float32)) * 0.01

        def loss(m):
            u, v0 = expmap_shooting(m, n_steps=5, warp_radius=8)
            return jnp.sum(u * u) + jnp.sum(v0 * v0)

        t0 = time.perf_counter()
        val, g = jax.jit(jax.value_and_grad(loss))(m0)
        # float() is the only reliable sync on the tunneled axon platform
        print(f"ok: loss={float(val):.4f} |g|={float(jnp.sum(jnp.abs(g))):.4f}"
              f" compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        return True
    except Exception as e:  # compile crashes arrive as generic runtime errors
        print(f"FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False
    finally:
        epdiff_pallas._MAX_FUSED_SCAN_PIXELS = saved_cap
        shooting._FORCE_FUSED = saved_force


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+",
                    default=["256x256", "512x256", "512x512"])
    ap.add_argument("--force-fused", action="store_true",
                    help="probe the fused kernel itself above the shipped cap")
    args = ap.parse_args(argv)
    results = {}
    for s in args.shapes:
        h, w = (int(x) for x in s.split("x"))
        results[s] = probe(h, w, force_fused=args.force_fused)
    print({k: ("ok" if v else "fail") for k, v in results.items()})


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("probe_scan_boundary"):
        main()
