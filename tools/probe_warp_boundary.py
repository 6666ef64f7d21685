"""Probe the MULTI-CHANNEL full-frame banded warp's Mosaic compile boundary.

Round-4 finding (exp_results/round4/scan_boundary.log): the multi-channel
kernel (`bilinear_warp_banded_multi`, c=2, r=2, full-frame path) crashes the
Mosaic compile at 384x384 (147,456 px) while 512x256 (131,072 px) compiles —
but it shares `_MAX_FULL_WARP_PIXELS = 512*384` (196,608) with the
single-channel kernel, whose boundary was the one actually probed in round 3.
The multi kernel keeps ~c more live planes, so its real cap is lower and must
be probed per channel count (CLAUDE.md: never trust a VMEM cap that hasn't
compiled — probe fwd+BWD at the boundary).

This tool bypasses the shipped cap (temporarily raising the module global so
the kernel path engages) and compiles fwd + full bwd (d/d field AND d/d disp,
the in-scan worst case: img_const=False) at a shape x channel ladder.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_warp_boundary.py \
        [--shapes 512x256 520x256 544x256 568x256 384x384] [--channels 2 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def probe(h: int, w: int, c: int, radius: int, img_const: bool) -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cardiax.ops import warp_pallas

    tag = (f"{h}x{w} c={c} r={radius}"
           + (" img_const" if img_const else ""))
    print(f"--- multi warp {tag}", flush=True)
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(size=(2, c, h, w)).astype(np.float32))
    disp = jnp.asarray(
        rng.normal(size=(2, 2, h, w)).astype(np.float32)) * 0.5

    saved = warp_pallas._MAX_FULL_WARP_PIXELS
    warp_pallas._MAX_FULL_WARP_PIXELS = max(saved, h * w)
    try:
        def loss(f, d):
            out = warp_pallas.bilinear_warp_banded_multi(
                f, d, radius=radius, img_const=img_const)
            return jnp.sum(out * out)

        t0 = time.perf_counter()
        argnums = (1,) if img_const else (0, 1)
        val, g = jax.jit(jax.value_and_grad(loss, argnums=argnums))(field, disp)
        gsum = sum(float(jnp.sum(jnp.abs(x))) for x in g)
        # float() is the only reliable sync on the tunneled axon platform
        print(f"ok: loss={float(val):.4f} |g|={gsum:.4f}"
              f" compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        return True
    except Exception as e:  # compile crashes arrive as generic runtime errors
        print(f"FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False
    finally:
        warp_pallas._MAX_FULL_WARP_PIXELS = saved


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+",
                    default=["512x256", "520x256", "544x256", "568x256",
                             "384x384"])
    ap.add_argument("--channels", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--radius", type=int, default=2)
    ap.add_argument("--img-const", action="store_true")
    args = ap.parse_args(argv)
    results = {}
    for c in args.channels:
        for s in args.shapes:
            h, w = (int(x) for x in s.split("x"))
            results[f"{s}/c{c}"] = probe(h, w, c, args.radius, args.img_const)
    print({k: ("ok" if v else "fail") for k, v in results.items()})


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("probe_warp_boundary"):
        main()
