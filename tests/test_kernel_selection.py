"""Pin which kernel engages at which shape (VERDICT r2 #3): the selection
logic is factored into pure functions of (shape, backend) so TPU-shape
decisions are testable on the CPU suite, and silent fallbacks warn once."""

import warnings

import pytest

from cardiax.ops.shooting import scan_plan
from cardiax.ops.warp_pallas import (_MAX_FULL_WARP_PIXELS, _MAX_VMEM_PIXELS,
                                     _warn_fallback_once, _warned_fallback,
                                     warp_plan)


@pytest.mark.parametrize("h,w,expect", [
    (128, 128, "pallas_full"),      # reference shape
    (256, 256, "pallas_full"),      # clinical pre-resize
    (512, 512, "pallas_tiled"),     # bwd transpose kernel exceeds scoped
                                    # VMEM at 512^2 (measured 20.08 MB) ->
                                    # tiled for fwd AND bwd
    (640, 640, "pallas_tiled"),     # > limit, 64 | H
    (1024, 1024, "pallas_tiled"),   # STATUS large-frame bench shape
    (1000, 1000, "pallas_tiled"),   # only tr=8 divides
    (1021, 1021, "xla_gather"),     # untileable height
])
def test_warp_plan_tpu_shapes(h, w, expect):
    assert warp_plan(h, w, radius=12, backend="tpu") == expect


def test_warp_plan_off_tpu_is_gather():
    assert warp_plan(128, 128, radius=12, backend="cpu") == "xla_gather"


@pytest.mark.parametrize("h,w,expect", [
    (64, 64, "fused_pallas"),       # flagship shoot grid (128^2, ds=2)
    (128, 128, "fused_pallas"),     # 256^2 frames at ds=2
    (256, 256, "fused_pallas"),     # 512^2 frames at ds=2
    (384, 256, "composite"),        # standalone-probed ok, but the FULL
                                    # step OOMs scoped VMEM above 256^2
                                    # (operands placed in VMEM; see
                                    # epdiff_pallas._MAX_FUSED_SCAN_PIXELS)
    (448, 256, "composite"),        # measured Mosaic compile crash even
    (512, 256, "composite"),        # standalone (scoped-VMEM stack)
    (384, 384, "composite"),        # 147k px crashes (probed)
    (512, 512, "composite"),
    (640, 640, "composite"),        # beyond the fused kernel's block limit
])
def test_scan_plan_tpu_shapes(h, w, expect):
    assert scan_plan(h, w, warp_radius=8, backend="tpu") == expect


def test_scan_plan_exact_mode_is_composite():
    # warp_radius=None is the exact_warp qualification arm
    assert scan_plan(64, 64, warp_radius=None, backend="tpu") == "composite"
    assert scan_plan(64, 64, warp_radius=8, backend="cpu") == "composite"


def test_limit_constant_consistency():
    # the full-warp boundary sits BELOW the raw VMEM block limit: the
    # differentiable warp's transpose kernel keeps ~5 live planes vs the
    # forward's 4, and overflows scoped VMEM at exactly 512^2 (20.08 MB
    # measured vs the 16 MB limit) — 512^2 must therefore tile
    assert warp_plan(512, 384, 12, "tpu") == "pallas_full"
    assert warp_plan(512, 512, 12, "tpu") == "pallas_tiled"
    assert _MAX_FULL_WARP_PIXELS == 512 * 384 < _MAX_VMEM_PIXELS == 512 * 512
    # the multi-channel kernel's own boundary sits BELOW the single-channel
    # one (it keeps ~C more live planes): measured c=2 ok at 512x256,
    # crash at 520x256 / 384x384; c=4 has no probed-ok point
    from cardiax.ops.warp_pallas import (_MAX_MULTI_WARP_CHANNELS,
                                         _MAX_MULTI_WARP_PIXELS)
    assert _MAX_MULTI_WARP_PIXELS == 512 * 256 < _MAX_FULL_WARP_PIXELS
    assert _MAX_MULTI_WARP_CHANNELS == 2


@pytest.mark.parametrize("h,w,c,radius,expect", [
    (64, 64, 2, 2, "pallas_multi"),     # flagship in-scan u_inv warp
    (128, 128, 2, 12, "pallas_multi"),  # final image warp (c<=2)
    (512, 256, 2, 2, "pallas_multi"),   # probed-ok boundary
    (520, 256, 2, 2, "per_channel"),    # probed Mosaic crash beyond
    (384, 384, 2, 2, "per_channel"),    # probed crash (the round-4 bug:
                                        # previously selected the kernel)
    (128, 128, 4, 2, "per_channel"),    # c=4: no probed-ok compile point
    (128, 128, 3, 2, "per_channel"),
])
def test_multi_warp_plan_tpu_shapes(h, w, c, radius, expect):
    from cardiax.ops.warp_pallas import multi_warp_plan
    assert multi_warp_plan(h, w, c, radius, backend="tpu") == expect


def test_multi_warp_plan_off_tpu_is_per_channel():
    from cardiax.ops.warp_pallas import multi_warp_plan
    assert multi_warp_plan(64, 64, 2, 2, backend="cpu") == "per_channel"


def test_fallback_warns_exactly_once():
    _warned_fallback.discard(("stage-x", "reason-y"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _warn_fallback_once("stage-x", "reason-y")
        _warn_fallback_once("stage-x", "reason-y")
    msgs = [w for w in caught if "stage-x" in str(w.message)]
    assert len(msgs) == 1
    assert "falling back to reason-y" in str(msgs[0].message)


def test_pack_plan_respects_fused_scan_budget():
    """pack_plan must never produce a packed plane above the MEASURED fused-
    kernel compile boundary (256^2 px): a 250^2 grid used to pack rows x2
    into a 125k-px plane under the old 512^2 budget and crash Mosaic."""
    from cardiax.ops.epdiff_pallas import _MAX_FUSED_SCAN_PIXELS, pack_plan
    # Full-step-proven boundary. Round 4 raised this to the standalone-probed
    # 384*256 and a 384^2-frame FULL step then OOM'd scoped VMEM on a packed
    # 384x192 plane (XLA places kernel operands in VMEM inside the big
    # program) — standalone probes overestimate; see epdiff_pallas.py.
    assert _MAX_FUSED_SCAN_PIXELS == 256 * 256
    for n, h, w in [(6, 64, 64), (10, 128, 128), (4, 250, 250),
                    (2, 256, 256), (3, 90, 90), (8, 32, 48)]:
        pr, pc, n_pad = pack_plan(n, h, w)
        assert (h * pr) * (w * pc) <= _MAX_FUSED_SCAN_PIXELS, (h, w, pr, pc)
        assert (n + n_pad) % (pr * pc) == 0
    # flagship shape keeps its 2x2 packing (perf-load-bearing)
    assert pack_plan(190, 64, 64)[:2] == (2, 2)
    # 384^2 frames (ds=2 -> 192^2 grids) must shoot UNPACKED: packing rows
    # x2 makes a 384x192 plane, which the FULL-step backward OOM'd on
    # hardware when the cap was briefly 384*256 (round-4 regression)
    assert pack_plan(14, 192, 192)[:2] == (1, 1)
