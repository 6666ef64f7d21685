"""Pallas TPU kernel for bilinear warping — the framework's hottest op.

XLA lowers per-pixel 2D gathers terribly on TPU (~134 ms for a 380x128x128
warp batch; gather/scatter is the classic TPU weak spot). This kernel removes
the gather entirely by exploiting the physics: cardiac displacements are a few
pixels, so the warp is a BANDED operation,

    out(i,j) = sum_{|d|<=R, |e|<=R} wy_d(i,j) * wx_e(i,j) * img(i+d, j+e)

where wy/wx are the bilinear hat weights of the (clipped) sample coordinates
and at most 2 taps per axis are nonzero. With the image tile resident in VMEM,
each tap is a circular `pltpu.roll` + FMA on the VPU — zero HBM traffic inside
the loop. Displacements are clamped to +-(R-1) (default R=8; configurable).

Out-of-range rolls wrap, but wrapped values always receive weight 0: clipped
sample coords lie in [0, H-1], so only in-range absolute rows/cols match the
floor/ceil indices. Edge clamping therefore matches `cardiax.ops.warp`'s
clip-at-border semantics exactly (for |disp| < R).

The custom VJP uses ONE fused backward kernel (all three gradients in a
single tap sweep, sharing the shifted-image rolls) whenever the unrolled
program fits Mosaic's scoped-VMEM budget; otherwise it falls back to three
forward-sized kernels:
  * mode "ddy"/"ddx": d out / d coord  (hat derivative is -1/+1 on the two
    active taps), multiplied by the cotangent outside the kernel;
  * the transpose kernel scatters g * w back by rolling the opposite way,
    giving d/d img.

The public entry `bilinear_warp_banded` falls back to the exact XLA-gather
implementation (`cardiax.ops.warp.bilinear_warp`) on non-TPU backends; in
tests the kernel runs under `interpret=True` for semantic parity checks.

Reference capability replaced: lagomorph's CUDA `interp` (SURVEY.md 2.12).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_RADIUS = 8
# one (H, W) f32 block x ~6 live buffers must fit VMEM (~16 MB/core); beyond
# this the TILED kernels run (grid (N, H/TR), manual row-window DMA from HBM);
# frames whose height none of the tile sizes divide take the XLA-gather
# fallback
_MAX_VMEM_PIXELS = 512 * 512
# The differentiable full-frame warp keeps ~5 live (H, W) f32 buffers in its
# TRANSPOSE (d/d img) kernel where the forward keeps 4; with Mosaic's ~4x
# allocation overestimate the bwd exceeds the 16 MB scoped-VMEM limit at
# exactly 512x512 (measured on v5e: 20.08 MB requested). Frames above this
# bound dispatch to the TILED kernels for BOTH fwd and bwd, keeping the
# custom_vjp pair on one path.
_MAX_FULL_WARP_PIXELS = 512 * 384
# The MULTI-channel full-frame kernel keeps ~C more live planes than the
# single-channel one, so it has its own (lower) MEASURED boundary
# (tools/probe_warp_boundary.py, r=2, fwd + full bwd): c=2 compiles at
# 512x256 px and crashes the Mosaic compile at 520x256 AND 384x384; c=4
# crashes already at 512x256 (no probed-ok point yet -> c>2 always takes
# the per-channel fallback). Round-4 bugfix: this path previously shared
# _MAX_FULL_WARP_PIXELS, so a 384^2-frame composite scan crashed instead
# of falling back (exp_results/round4/scan_boundary.log).
# FULL-STEP-proven (the evidence bar the fused-scan cap revert set): the
# 768x512- and 1024x512-frame train steps run the in-scan multi kernel at
# 98,304-px and exactly 131,072-px (= this cap) grids inside the composite
# scan (exp_results/round4/bench_large_{768x512,1024x512}.log) — XLA's
# in-program operand placement fits beside this kernel's 4-5 live planes.
_MAX_MULTI_WARP_PIXELS = 512 * 256
_MAX_MULTI_WARP_CHANNELS = 2
# fully-unrolled tap loop limits (beyond: fori_loop + dynamic rotate).
# With the d-only hat weights hoisted out of the column loop the per-tap
# program is tiny and radius 16 (1089 taps) compiles and runs ~5x faster than
# the fori path; hoisting needs (2R+1) live (H, W) buffers, so on large frames
# where they don't fit scoped VMEM we still unroll up to 400 taps computing
# weights inline (the round-1 behavior).
_UNROLL_TAP_LIMIT = 1100
_UNROLL_TAP_LIMIT_NOPRE = 400

_warned_fallback: set = set()


def warp_plan(h: int, w: int, radius: int, backend: str | None = None) -> str:
    """Which warp implementation engages at an (H, W) frame:
    'pallas_full' (one VMEM block), 'pallas_tiled' (row-window DMA), or
    'xla_gather' (exact fallback). Pure function of shape+backend so tests
    can pin the selection for TPU shapes without TPU hardware
    (tests/test_kernel_selection.py; VERDICT r2 #3)."""
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return "xla_gather"
    if h * w <= _MAX_FULL_WARP_PIXELS:
        return "pallas_full"
    if _tile_plan(h, w, radius) is not None:
        return "pallas_tiled"
    return "xla_gather"


def multi_warp_plan(h: int, w: int, c: int, radius: int,
                    backend: str | None = None) -> str:
    """Which implementation `bilinear_warp_banded_multi` engages:
    'pallas_multi' (one shared-tap kernel over all channels) or
    'per_channel' (fall back to the single-channel `warp_plan` path per
    channel). Pure function of shape+backend for test pinning."""
    backend = backend or jax.default_backend()
    taps = (2 * radius + 1) ** 2
    mc_ok = taps <= (_UNROLL_TAP_LIMIT if _precompute_wys_ok(h, w, radius)
                     else _UNROLL_TAP_LIMIT_NOPRE)
    if (backend == "tpu" and c <= _MAX_MULTI_WARP_CHANNELS
            and h * w <= _MAX_MULTI_WARP_PIXELS and mc_ok):
        return "pallas_multi"
    return "per_channel"


def _warn_fallback_once(stage: str, reason: str) -> None:
    """A silent fallback to a slower path must warn once per (stage, reason)
    (VERDICT r2 #3: 'make every silent fallback warn once')."""
    key = (stage, reason)
    if key in _warned_fallback:
        return
    _warned_fallback.add(key)
    import warnings
    warnings.warn(f"{stage}: falling back to {reason}", RuntimeWarning,
                  stacklevel=3)


def _shifted(img, d: int, e: int):
    """Circularly shift so result(i, j) = img(i + d, j + e)."""
    out = img
    if d:
        out = pltpu.roll(out, -d % out.shape[0], axis=0)
    if e:
        out = pltpu.roll(out, -e % out.shape[1], axis=1)
    return out


def _coords(disp_y, disp_x, h: int, w: int, radius: int):
    """Clamped sample coordinates and bilinear pieces (local row indices)."""
    return _window_coords(disp_y, disp_x, 0, h, w, radius)


def _hat(r_abs, a0, a1, f):
    """Bilinear hat weight of absolute tap index for coords (a0, a1, f)."""
    return jnp.where(r_abs == a0, 1.0 - f, 0.0) + jnp.where(r_abs == a1, f, 0.0)


def _dhat(r_abs, a0, a1):
    """d hat / d coordinate: -1 on the floor tap, +1 on the ceil tap (a.e.)."""
    return jnp.where(r_abs == a1, 1.0, 0.0) - jnp.where(r_abs == a0, 1.0, 0.0)


def _row_shifted_dyn(x, shift, h: int, w: int):
    """Rows shifted by a TRACED amount: result(i, j) = x((i + shift) mod h, j).

    Uses Mosaic's dynamic rotate (pltpu.roll with a traced shift; semantics
    result(i) = x(i - shift)); keeps the tap loop a small fori_loop body
    instead of (2R+1)^2 unrolled rolls, which overflow Mosaic's scoped-VMEM
    stack at R >= 12. (lax.dynamic_slice on VALUES is not lowered by Mosaic.)
    """
    return pltpu.roll(x, jnp.mod(-shift, h), axis=0)


def _precompute_wys_ok(h: int, w: int, radius: int, n_lists: int = 1) -> bool:
    """Keeping n_lists x (2R+1) per-row vertical weights live must fit scoped
    VMEM (with ~16 arrays of headroom for image/coord/accumulator buffers).

    Budget is EMPIRICAL: Mosaic's stack allocation runs ~4x this estimate
    (radius 16 fused with 2 lists = 5.25 MB estimated showed as a 22.98 MB
    scoped allocation against the 16 MB limit), so 4 MB here keeps every
    accepted configuration comfortably under the hardware limit."""
    return (n_lists * (2 * radius + 1) + 16) * h * w * 4 <= 4 * 1024 * 1024


def _unroll_plan(h: int, w: int, radius: int, n_lists: int = 1):
    """(unroll?, precompute?) for the tap loops at this frame size/radius."""
    taps = (2 * radius + 1) ** 2
    pre = _precompute_wys_ok(h, w, radius, n_lists)
    return taps <= (_UNROLL_TAP_LIMIT if pre else _UNROLL_TAP_LIMIT_NOPRE), pre


def _tap_kernel(img_ref, dy_ref, dx_ref, out_ref, *, radius: int, mode: str):
    """mode 'value': the warp; 'ddy'/'ddx': d warp / d coordinate field."""
    h, w = img_ref.shape
    img = img_ref[:]
    ii, jj, y0, y1, fy, x0, x1, fx, my, mx = _coords(
        dy_ref[:], dx_ref[:], h, w, radius)
    acc = jnp.zeros((h, w), jnp.float32)
    unroll, pre = _unroll_plan(h, w, radius)

    def wy_at(d):
        return _dhat(ii + d, y0, y1) if mode == "ddy" \
            else _hat(ii + d, y0, y1, fy)

    if unroll and pre:
        # the vertical hat weight depends on d only — hoist all 2R+1 of them
        # out of the column loop (cuts per-tap VPU work ~2.5x)
        wys = [wy_at(d) for d in range(-radius, radius + 1)]
        wy_at = lambda d: wys[d + radius]  # noqa: E731
    for e in range(-radius, radius + 1):          # unrolled static lane rolls
        rx = jj + e
        wx = _dhat(rx, x0, x1) if mode == "ddx" else _hat(rx, x0, x1, fx)
        s = _shifted(img, 0, e)

        if unroll:   # fully static rolls (+ hoisted weights on small frames)
            b = jnp.zeros((h, w), jnp.float32)
            for d in range(-radius, radius + 1):
                b = b + wy_at(d) * _shifted(s, d, 0)
            acc = acc + wx * b
        else:        # fori_loop + dynamic rotate: small program, any radius
            def body(k, acc, wx=wx, s=s):
                dd = k - radius
                ry = ii + dd.astype(jnp.float32)
                wy = _dhat(ry, y0, y1) if mode == "ddy" else _hat(ry, y0, y1, fy)
                return acc + (wy * wx) * _row_shifted_dyn(s, dd, h, w)

            acc = jax.lax.fori_loop(0, 2 * radius + 1, body, acc)
    if mode == "ddy":
        acc = acc * my
    elif mode == "ddx":
        acc = acc * mx
    out_ref[:] = acc


def _transpose_kernel(g_ref, dy_ref, dx_ref, out_ref, *, radius: int):
    """d/d img: out(r,s) = sum_{d,e} [w_{d,e} * g] rolled forward by (d,e)."""
    h, w = g_ref.shape
    g = g_ref[:]
    ii, jj, y0, y1, fy, x0, x1, fx, _, _ = _coords(
        dy_ref[:], dx_ref[:], h, w, radius)
    acc = jnp.zeros((h, w), jnp.float32)
    unroll, pre = _unroll_plan(h, w, radius)
    wy_at = lambda d: _hat(ii + d, y0, y1, fy)  # noqa: E731
    if unroll and pre:
        wys = [wy_at(d) for d in range(-radius, radius + 1)]
        wy_at = lambda d: wys[d + radius]  # noqa: E731
    for e in range(-radius, radius + 1):
        wx = _hat(jj + e, x0, x1, fx)
        a_e = g * wx

        if unroll:
            b_e = jnp.zeros((h, w), jnp.float32)
            for d in range(-radius, radius + 1):
                b_e = b_e + _shifted(wy_at(d) * a_e, -d, 0)
        else:
            def body(k, b, a_e=a_e):
                dd = k - radius
                wy = _hat(ii + dd.astype(jnp.float32), y0, y1, fy)
                return b + _row_shifted_dyn(wy * a_e, -dd, h, w)

            b_e = jax.lax.fori_loop(0, 2 * radius + 1, body,
                                    jnp.zeros((h, w), jnp.float32))
        # tap-e contributions land e columns to the right: shift by -e
        acc = acc + _shifted(b_e, 0, -e)
    out_ref[:] = acc


def _fused_bwd_kernel(img_ref, dy_ref, dx_ref, g_ref,
                      gimg_ref, gdy_ref, gdx_ref, *, radius: int):
    """All three gradients in ONE tap sweep (shares the shifted-image rolls
    across the value/ddy/ddx weight variants; the transpose contribution is
    accumulated per-e like `_transpose_kernel`). Only used when the unrolled
    program fits Mosaic's scoped-VMEM budget; otherwise the three separate
    kernels run."""
    h, w = img_ref.shape
    img = img_ref[:]
    g = g_ref[:]
    ii, jj, y0, y1, fy, x0, x1, fx, my, mx = _coords(
        dy_ref[:], dx_ref[:], h, w, radius)
    acc_dy = jnp.zeros((h, w), jnp.float32)
    acc_dx = jnp.zeros((h, w), jnp.float32)
    acc_gi = jnp.zeros((h, w), jnp.float32)
    wy_at = lambda d: _hat(ii + d, y0, y1, fy)  # noqa: E731
    dwy_at = lambda d: _dhat(ii + d, y0, y1)  # noqa: E731
    if _precompute_wys_ok(h, w, radius, n_lists=2):
        # hoist the d-only weights out of the column loop (shared over all e)
        wys = [wy_at(d) for d in range(-radius, radius + 1)]
        dwys = [dwy_at(d) for d in range(-radius, radius + 1)]
        wy_at = lambda d: wys[d + radius]  # noqa: E731
        dwy_at = lambda d: dwys[d + radius]  # noqa: E731
    for e in range(-radius, radius + 1):
        rx = jj + e
        wx = _hat(rx, x0, x1, fx)
        dwx = _dhat(rx, x0, x1)
        s = _shifted(img, 0, e)
        a_e = g * wx
        b_e = jnp.zeros((h, w), jnp.float32)
        acc_v = jnp.zeros((h, w), jnp.float32)    # sum_d wy_d s_d (for ddx)
        acc_d = jnp.zeros((h, w), jnp.float32)    # sum_d dwy_d s_d (for ddy)
        for d in range(-radius, radius + 1):
            sh = _shifted(s, d, 0)
            wy = wy_at(d)
            acc_v = acc_v + wy * sh
            acc_d = acc_d + dwy_at(d) * sh
            b_e = b_e + _shifted(wy * a_e, -d, 0)
        acc_dy = acc_dy + wx * acc_d
        acc_dx = acc_dx + dwx * acc_v
        acc_gi = acc_gi + _shifted(b_e, 0, -e)
    gimg_ref[:] = acc_gi
    gdy_ref[:] = acc_dy * my * g
    gdx_ref[:] = acc_dx * mx * g


def _run_fused_bwd(args, radius: int, interpret: bool):
    n, h, w = args[0].shape
    kern = functools.partial(_fused_bwd_kernel, radius=radius)
    spec = pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((n, h, w), jnp.float32),) * 3,
        interpret=interpret,
    )(*args)


def _run(kernel, args, radius: int, interpret: bool, **kw):
    n, h, w = args[0].shape
    kern = functools.partial(kernel, radius=radius, **kw)
    spec = pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec] * len(args),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(*args)


# --------------------------------------------------------------------------- #
# Multi-channel kernels: C channels warped by ONE shared displacement          #
# --------------------------------------------------------------------------- #
# The shooting scan warps the 2-channel inverse-displacement field by the same
# per-step back-displacement, and the final image warp samples every image
# channel at the same coordinates. Per-channel dispatch recomputes the coords
# and hat weights C times and (in the scan) materializes a broadcast of disp
# to C*N; these kernels share one coordinate/weight computation across the
# channel loop and accumulate the displacement cotangent over channels
# IN-kernel. `_mc_disp_bwd_kernel` additionally drops the d/d img transpose
# sweep entirely — the final image warp samples DATA (the cotangent w.r.t.
# the source frames is discarded by the training step), which removes the
# per-tap scatter roll (~1/3 of the backward tap work).


def _mc_tap_kernel(img_ref, dy_ref, dx_ref, out_ref, *, radius: int,
                   channels: int):
    """Forward warp of (C, H, W) channels by one (H, W) displacement."""
    h, w = dy_ref.shape
    ii, jj, y0, y1, fy, x0, x1, fx, _, _ = _coords(
        dy_ref[:], dx_ref[:], h, w, radius)
    unroll, pre = _unroll_plan(h, w, radius, n_lists=1)
    wy_at = lambda d: _hat(ii + d, y0, y1, fy)  # noqa: E731
    if unroll and pre:
        wys = [wy_at(d) for d in range(-radius, radius + 1)]
        wy_at = lambda d: wys[d + radius]  # noqa: E731
    imgs = [img_ref[c] for c in range(channels)]
    accs = [jnp.zeros((h, w), jnp.float32) for _ in range(channels)]
    for e in range(-radius, radius + 1):
        wx = _hat(jj + e, x0, x1, fx)
        ss = [_shifted(im, 0, e) for im in imgs]
        bs = [jnp.zeros((h, w), jnp.float32) for _ in range(channels)]
        if unroll:
            for d in range(-radius, radius + 1):
                wy = wy_at(d)
                for c in range(channels):
                    bs[c] = bs[c] + wy * _shifted(ss[c], d, 0)
        else:
            def body(k, bs, ss=ss):
                dd = k - radius
                wy = _hat(ii + dd.astype(jnp.float32), y0, y1, fy)
                return tuple(b + wy * _row_shifted_dyn(s, dd, h, w)
                             for b, s in zip(bs, ss))

            bs = list(jax.lax.fori_loop(0, 2 * radius + 1, body, tuple(bs)))
        for c in range(channels):
            accs[c] = accs[c] + wx * bs[c]
    for c in range(channels):
        out_ref[c] = accs[c]


def _mc_hoist(h, w, radius, ii, y0, y1, fy):
    """Hoist the d-only vertical weights out of the tap loops: both lists if
    they fit the scoped-VMEM budget, else the hat list only (the derivative
    hat is 2 compares + a sub, cheap to recompute inline), else nothing."""
    wy_at = lambda d: _hat(ii + d, y0, y1, fy)  # noqa: E731
    dwy_at = lambda d: _dhat(ii + d, y0, y1)  # noqa: E731
    if _precompute_wys_ok(h, w, radius, n_lists=2):
        wys = [wy_at(d) for d in range(-radius, radius + 1)]
        dwys = [dwy_at(d) for d in range(-radius, radius + 1)]
        return (lambda d: wys[d + radius]), (lambda d: dwys[d + radius])
    if _precompute_wys_ok(h, w, radius, n_lists=1):
        wys = [wy_at(d) for d in range(-radius, radius + 1)]
        return (lambda d: wys[d + radius]), dwy_at
    return wy_at, dwy_at


def _mc_fused_bwd_kernel(img_ref, dy_ref, dx_ref, g_ref,
                         gimg_ref, gdy_ref, gdx_ref, *, radius: int,
                         channels: int):
    """All gradients of the multi-channel warp in one tap sweep: per-channel
    d/d img plus the CHANNEL-SUMMED d/d disp cotangent."""
    h, w = dy_ref.shape
    ii, jj, y0, y1, fy, x0, x1, fx, my, mx = _coords(
        dy_ref[:], dx_ref[:], h, w, radius)
    wy_at, dwy_at = _mc_hoist(h, w, radius, ii, y0, y1, fy)
    imgs = [img_ref[c] for c in range(channels)]
    gs = [g_ref[c] for c in range(channels)]
    acc_dy = jnp.zeros((h, w), jnp.float32)
    acc_dx = jnp.zeros((h, w), jnp.float32)
    acc_gi = [jnp.zeros((h, w), jnp.float32) for _ in range(channels)]
    for e in range(-radius, radius + 1):
        rx = jj + e
        wx = _hat(rx, x0, x1, fx)
        dwx = _dhat(rx, x0, x1)
        for c in range(channels):
            s = _shifted(imgs[c], 0, e)
            a_e = gs[c] * wx
            b_e = jnp.zeros((h, w), jnp.float32)
            acc_v = jnp.zeros((h, w), jnp.float32)
            acc_d = jnp.zeros((h, w), jnp.float32)
            for d in range(-radius, radius + 1):
                sh = _shifted(s, d, 0)
                wy = wy_at(d)
                acc_v = acc_v + wy * sh
                acc_d = acc_d + dwy_at(d) * sh
                b_e = b_e + _shifted(wy * a_e, -d, 0)
            acc_dy = acc_dy + (wx * gs[c]) * acc_d
            acc_dx = acc_dx + (dwx * gs[c]) * acc_v
            acc_gi[c] = acc_gi[c] + _shifted(b_e, 0, -e)
    for c in range(channels):
        gimg_ref[c] = acc_gi[c]
    gdy_ref[:] = acc_dy * my
    gdx_ref[:] = acc_dx * mx


def _mc_disp_bwd_kernel(img_ref, dy_ref, dx_ref, g_ref,
                        gdy_ref, gdx_ref, *, radius: int, channels: int):
    """d/d disp ONLY (channel-summed); used when the warped image is data."""
    h, w = dy_ref.shape
    ii, jj, y0, y1, fy, x0, x1, fx, my, mx = _coords(
        dy_ref[:], dx_ref[:], h, w, radius)
    wy_at, dwy_at = _mc_hoist(h, w, radius, ii, y0, y1, fy)
    imgs = [img_ref[c] for c in range(channels)]
    gs = [g_ref[c] for c in range(channels)]
    acc_dy = jnp.zeros((h, w), jnp.float32)
    acc_dx = jnp.zeros((h, w), jnp.float32)
    for e in range(-radius, radius + 1):
        rx = jj + e
        wx = _hat(rx, x0, x1, fx)
        dwx = _dhat(rx, x0, x1)
        for c in range(channels):
            s = _shifted(imgs[c], 0, e)
            acc_v = jnp.zeros((h, w), jnp.float32)
            acc_d = jnp.zeros((h, w), jnp.float32)
            for d in range(-radius, radius + 1):
                sh = _shifted(s, d, 0)
                acc_v = acc_v + wy_at(d) * sh
                acc_d = acc_d + dwy_at(d) * sh
            acc_dy = acc_dy + (wx * gs[c]) * acc_d
            acc_dx = acc_dx + (dwx * gs[c]) * acc_v
    gdy_ref[:] = acc_dy * my
    gdx_ref[:] = acc_dx * mx


def _mc_specs(n, c, h, w):
    img = pl.BlockSpec((None, c, h, w), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((None, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return img, plane


def _run_mc_fwd(imgs, dy, dx, radius: int, interpret: bool):
    n, c, h, w = imgs.shape
    img_s, plane_s = _mc_specs(n, c, h, w)
    return pl.pallas_call(
        functools.partial(_mc_tap_kernel, radius=radius, channels=c),
        grid=(n,),
        in_specs=[img_s, plane_s, plane_s],
        out_specs=img_s,
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        interpret=interpret,
    )(imgs, dy, dx)


def _run_mc_fused_bwd(imgs, dy, dx, g, radius: int, interpret: bool):
    n, c, h, w = imgs.shape
    img_s, plane_s = _mc_specs(n, c, h, w)
    return pl.pallas_call(
        functools.partial(_mc_fused_bwd_kernel, radius=radius, channels=c),
        grid=(n,),
        in_specs=[img_s, plane_s, plane_s, img_s],
        out_specs=(img_s, plane_s, plane_s),
        out_shape=(jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((n, h, w), jnp.float32)),
        interpret=interpret,
    )(imgs, dy, dx, g)


def _run_mc_disp_bwd(imgs, dy, dx, g, radius: int, interpret: bool):
    n, c, h, w = imgs.shape
    img_s, plane_s = _mc_specs(n, c, h, w)
    return pl.pallas_call(
        functools.partial(_mc_disp_bwd_kernel, radius=radius, channels=c),
        grid=(n,),
        in_specs=[img_s, plane_s, plane_s, img_s],
        out_specs=(plane_s, plane_s),
        out_shape=(jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((n, h, w), jnp.float32)),
        interpret=interpret,
    )(imgs, dy, dx, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _banded_warp_mc(imgs, disp, radius: int, interpret: bool,
                    img_const: bool):
    """imgs (N, C, H, W), disp (N, 2, H, W) -> warped (N, C, H, W)."""
    return _run_mc_fwd(imgs.astype(jnp.float32),
                       disp[:, 0].astype(jnp.float32),
                       disp[:, 1].astype(jnp.float32), radius, interpret)


def _mc_fwd(imgs, disp, radius, interpret, img_const):
    return _banded_warp_mc(imgs, disp, radius, interpret, img_const), \
        (imgs, disp)


def _mc_bwd(radius, interpret, img_const, res, g):
    imgs, disp = res
    f32 = jnp.float32
    args = (imgs.astype(f32), disp[:, 0].astype(f32),
            disp[:, 1].astype(f32), g.astype(f32))
    if img_const:
        gdy, gdx = _run_mc_disp_bwd(*args, radius, interpret)
        g_img = jnp.zeros_like(imgs)
    else:
        g_img, gdy, gdx = _run_mc_fused_bwd(*args, radius, interpret)
        g_img = g_img.astype(imgs.dtype)
    return g_img, jnp.stack([gdy, gdx], axis=1).astype(disp.dtype)


_banded_warp_mc.defvjp(_mc_fwd, _mc_bwd)


def bilinear_warp_banded_multi(field: jnp.ndarray, disp: jnp.ndarray,
                               radius: int = DEFAULT_RADIUS,
                               interpret: bool | None = None,
                               img_const: bool = False) -> jnp.ndarray:
    """Warp every channel of ``field`` (..., C, H, W) by ONE shared
    displacement ``disp`` (..., 2, H, W), sharing the coordinate/hat-weight
    computation across channels. ``img_const=True`` marks the field as data
    (no cotangent needed) and skips the d/d img transpose sweep in the VJP.

    Falls back to per-channel `bilinear_warp_banded` off-TPU, on frames
    above the multi-kernel's own measured compile boundary
    (`_MAX_MULTI_WARP_PIXELS` — lower than the single-channel kernel's), or
    for channel counts > `_MAX_MULTI_WARP_CHANNELS` (c=4 has no probed-ok
    compile point). Selection is pinned by `multi_warp_plan`.
    """
    h, w = field.shape[-2:]
    c = field.shape[-3]
    taps = (2 * radius + 1) ** 2
    mc_ok = taps <= (_UNROLL_TAP_LIMIT if _precompute_wys_ok(h, w, radius)
                     else _UNROLL_TAP_LIMIT_NOPRE)
    use_kernel = interpret if interpret is not None else (
        jax.default_backend() == "tpu" and h * w <= _MAX_MULTI_WARP_PIXELS)
    if (not use_kernel or c > _MAX_MULTI_WARP_CHANNELS
            or h * w > _MAX_MULTI_WARP_PIXELS or not mc_ok):
        if jax.default_backend() == "tpu" and interpret is None:
            if c > _MAX_MULTI_WARP_CHANNELS:
                _warn_fallback_once(
                    f"multi-channel warp (c={c}, {h}x{w}, r={radius})",
                    "per-channel kernels: channel count above the probed "
                    f"multi-kernel limit ({_MAX_MULTI_WARP_CHANNELS})")
            elif h * w > _MAX_MULTI_WARP_PIXELS:
                _warn_fallback_once(
                    f"multi-channel warp ({h}x{w}, r={radius})",
                    "per-channel tiled kernels: frame exceeds the full-frame "
                    "VMEM block (shared-tap kernel and img_const VJP skip "
                    "lost)")
            elif not mc_ok:
                _warn_fallback_once(
                    f"multi-channel warp ({h}x{w}, r={radius})",
                    f"per-channel kernels: {taps} taps exceed the mc unroll "
                    "limit (shared-tap kernel and img_const VJP skip lost)")
        from cardiax.ops.warp import warp_vector_field
        f = jax.lax.stop_gradient(field) if img_const else field
        wf = lambda i, d: bilinear_warp_banded(i, d, radius=radius,  # noqa: E731
                                               interpret=interpret)
        return warp_vector_field(f, disp, wf)
    field_flat = field.reshape((-1, c) + field.shape[-2:])
    disp_flat = disp.reshape((-1, 2) + disp.shape[-2:])
    out = _banded_warp_mc(field_flat, disp_flat, radius, bool(interpret),
                          img_const)
    return out.reshape(field.shape).astype(field.dtype)


# --------------------------------------------------------------------------- #
# Tiled kernels: frames too large for one (H, W) VMEM block                    #
# --------------------------------------------------------------------------- #
# Grid (N, H/TR). dy/dx/out are (TR, W) row-band blocks; the image stays in
# ANY/HBM and each grid step manually DMAs a (TR + 2R, W) row window starting
# at start = clamp(r0 - R, 0, H - window). One dynamic roll by -off
# (off = r0 - start, traced) aligns the window so row i is absolute row
# r0 + i; the per-tap rolls are then static. Wrapped rows only appear where
# the absolute tap row is outside the image — exactly where the hat weight
# (keyed on the GLOBAL row index) is zero, so the forward/ddy/ddx kernels
# need no masking. The transpose kernel evaluates weights at the SOURCE
# pixel, where wrapped rows can carry nonzero weights, so it masks each tap
# by absolute-source-row validity.

_TILE_ROWS = 64


def _win_margin(radius: int) -> int:
    """Window margin rounded up to the (8,128) sublane tiling: Mosaic must
    PROVE the dynamic HBM slice start divisible by 8, so the start is built
    as 8 * clip((r0 - margin) // 8, ...) with margin a multiple of 8."""
    return -(-radius // 8) * 8


def _tile_plan(h: int, w: int, radius: int):
    """Tile row count for an (H, W) frame, or None if untileable."""
    for tr in (_TILE_ROWS, 32, 16, 8):
        if h % tr == 0 and h >= tr + 2 * _win_margin(radius) \
                and tr * w <= _MAX_VMEM_PIXELS:
            return tr
    return None


def _window_coords(dy, dx, r0, h: int, w: int, radius: int, ii=None):
    """Clamped sample coordinates, bilinear pieces, and clip-saturation masks,
    with row index = r0 + local row (r0=0 for full-frame blocks; the tile row
    offset for row-band blocks). Pass ``ii`` explicitly for ALIGNED windows,
    whose tail rows wrap to absolute rows ABOVE r0
    (see `_tiled_transpose_kernel`)."""
    tr = dy.shape[0]
    if ii is None:
        # Mosaic requires integer iota; cast after
        ii = (jax.lax.broadcasted_iota(jnp.int32, (tr, w), 0)
              .astype(jnp.float32)) + jnp.asarray(r0, jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tr, w), 1).astype(jnp.float32)
    r = float(radius - 1)
    cy = jnp.clip(ii + jnp.clip(dy, -r, r), 0.0, h - 1.0)
    cx = jnp.clip(jj + jnp.clip(dx, -r, r), 0.0, w - 1.0)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    my = jnp.where((jnp.abs(dy) <= r) & (ii + dy >= 0.0)
                   & (ii + dy <= h - 1.0), 1.0, 0.0)
    mx = jnp.where((jnp.abs(dx) <= r) & (jj + dx >= 0.0)
                   & (jj + dx <= w - 1.0), 1.0, 0.0)
    return ii, jj, y0, y1, fy, x0, x1, fx, my, mx


def _tiled_tap_kernel(dy_ref, dx_ref, img_ref, out_ref, win_ref, sem, *,
                      radius: int, mode: str, h: int, tile_rows: int):
    """Tiled twin of `_tap_kernel`; img_ref is the full (N, H, W) array in
    ANY/HBM, the rest are (TR, W) blocks of grid step (n, r)."""
    n = pl.program_id(0)
    r = pl.program_id(1)
    w = out_ref.shape[-1]
    margin = _win_margin(radius)
    win = tile_rows + 2 * margin
    r0 = r * tile_rows
    start = 8 * jnp.clip((r0 - margin) // 8, 0, (h - win) // 8)
    off = r0 - start
    copy = pltpu.make_async_copy(img_ref.at[n, pl.ds(start, win)], win_ref, sem)
    copy.start()
    ii, jj, y0, y1, fy, x0, x1, fx, my, mx = _window_coords(
        dy_ref[:], dx_ref[:], r0, h, w, radius)
    copy.wait()
    # align: base[i] = window[i + off] = img[r0 + i]
    base = pltpu.roll(win_ref[:], jnp.mod(-off, win), axis=0)

    def wy_at(d):
        return _dhat(ii + d, y0, y1) if mode == "ddy" \
            else _hat(ii + d, y0, y1, fy)

    unroll = (2 * radius + 1) ** 2 <= _UNROLL_TAP_LIMIT_NOPRE
    acc = jnp.zeros((tile_rows, w), jnp.float32)
    for e in range(-radius, radius + 1):
        rx = jj + e
        wx = _dhat(rx, x0, x1) if mode == "ddx" else _hat(rx, x0, x1, fx)
        s = pltpu.roll(base, -e % w, axis=1) if e else base
        if unroll:
            b = jnp.zeros((tile_rows, w), jnp.float32)
            for d in range(-radius, radius + 1):
                # rolled[i] = base[i + d] = img[r0 + i + d]; wrapped rows are
                # out-of-image and get hat weight 0 (global-row keyed)
                rolled = pltpu.roll(s, -d % win, axis=0)[:tile_rows] if d \
                    else s[:tile_rows]
                b = b + wy_at(d) * rolled
        else:    # big radii: fori_loop + dynamic rotate (bounds scoped VMEM)
            def body(k, b, s=s):
                dd = k - radius
                rolled = pltpu.roll(s, jnp.mod(-dd, win), axis=0)[:tile_rows]
                return b + wy_at(dd.astype(jnp.float32)) * rolled

            b = jax.lax.fori_loop(0, 2 * radius + 1, body,
                                  jnp.zeros((tile_rows, w), jnp.float32))
        acc = acc + wx * b
    if mode == "ddy":
        acc = acc * my
    elif mode == "ddx":
        acc = acc * mx
    out_ref[:] = acc


def _tiled_transpose_kernel(g_ref, dy_ref, dx_ref, out_ref,
                            gwin_ref, dywin_ref, dxwin_ref, sem, *,
                            radius: int, h: int, tile_rows: int):
    """Tiled d/d img: out rows [r0, r0+TR) gather cotangent mass from source
    rows [r0-R, r0+TR+R). g/dy/dx arrive as full (N, H, W) ANY refs and are
    window-DMA'd; weights are evaluated at the SOURCE pixel, so each tap is
    masked by absolute-source-row validity (wrapped window rows are real
    in-image rows whose weights are NOT zero)."""
    n = pl.program_id(0)
    r = pl.program_id(1)
    w = out_ref.shape[-1]
    margin = _win_margin(radius)
    win = tile_rows + 2 * margin
    r0 = r * tile_rows
    start = 8 * jnp.clip((r0 - margin) // 8, 0, (h - win) // 8)
    off = r0 - start
    copies = [pltpu.make_async_copy(ref.at[n, pl.ds(start, win)], dst, sem)
              for ref, dst in ((g_ref, gwin_ref), (dy_ref, dywin_ref),
                               (dx_ref, dxwin_ref))]
    for c in copies:
        c.start()
        c.wait()
    align = lambda x: pltpu.roll(x, jnp.mod(-off, win), axis=0)  # noqa: E731
    g = align(gwin_ref[:])
    dyw = align(dywin_ref[:])
    dxw = align(dxwin_ref[:])
    # source-pixel coords over the aligned window: row i is absolute row
    # r0 + ((i + off) mod win) - off — the tail rows i >= win - off wrap to
    # the rows ABOVE r0, and their weights must use that true absolute index
    loc = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0)
    abs_row = (jnp.mod(loc + off, win) - off).astype(jnp.float32) \
        + r0.astype(jnp.float32)
    ii, jj, y0, y1, fy, x0, x1, fx, _, _ = _window_coords(
        dyw, dxw, r0, h, w, radius, ii=abs_row)
    out_iota = (jax.lax.broadcasted_iota(jnp.int32, (tile_rows, w), 0)
                .astype(jnp.float32)) + r0.astype(jnp.float32)
    unroll = (2 * radius + 1) ** 2 <= _UNROLL_TAP_LIMIT_NOPRE
    acc = jnp.zeros((tile_rows, w), jnp.float32)
    for e in range(-radius, radius + 1):
        wx = _hat(jj + e, x0, x1, fx)
        a_e = g * wx

        def tap(d, shift, b_e, a_e=a_e):
            # out(r, s) += w(r-d, s-e) g(r-d, s-e): source row r-d lives at
            # aligned index (r - r0) - d; mask rows whose absolute source row
            # falls outside the image (those reads wrapped)
            wy = _hat(ii + d, y0, y1, fy)
            rolled = pltpu.roll(wy * a_e, shift, axis=0)[:tile_rows]
            src_row = out_iota - d
            valid = jnp.where((src_row >= 0.0) & (src_row <= h - 1.0), 1.0, 0.0)
            return b_e + rolled * valid

        if unroll:
            b_e = jnp.zeros((tile_rows, w), jnp.float32)
            for d in range(-radius, radius + 1):
                b_e = tap(float(d), d % win, b_e)     # static rolls
        else:    # big radii: fori_loop + dynamic rotate (bounds scoped VMEM)
            def body(k, b):
                dd = k - radius
                return tap(dd.astype(jnp.float32), jnp.mod(dd, win), b)

            b_e = jax.lax.fori_loop(0, 2 * radius + 1, body,
                                    jnp.zeros((tile_rows, w), jnp.float32))
        acc = acc + (pltpu.roll(b_e, e % w, axis=1) if e else b_e)
    out_ref[:] = acc


def _run_tiled(kernel_mode, img, dy, dx, radius: int, interpret: bool,
               tile_rows: int):
    n, h, w = img.shape
    win = tile_rows + 2 * _win_margin(radius)
    band = pl.BlockSpec((None, tile_rows, w), lambda i, r: (i, r, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(_tiled_tap_kernel, radius=radius,
                             mode=kernel_mode, h=h, tile_rows=tile_rows)
    return pl.pallas_call(
        kern,
        grid=(n, h // tile_rows),
        in_specs=[band, band, full],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win, w), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(dy, dx, img)


def _run_tiled_transpose(g, dy, dx, radius: int, interpret: bool,
                         tile_rows: int):
    n, h, w = g.shape
    win = tile_rows + 2 * _win_margin(radius)
    band = pl.BlockSpec((None, tile_rows, w), lambda i, r: (i, r, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(_tiled_transpose_kernel, radius=radius, h=h,
                             tile_rows=tile_rows)
    return pl.pallas_call(
        kern,
        grid=(n, h // tile_rows),
        in_specs=[full, full, full],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win, w), jnp.float32),
                        pltpu.VMEM((win, w), jnp.float32),
                        pltpu.VMEM((win, w), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(g, dy, dx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _banded_warp_nhw(img, disp, radius: int, interpret: bool):
    """img (N, H, W), disp (N, 2, H, W) -> warped (N, H, W)."""
    h, w = img.shape[-2:]
    args = (img.astype(jnp.float32), disp[:, 0].astype(jnp.float32),
            disp[:, 1].astype(jnp.float32))
    if h * w > _MAX_FULL_WARP_PIXELS:
        tr = _tile_plan(h, w, radius)
        assert tr is not None, "caller must check _tile_plan before dispatch"
        return _run_tiled("value", args[0], args[1], args[2], radius,
                          interpret, tr)
    return _run(_tap_kernel, args, radius, interpret, mode="value")


def _banded_fwd(img, disp, radius, interpret):
    return _banded_warp_nhw(img, disp, radius, interpret), (img, disp)


def _banded_bwd(radius, interpret, res, g):
    img, disp = res
    f32 = jnp.float32
    args = (img.astype(f32), disp[:, 0].astype(f32), disp[:, 1].astype(f32))
    g32 = g.astype(f32)
    h, w = img.shape[-2:]
    if h * w > _MAX_FULL_WARP_PIXELS:
        tr = _tile_plan(h, w, radius)
        ddy = _run_tiled("ddy", *args, radius, interpret, tr)
        ddx = _run_tiled("ddx", *args, radius, interpret, tr)
        g_img = _run_tiled_transpose(g32, args[1], args[2], radius,
                                     interpret, tr)
        g_disp = jnp.stack([g32 * ddy, g32 * ddx], axis=1)
        return g_img.astype(img.dtype), g_disp.astype(disp.dtype)
    fused_ok, _ = _unroll_plan(h, w, radius, n_lists=2)
    if fused_ok:
        g_img, g_dy, g_dx = _run_fused_bwd(args + (g32,), radius, interpret)
        g_disp = jnp.stack([g_dy, g_dx], axis=1)
    else:
        ddy = _run(_tap_kernel, args, radius, interpret, mode="ddy")
        ddx = _run(_tap_kernel, args, radius, interpret, mode="ddx")
        g_img = _run(_transpose_kernel, (g32, args[1], args[2]), radius, interpret)
        g_disp = jnp.stack([g32 * ddy, g32 * ddx], axis=1)
    return g_img.astype(img.dtype), g_disp.astype(disp.dtype)


_banded_warp_nhw.defvjp(_banded_fwd, _banded_bwd)


def bilinear_warp_banded(img: jnp.ndarray, disp: jnp.ndarray,
                         radius: int = DEFAULT_RADIUS,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for `cardiax.ops.warp.bilinear_warp` for bounded
    displacements (|disp| clamped to radius-1 px).

    img  (..., H, W); disp (..., 2, H, W). Uses the Pallas kernel on TPU,
    interpreter mode when forced, else the XLA-gather fallback.
    """
    if interpret is None:
        h, w = img.shape[-2:]
        if warp_plan(h, w, radius) == "xla_gather":
            if jax.default_backend() == "tpu":
                _warn_fallback_once(
                    f"banded warp ({h}x{w}, r={radius})",
                    "the XLA-gather warp: frame exceeds VMEM and no tile "
                    "row count divides H")
            from cardiax.ops.warp import bilinear_warp
            return bilinear_warp(img, disp)
        interpret = False
    elif img.shape[-2] * img.shape[-1] > _MAX_FULL_WARP_PIXELS \
            and _tile_plan(img.shape[-2], img.shape[-1], radius) is None:
        from cardiax.ops.warp import bilinear_warp
        return bilinear_warp(img, disp)
    img_flat = img.reshape((-1,) + img.shape[-2:])
    disp_flat = disp.reshape((-1, 2) + disp.shape[-2:])
    if disp_flat.shape[0] == 1 and img_flat.shape[0] != 1:
        disp_flat = jnp.broadcast_to(
            disp_flat, (img_flat.shape[0],) + disp_flat.shape[1:])
    out = _banded_warp_nhw(img_flat, disp_flat, radius, interpret)
    return out.reshape(img.shape).astype(img.dtype)
