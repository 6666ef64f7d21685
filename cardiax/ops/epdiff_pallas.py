"""Fused EPDiff step kernel: one Pallas pass per Euler step (+ one for its VJP).

The shooting scan's per-step work splits into (a) the fluid-metric solve
v = K m — a real-DFT MATMUL that XLA already runs at MXU speed
(`fluid_metric._helmholtz_mm`) — and (b) a swarm of pointwise/stencil ops:
eight central-difference derivative planes, the ~15 products of the coadjoint
ad*_v m, the semi-Lagrangian banded warp of the 2-channel inverse map, and
the Euler updates. Under autodiff, (b) lowers to dozens of separate loop
fusions and Pallas warp calls per step whose HBM round trips dominate the
scan (~9 ms of a 25 ms train step at flagship shapes).

This module fuses all of (b) into ONE forward kernel and ONE hand-derived
backward kernel per step:

    fwd:  (v, m, u) -> (m - dt*ad*_v m,  b + warp(u, b)),   b = -dt*v
    bwd:  (v, m, u, gm', gu') -> (g_v, g_m, g_u)

with derivative planes recomputed in-kernel by circular rolls + one-sided
border fixes (exactly `shooting._grad_hw`'s stencil), the warp as the banded
tap sweep of `warp_pallas` (radius 3 suffices in-scan: per-step
displacements are sub-pixel — see STATUS.md "Measured warp bands"), and the
ad* adjoints derived analytically:

    g_vy = DyT(2 ay my + ax mx) + DxT(ax my) + ay dmy_dy + ax dmx_dy - dt g_by
    g_vx = DyT(ay mx) + DxT(ay my + 2 ax mx) + ay dmy_dx + ax dmx_dx - dt g_bx
    g_my = gm'_y + ay (dvy_dy + div) + ax dvy_dx + DyT(ay vy) + DxT(ay vx)
    g_mx = gm'_x + ay dvx_dy + ax (dvx_dx + div) + DyT(ax vy) + DxT(ax vx)

where (ay, ax) = -dt * gm' is the ad* cotangent and DyT/DxT are the exact
transposes of the one-sided-border central difference. The chain across the
n_steps Euler steps (and the K-solve transposes) stays in autodiff: v = K m
remains an XLA einsum, so its cotangent g_m += K g_v comes for free from the
self-adjoint matmul.

LANE PACKING: a (64, 64) f32 plane fills only half of the VPU's native
(8, 128) tile, so every op on the flagship's 64^2 shooting grid wastes half
the lanes. `pack_items` lays a (PR, PC) grid of INDEPENDENT batch items
into one (PR*H, PC*W) plane; all stencil/tap code uses per-item LOCAL
row/col indices, so cross-item wraparound lands exactly where the one-sided
borders / clamped hat weights already contribute zero — the same argument
that makes circular rolls valid at frame borders. With 2x2 packing the
kernels run on full (128, 128) tiles and the packed fluid-metric solve
(`fluid_metric.sharp_packed`) contracts over block-diagonal 128-wide bases,
filling the MXU. Items pad to a multiple of PR*PC with zero momentum
(zero dynamics, sliced off afterwards).

Replaces: lagomorph's fused CUDA EPDiff/adjoint kernels (SURVEY.md 2.12).
Numerical parity with the composite JAX path is test-pinned fwd and grad
(`tests/test_ops.py:TestFusedEPDiffStep`), packed == unpacked included.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cardiax.ops.warp_pallas import _dhat, _hat, _shifted


def _local_iotas(shape, h_item: int, w_item: int):
    """Per-item (local) integer row/col indices on a packed plane."""
    h, w = shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if h_item != h:
        ii = jax.lax.rem(ii, h_item)
    if w_item != w:
        jj = jax.lax.rem(jj, w_item)
    return ii, jj


def _dy(f, ii, h_item):
    """Central d/dy with one-sided borders per item (== shooting._grad_hw)."""
    h = f.shape[0]
    up = pltpu.roll(f, (-1) % h, axis=0)     # row i -> f(i+1)
    dn = pltpu.roll(f, 1, axis=0)            # row i -> f(i-1)
    mid = 0.5 * (up - dn)
    return jnp.where(ii == 0, up - f, jnp.where(ii == h_item - 1, f - dn, mid))


def _dx(f, jj, w_item):
    w = f.shape[1]
    up = pltpu.roll(f, (-1) % w, axis=1)
    dn = pltpu.roll(f, 1, axis=1)
    mid = 0.5 * (up - dn)
    return jnp.where(jj == 0, up - f, jnp.where(jj == w_item - 1, f - dn, mid))


def _dyT(g, ii, h_item):
    """Exact transpose of `_dy` (columns of the stencil matrix):
    j=0: -g0 - g1/2 ; j=1: g0 - g2/2 ; interior: (g_{j-1} - g_{j+1})/2 ;
    j=n-2: g_{n-3}/2 - g_{n-1} ; j=n-1: g_{n-2}/2 + g_{n-1}."""
    h = g.shape[0]
    up = pltpu.roll(g, (-1) % h, axis=0)     # g(j+1)
    dn = pltpu.roll(g, 1, axis=0)            # g(j-1)
    base = 0.5 * (dn - up)
    out = jnp.where(ii == 0, -g - 0.5 * up, base)
    out = jnp.where(ii == 1, base + 0.5 * dn, out)
    out = jnp.where(ii == h_item - 2, base - 0.5 * up, out)
    return jnp.where(ii == h_item - 1, 0.5 * dn + g, out)


def _dxT(g, jj, w_item):
    w = g.shape[1]
    up = pltpu.roll(g, (-1) % w, axis=1)
    dn = pltpu.roll(g, 1, axis=1)
    base = 0.5 * (dn - up)
    out = jnp.where(jj == 0, -g - 0.5 * up, base)
    out = jnp.where(jj == 1, base + 0.5 * dn, out)
    out = jnp.where(jj == w_item - 2, base - 0.5 * up, out)
    return jnp.where(jj == w_item - 1, 0.5 * dn + g, out)


def _deriv_planes(vy, vx, my, mx, ii, jj, h_item, w_item):
    dvy_dy, dvy_dx = _dy(vy, ii, h_item), _dx(vy, jj, w_item)
    dvx_dy, dvx_dx = _dy(vx, ii, h_item), _dx(vx, jj, w_item)
    dmy_dy, dmy_dx = _dy(my, ii, h_item), _dx(my, jj, w_item)
    dmx_dy, dmx_dx = _dy(mx, ii, h_item), _dx(mx, jj, w_item)
    div = dvy_dy + dvx_dx
    return (dvy_dy, dvy_dx, dvx_dy, dvx_dx,
            dmy_dy, dmy_dx, dmx_dy, dmx_dx, div)


def _coords_local(by, bx, ii, jj, h_item, w_item, radius):
    """Clamped sample coordinates + bilinear pieces with LOCAL indices: the
    wrap-gets-zero-weight argument of warp_pallas holds per item."""
    fi = ii.astype(jnp.float32)
    fj = jj.astype(jnp.float32)
    r = float(radius - 1)
    cy = jnp.clip(fi + jnp.clip(by, -r, r), 0.0, h_item - 1.0)
    cx = jnp.clip(fj + jnp.clip(bx, -r, r), 0.0, w_item - 1.0)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    y1 = jnp.minimum(y0 + 1.0, h_item - 1.0)
    x1 = jnp.minimum(x0 + 1.0, w_item - 1.0)
    my = jnp.where((jnp.abs(by) <= r) & (fi + by >= 0.0)
                   & (fi + by <= h_item - 1.0), 1.0, 0.0)
    mx = jnp.where((jnp.abs(bx) <= r) & (fj + bx >= 0.0)
                   & (fj + bx <= w_item - 1.0), 1.0, 0.0)
    return fi, fj, y0, y1, fy, x0, x1, fx, my, mx


def _warp_weights(by, bx, ii, jj, h_item, w_item, radius):
    fi, fj, y0, y1, fy, x0, x1, fx, my, mx = _coords_local(
        by, bx, ii, jj, h_item, w_item, radius)
    wys = [_hat(fi + d, y0, y1, fy) for d in range(-radius, radius + 1)]
    dwys = [_dhat(fi + d, y0, y1) for d in range(-radius, radius + 1)]
    return fj, x0, x1, fx, my, mx, wys, dwys


def _fwd_kernel(v_ref, m_ref, u_ref, mo_ref, uo_ref, *, radius: int,
                dt: float, h_item: int, w_item: int):
    h, w = v_ref.shape[-2:]
    ii, jj = _local_iotas((h, w), h_item, w_item)
    vy, vx = v_ref[0], v_ref[1]
    my_f, mx_f = m_ref[0], m_ref[1]
    (dvy_dy, dvy_dx, dvx_dy, dvx_dx,
     dmy_dy, dmy_dx, dmx_dy, dmx_dx, div) = _deriv_planes(
        vy, vx, my_f, mx_f, ii, jj, h_item, w_item)
    a_y = dvy_dy * my_f + dvx_dy * mx_f + dmy_dy * vy + dmy_dx * vx \
        + my_f * div
    a_x = dvy_dx * my_f + dvx_dx * mx_f + dmx_dy * vy + dmx_dx * vx \
        + mx_f * div
    mo_ref[0] = my_f - dt * a_y
    mo_ref[1] = mx_f - dt * a_x
    # semi-Lagrangian: u'(x) = b(x) + u(x + b(x)), b = -dt v
    by, bx = -dt * vy, -dt * vx
    fj, x0, x1, fx, _, _, wys, _ = _warp_weights(
        by, bx, ii, jj, h_item, w_item, radius)
    us = [u_ref[0], u_ref[1]]
    accs = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
    for e in range(-radius, radius + 1):
        wx = _hat(fj + e, x0, x1, fx)
        ss = [_shifted(uc, 0, e) for uc in us]
        bs = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
        for d in range(-radius, radius + 1):
            wy = wys[d + radius]
            for c in range(2):
                bs[c] = bs[c] + wy * _shifted(ss[c], d, 0)
        for c in range(2):
            accs[c] = accs[c] + wx * bs[c]
    uo_ref[0] = by + accs[0]
    uo_ref[1] = bx + accs[1]


def _bwd_kernel(v_ref, m_ref, u_ref, gmo_ref, guo_ref,
                gv_ref, gm_ref, gu_ref, *, radius: int, dt: float,
                h_item: int, w_item: int):
    h, w = v_ref.shape[-2:]
    ii, jj = _local_iotas((h, w), h_item, w_item)
    vy, vx = v_ref[0], v_ref[1]
    my_f, mx_f = m_ref[0], m_ref[1]
    (dvy_dy, dvy_dx, dvx_dy, dvx_dx,
     dmy_dy, dmy_dx, dmx_dy, dmx_dx, div) = _deriv_planes(
        vy, vx, my_f, mx_f, ii, jj, h_item, w_item)
    gmy, gmx = gmo_ref[0], gmo_ref[1]
    guy, gux = guo_ref[0], guo_ref[1]

    # --- warp adjoint: u' = b + warp(u, b) -------------------------------
    by, bx = -dt * vy, -dt * vx
    fj, x0, x1, fx, wmy, wmx, wys, dwys = _warp_weights(
        by, bx, ii, jj, h_item, w_item, radius)
    us = [u_ref[0], u_ref[1]]
    gs = [guy, gux]
    acc_dy = jnp.zeros((h, w), jnp.float32)
    acc_dx = jnp.zeros((h, w), jnp.float32)
    acc_gu = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
    for e in range(-radius, radius + 1):
        rx = fj + e
        wx = _hat(rx, x0, x1, fx)
        dwx = _dhat(rx, x0, x1)
        for c in range(2):
            s = _shifted(us[c], 0, e)
            a_e = gs[c] * wx
            b_e = jnp.zeros((h, w), jnp.float32)
            acc_v = jnp.zeros((h, w), jnp.float32)
            acc_d = jnp.zeros((h, w), jnp.float32)
            for d in range(-radius, radius + 1):
                sh = _shifted(s, d, 0)
                acc_v = acc_v + wys[d + radius] * sh
                acc_d = acc_d + dwys[d + radius] * sh
                b_e = b_e + _shifted(wys[d + radius] * a_e, -d, 0)
            acc_dy = acc_dy + (wx * gs[c]) * acc_d
            acc_dx = acc_dx + (dwx * gs[c]) * acc_v
            acc_gu[c] = acc_gu[c] + _shifted(b_e, 0, -e)
    gu_ref[0] = acc_gu[0]
    gu_ref[1] = acc_gu[1]
    g_by = guy + acc_dy * wmy          # d/d b = direct + through the warp
    g_bx = gux + acc_dx * wmx

    # --- ad* adjoint (cotangent a = -dt * gm') ---------------------------
    a_y = -dt * gmy
    a_x = -dt * gmx
    gv_y = (_dyT(2.0 * a_y * my_f + a_x * mx_f, ii, h_item)
            + _dxT(a_x * my_f, jj, w_item)
            + a_y * dmy_dy + a_x * dmx_dy
            - dt * g_by)
    gv_x = (_dyT(a_y * mx_f, ii, h_item)
            + _dxT(a_y * my_f + 2.0 * a_x * mx_f, jj, w_item)
            + a_y * dmy_dx + a_x * dmx_dx
            - dt * g_bx)
    gm_y = (gmy + a_y * (dvy_dy + div) + a_x * dvy_dx
            + _dyT(a_y * vy, ii, h_item) + _dxT(a_y * vx, jj, w_item))
    gm_x = (gmx + a_y * dvx_dy + a_x * (dvx_dx + div)
            + _dyT(a_x * vy, ii, h_item) + _dxT(a_x * vx, jj, w_item))
    gv_ref[0] = gv_y
    gv_ref[1] = gv_x
    gm_ref[0] = gm_y
    gm_ref[1] = gm_x


def _specs(h, w):
    return pl.BlockSpec((None, 2, h, w), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------- #
# Fused spectral solve: v = K m as MXU matmuls INSIDE the step kernel          #
# --------------------------------------------------------------------------- #
#
# At integration-grid sizes the solve is a real-DFT matmul sandwich
# (fluid_metric._helmholtz_mm): v = Ty^T [ (Ty m Tx^T) * W ] Tx. Keeping it
# in XLA costs ~2 plane-sized HBM round trips per Euler step between the
# einsum chain and this kernel (VERDICT r4 #4; lagomorph's CUDA EPDiff also
# fuses its metric into the step). Executing the four (plane, plane) matmuls
# on the MXU inside the kernel removes those round trips AND the per-step v
# residual: the backward kernel recomputes v = K m from the saved m and
# applies the self-adjoint K to g_v in-kernel (g_m += K g_v).
#
# Engaged only for planes with BOTH sides <= _MAX_SOLVE_SIDE (128): that is
# the _MM_MAX_SIDE regime where the matmul form exists, it bounds the extra
# VMEM (five (S, S) f32 bases = 320 KB at S=128), and it covers the flagship
# (64^2 items lane-packed 2x2 into 128^2 planes, block-diagonal bases).

_MAX_SOLVE_SIDE = 128


def fused_solve_supported(h_plane: int, w_plane: int) -> bool:
    return max(h_plane, w_plane) <= _MAX_SOLVE_SIDE


def _solve_mm(x, ty, txT, tyT, tx, wgt):
    """One (h, w) plane: Ty^T [ (Ty x Tx^T) * W ] Tx, all on the MXU."""
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    a = jnp.dot(ty, x, precision=hi, preferred_element_type=f32)
    a = jnp.dot(a, txT, precision=hi, preferred_element_type=f32) * wgt
    a = jnp.dot(tyT, a, precision=hi, preferred_element_type=f32)
    return jnp.dot(a, tx, precision=hi, preferred_element_type=f32)


def _fwd_solve_kernel(m_ref, u_ref, ty_ref, txT_ref, tyT_ref, tx_ref,
                      wgt_ref, mo_ref, uo_ref, *, radius: int, dt: float,
                      h_item: int, w_item: int):
    h, w = m_ref.shape[-2:]
    ii, jj = _local_iotas((h, w), h_item, w_item)
    my_f, mx_f = m_ref[0], m_ref[1]
    ty, txT, tyT, tx = ty_ref[...], txT_ref[...], tyT_ref[...], tx_ref[...]
    wgt = wgt_ref[...]
    vy = _solve_mm(my_f, ty, txT, tyT, tx, wgt)
    vx = _solve_mm(mx_f, ty, txT, tyT, tx, wgt)
    (dvy_dy, dvy_dx, dvx_dy, dvx_dx,
     dmy_dy, dmy_dx, dmx_dy, dmx_dx, div) = _deriv_planes(
        vy, vx, my_f, mx_f, ii, jj, h_item, w_item)
    a_y = dvy_dy * my_f + dvx_dy * mx_f + dmy_dy * vy + dmy_dx * vx \
        + my_f * div
    a_x = dvy_dx * my_f + dvx_dx * mx_f + dmx_dy * vy + dmx_dx * vx \
        + mx_f * div
    mo_ref[0] = my_f - dt * a_y
    mo_ref[1] = mx_f - dt * a_x
    by, bx = -dt * vy, -dt * vx
    fj, x0, x1, fx, _, _, wys, _ = _warp_weights(
        by, bx, ii, jj, h_item, w_item, radius)
    us = [u_ref[0], u_ref[1]]
    accs = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
    for e in range(-radius, radius + 1):
        wx = _hat(fj + e, x0, x1, fx)
        ss = [_shifted(uc, 0, e) for uc in us]
        bs = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
        for d in range(-radius, radius + 1):
            wy = wys[d + radius]
            for c in range(2):
                bs[c] = bs[c] + wy * _shifted(ss[c], d, 0)
        for c in range(2):
            accs[c] = accs[c] + wx * bs[c]
    uo_ref[0] = by + accs[0]
    uo_ref[1] = bx + accs[1]


def _bwd_solve_kernel(m_ref, u_ref, ty_ref, txT_ref, tyT_ref, tx_ref,
                      wgt_ref, gmo_ref, guo_ref, gm_ref, gu_ref, *,
                      radius: int, dt: float, h_item: int, w_item: int):
    h, w = m_ref.shape[-2:]
    ii, jj = _local_iotas((h, w), h_item, w_item)
    my_f, mx_f = m_ref[0], m_ref[1]
    ty, txT, tyT, tx = ty_ref[...], txT_ref[...], tyT_ref[...], tx_ref[...]
    wgt = wgt_ref[...]
    vy = _solve_mm(my_f, ty, txT, tyT, tx, wgt)   # recompute (no v residual)
    vx = _solve_mm(mx_f, ty, txT, tyT, tx, wgt)
    (dvy_dy, dvy_dx, dvx_dy, dvx_dx,
     dmy_dy, dmy_dx, dmx_dy, dmx_dx, div) = _deriv_planes(
        vy, vx, my_f, mx_f, ii, jj, h_item, w_item)
    gmy, gmx = gmo_ref[0], gmo_ref[1]
    guy, gux = guo_ref[0], guo_ref[1]

    # --- warp adjoint (identical to _bwd_kernel) --------------------------
    by, bx = -dt * vy, -dt * vx
    fj, x0, x1, fx, wmy, wmx, wys, dwys = _warp_weights(
        by, bx, ii, jj, h_item, w_item, radius)
    us = [u_ref[0], u_ref[1]]
    gs = [guy, gux]
    acc_dy = jnp.zeros((h, w), jnp.float32)
    acc_dx = jnp.zeros((h, w), jnp.float32)
    acc_gu = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
    for e in range(-radius, radius + 1):
        rx = fj + e
        wx = _hat(rx, x0, x1, fx)
        dwx = _dhat(rx, x0, x1)
        for c in range(2):
            s = _shifted(us[c], 0, e)
            a_e = gs[c] * wx
            b_e = jnp.zeros((h, w), jnp.float32)
            acc_v = jnp.zeros((h, w), jnp.float32)
            acc_d = jnp.zeros((h, w), jnp.float32)
            for d in range(-radius, radius + 1):
                sh = _shifted(s, d, 0)
                acc_v = acc_v + wys[d + radius] * sh
                acc_d = acc_d + dwys[d + radius] * sh
                b_e = b_e + _shifted(wys[d + radius] * a_e, -d, 0)
            acc_dy = acc_dy + (wx * gs[c]) * acc_d
            acc_dx = acc_dx + (dwx * gs[c]) * acc_v
            acc_gu[c] = acc_gu[c] + _shifted(b_e, 0, -e)
    gu_ref[0] = acc_gu[0]
    gu_ref[1] = acc_gu[1]
    g_by = guy + acc_dy * wmy
    g_bx = gux + acc_dx * wmx

    # --- ad* adjoint + the solve's self-adjoint pullback ------------------
    a_y = -dt * gmy
    a_x = -dt * gmx
    gv_y = (_dyT(2.0 * a_y * my_f + a_x * mx_f, ii, h_item)
            + _dxT(a_x * my_f, jj, w_item)
            + a_y * dmy_dy + a_x * dmx_dy
            - dt * g_by)
    gv_x = (_dyT(a_y * mx_f, ii, h_item)
            + _dxT(a_y * my_f + 2.0 * a_x * mx_f, jj, w_item)
            + a_y * dmy_dx + a_x * dmx_dx
            - dt * g_bx)
    gm_y = (gmy + a_y * (dvy_dy + div) + a_x * dvy_dx
            + _dyT(a_y * vy, ii, h_item) + _dxT(a_y * vx, jj, w_item))
    gm_x = (gmx + a_y * dvx_dy + a_x * (dvx_dx + div)
            + _dyT(a_x * vy, ii, h_item) + _dxT(a_x * vx, jj, w_item))
    # v = K m with K self-adjoint: g_m += K g_v, on the MXU in-kernel
    gm_ref[0] = gm_y + _solve_mm(gv_y, ty, txT, tyT, tx, wgt)
    gm_ref[1] = gm_x + _solve_mm(gv_x, ty, txT, tyT, tx, wgt)


def _mat_spec(n, k):
    return pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def epdiff_step_solve(m, u, ty, txT, tyT, tx, wgt, dt: float, radius: int,
                      interpret: bool, h_item: int = 0, w_item: int = 0):
    """One fused Euler step INCLUDING the spectral solve:

        v = Ty^T [ (Ty m Tx^T) * W ] Tx   (in-kernel MXU matmuls)
        m' = m - dt * ad*_v m
        u' = -dt*v + warp(u, -dt*v)

    (ty, txT, tyT, tx, wgt) come from ``fluid_metric.solve_mm_operands``
    (block-diagonal when the plane is lane-packed). Gradients to the basis
    operands are zero (they are precomputed constants)."""
    n, _, h, w = m.shape
    spec = _specs(h, w)
    f32 = jnp.float32
    kern = functools.partial(_fwd_solve_kernel, radius=radius, dt=float(dt),
                             h_item=h_item or h, w_item=w_item or w)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec, spec, _mat_spec(h, h), _mat_spec(w, w),
                  _mat_spec(h, h), _mat_spec(w, w), _mat_spec(h, w)],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(m.shape, f32),) * 2,
        interpret=interpret,
    )(m.astype(f32), u.astype(f32), ty, txT, tyT, tx, wgt)


def _step_solve_fwd(m, u, ty, txT, tyT, tx, wgt, dt, radius, interpret,
                    h_item=0, w_item=0):
    out = epdiff_step_solve(m, u, ty, txT, tyT, tx, wgt, dt, radius,
                            interpret, h_item, w_item)
    return out, (m, u, ty, txT, tyT, tx, wgt)


def _step_solve_bwd(dt, radius, interpret, h_item, w_item, res, cot):
    m, u, ty, txT, tyT, tx, wgt = res
    gmo, guo = cot
    n, _, h, w = m.shape
    spec = _specs(h, w)
    f32 = jnp.float32
    kern = functools.partial(_bwd_solve_kernel, radius=radius, dt=float(dt),
                             h_item=h_item or h, w_item=w_item or w)
    gm, gu = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec, spec, _mat_spec(h, h), _mat_spec(w, w),
                  _mat_spec(h, h), _mat_spec(w, w), _mat_spec(h, w),
                  spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(m.shape, f32),) * 2,
        interpret=interpret,
    )(m.astype(f32), u.astype(f32), ty, txT, tyT, tx, wgt,
      gmo.astype(f32), guo.astype(f32))
    zeros = tuple(jnp.zeros_like(b) for b in (ty, txT, tyT, tx, wgt))
    return (gm.astype(m.dtype), gu.astype(u.dtype)) + zeros


epdiff_step_solve.defvjp(_step_solve_fwd, _step_solve_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def epdiff_step(v, m, u, dt: float, radius: int, interpret: bool,
                h_item: int = 0, w_item: int = 0):
    """(v, m, u) (N, 2, H, W) -> (m - dt*ad*_v m, -dt*v + warp(u, -dt*v)).

    ``h_item``/``w_item``: per-item plane size when the N axis carries
    lane-packed item grids (`pack_items`); 0 means unpacked (H, W items).
    """
    n, _, h, w = v.shape
    spec = _specs(h, w)
    f32 = jnp.float32
    kern = functools.partial(_fwd_kernel, radius=radius, dt=float(dt),
                             h_item=h_item or h, w_item=w_item or w)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(v.shape, f32),) * 2,
        interpret=interpret,
    )(v.astype(f32), m.astype(f32), u.astype(f32))


def _step_fwd(v, m, u, dt, radius, interpret, h_item=0, w_item=0):
    return epdiff_step(v, m, u, dt, radius, interpret, h_item, w_item), \
        (v, m, u)


def _step_bwd(dt, radius, interpret, h_item, w_item, res, cot):
    v, m, u = res
    gmo, guo = cot
    n, _, h, w = v.shape
    spec = _specs(h, w)
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, radius=radius, dt=float(dt),
                             h_item=h_item or h, w_item=w_item or w)
    gv, gm, gu = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[spec] * 5,
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct(v.shape, f32),) * 3,
        interpret=interpret,
    )(v.astype(f32), m.astype(f32), u.astype(f32),
      gmo.astype(f32), guo.astype(f32))
    return gv.astype(v.dtype), gm.astype(m.dtype), gu.astype(u.dtype)


epdiff_step.defvjp(_step_fwd, _step_bwd)


# --------------------------------------------------------------------------- #
# Item packing                                                                 #
# --------------------------------------------------------------------------- #

def pack_items(x: jnp.ndarray, pr: int, pc: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N/(pr*pc), C, pr*H, pc*W): a (pr, pc) grid of items
    per plane. N must be divisible by pr*pc (pad with zeros first)."""
    n, c, h, w = x.shape
    g = n // (pr * pc)
    x = x.reshape(g, pr, pc, c, h, w)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(g, c, pr * h, pc * w)


def unpack_items(y: jnp.ndarray, pr: int, pc: int) -> jnp.ndarray:
    """Inverse of `pack_items`."""
    g, c, hp, wp = y.shape
    h, w = hp // pr, wp // pc
    y = y.reshape(g, c, pr, h, pc, w)
    return y.transpose(0, 2, 4, 1, 3, 5).reshape(g * pr * pc, c, h, w)


# The fused step kernel (and its VJP) keeps ~10 live (h, w) f32 planes
# (m, v, u, partial sums), far more than the 4-5 of the plain warp kernels.
# MEASURED boundary on v5e — and the probe harness matters:
#   - standalone (tools/probe_scan_boundary.py --force-fused, fwd+bwd, r=8):
#     384x256 planes (98,304 px) compile and run; 448x256, 512x256, 384x384,
#     512x512 crash the Mosaic compile (scoped-VMEM stack).
#   - FULL train step: the standalone boundary does NOT transfer. With the
#     cap raised to 384*256, a 384^2-frame step packed 192^2 grids into
#     384x192 planes and the backward custom-call OOM'd scoped VMEM at
#     25.29M/16M — inside the big program XLA places the kernel's
#     operands/results in VMEM (S(1) memory-space layouts in the error),
#     adding ~5x plane-size bytes the standalone probe (operands in HBM)
#     never pays. 256^2 planes are full-step-proven (flagship packed
#     256x128, bench_large 256^2/512^2 rows, round 3+4).
# So the cap stays at the full-step-proven 256^2; grids beyond take the
# composite per-op scan — exact, just slower. Applies to the PACKED plane
# size too (pack_plan below). Raise only on FULL-step evidence
# (tools/bench_large.py), not the standalone probe.
_MAX_FUSED_SCAN_PIXELS = 256 * 256


def fused_step_supported(h: int, w: int) -> bool:
    """Full-frame VMEM blocks only (the shooting grid is always small)."""
    return h * w <= _MAX_FUSED_SCAN_PIXELS


def pack_plan(n: int, h: int, w: int):
    """(pr, pc, n_pad) maximizing lane/sublane fill: pack pairs along lanes
    until the packed width reaches 128 f32 lanes, and along rows to amortize
    per-op overhead, within the fused kernel's measured plane budget."""
    pr = pc = 1
    while w * pc < 128 and (h * pr) * (w * pc * 2) <= _MAX_FUSED_SCAN_PIXELS:
        pc *= 2
    if (h * pr * 2) * (w * pc) <= _MAX_FUSED_SCAN_PIXELS and h * pr < 256:
        pr *= 2
    n_pad = (-n) % (pr * pc)
    return pr, pc, n_pad


def epdiff_step_reference(v, m, u, dt: float):
    """Composite-JAX reference of the fused step (exact XLA-gather warp)."""
    from cardiax.ops.shooting import ad_star
    from cardiax.ops.warp import warp_vector_field
    b = -dt * v
    u_new = b + warp_vector_field(u, b)
    m_new = m - dt * ad_star(v, m)
    return m_new, u_new
