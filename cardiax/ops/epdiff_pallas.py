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

Replaces: lagomorph's fused CUDA EPDiff/adjoint kernels (SURVEY.md 2.12).
Numerical parity with the composite JAX path is test-pinned fwd and grad
(`tests/test_ops.py:TestFusedEPDiffStep`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cardiax.ops.warp_pallas import (_MAX_VMEM_PIXELS, _coords, _dhat, _hat,
                                     _shifted)


def _row_iota(h, w):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)


def _col_iota(h, w):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)


def _dy(f, h, w):
    """Central d/dy with one-sided borders (== shooting._grad_hw rows)."""
    up = pltpu.roll(f, -1 % h, axis=0)       # row i -> f(i+1)
    dn = pltpu.roll(f, 1, axis=0)            # row i -> f(i-1)
    ii = _row_iota(h, w)
    mid = 0.5 * (up - dn)
    return jnp.where(ii == 0, up - f, jnp.where(ii == h - 1, f - dn, mid))


def _dx(f, h, w):
    up = pltpu.roll(f, -1 % w, axis=1)
    dn = pltpu.roll(f, 1, axis=1)
    jj = _col_iota(h, w)
    mid = 0.5 * (up - dn)
    return jnp.where(jj == 0, up - f, jnp.where(jj == w - 1, f - dn, mid))


def _dyT(g, h, w):
    """Exact transpose of `_dy` (columns of the stencil matrix):
    j=0: -g0 - g1/2 ; j=1: g0 - g2/2 ; interior: (g_{j-1} - g_{j+1})/2 ;
    j=n-2: g_{n-3}/2 - g_{n-1} ; j=n-1: g_{n-2}/2 + g_{n-1}."""
    up = pltpu.roll(g, -1 % h, axis=0)       # g(j+1)
    dn = pltpu.roll(g, 1, axis=0)            # g(j-1)
    ii = _row_iota(h, w)
    base = 0.5 * (dn - up)
    out = jnp.where(ii == 0, -g - 0.5 * up, base)
    out = jnp.where(ii == 1, base + 0.5 * dn, out)
    out = jnp.where(ii == h - 2, base - 0.5 * up, out)
    return jnp.where(ii == h - 1, 0.5 * dn + g, out)


def _dxT(g, h, w):
    up = pltpu.roll(g, -1 % w, axis=1)
    dn = pltpu.roll(g, 1, axis=1)
    jj = _col_iota(h, w)
    base = 0.5 * (dn - up)
    out = jnp.where(jj == 0, -g - 0.5 * up, base)
    out = jnp.where(jj == 1, base + 0.5 * dn, out)
    out = jnp.where(jj == w - 2, base - 0.5 * up, out)
    return jnp.where(jj == w - 1, 0.5 * dn + g, out)


def _ad_star_planes(vy, vx, my, mx, h, w):
    """The 8 derivative planes + ad* components (matches shooting.ad_star)."""
    dvy_dy, dvy_dx = _dy(vy, h, w), _dx(vy, h, w)
    dvx_dy, dvx_dx = _dy(vx, h, w), _dx(vx, h, w)
    dmy_dy, dmy_dx = _dy(my, h, w), _dx(my, h, w)
    dmx_dy, dmx_dx = _dy(mx, h, w), _dx(mx, h, w)
    div = dvy_dy + dvx_dx
    a_y = dvy_dy * my + dvx_dy * mx + dmy_dy * vy + dmy_dx * vx + my * div
    a_x = dvy_dx * my + dvx_dx * mx + dmx_dy * vy + dmx_dx * vx + mx * div
    return (a_y, a_x, dvy_dy, dvy_dx, dvx_dy, dvx_dx,
            dmy_dy, dmy_dx, dmx_dy, dmx_dx, div)


def _warp_weights(by, bx, h, w, radius):
    ii, jj, y0, y1, fy, x0, x1, fx, my, mx = _coords(by, bx, h, w, radius)
    wys = [_hat(ii + d, y0, y1, fy) for d in range(-radius, radius + 1)]
    dwys = [_dhat(ii + d, y0, y1) for d in range(-radius, radius + 1)]
    return ii, jj, x0, x1, fx, my, mx, wys, dwys


def _fwd_kernel(v_ref, m_ref, u_ref, mo_ref, uo_ref, *, radius: int,
                dt: float):
    h, w = v_ref.shape[-2:]
    vy, vx = v_ref[0], v_ref[1]
    my_f, mx_f = m_ref[0], m_ref[1]
    a_y, a_x = _ad_star_planes(vy, vx, my_f, mx_f, h, w)[:2]
    mo_ref[0] = my_f - dt * a_y
    mo_ref[1] = mx_f - dt * a_x
    # semi-Lagrangian: u'(x) = b(x) + u(x + b(x)), b = -dt v
    by, bx = -dt * vy, -dt * vx
    _, jj, x0, x1, fx, _, _, wys, _ = _warp_weights(by, bx, h, w, radius)
    us = [u_ref[0], u_ref[1]]
    accs = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
    for e in range(-radius, radius + 1):
        wx = _hat(jj + e, x0, x1, fx)
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
                gv_ref, gm_ref, gu_ref, *, radius: int, dt: float):
    h, w = v_ref.shape[-2:]
    vy, vx = v_ref[0], v_ref[1]
    my_f, mx_f = m_ref[0], m_ref[1]
    (_, _, dvy_dy, dvy_dx, dvx_dy, dvx_dx,
     dmy_dy, dmy_dx, dmx_dy, dmx_dx, div) = _ad_star_planes(
        vy, vx, my_f, mx_f, h, w)
    gmy, gmx = gmo_ref[0], gmo_ref[1]
    guy, gux = guo_ref[0], guo_ref[1]

    # --- warp adjoint: u' = b + warp(u, b) -------------------------------
    by, bx = -dt * vy, -dt * vx
    ii, jj, x0, x1, fx, wmy, wmx, wys, dwys = _warp_weights(
        by, bx, h, w, radius)
    us = [u_ref[0], u_ref[1]]
    gs = [guy, gux]
    acc_dy = jnp.zeros((h, w), jnp.float32)
    acc_dx = jnp.zeros((h, w), jnp.float32)
    acc_gu = [jnp.zeros((h, w), jnp.float32) for _ in range(2)]
    for e in range(-radius, radius + 1):
        rx = jj + e
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
    gv_y = (_dyT(2.0 * a_y * my_f + a_x * mx_f, h, w)
            + _dxT(a_x * my_f, h, w)
            + a_y * dmy_dy + a_x * dmx_dy
            - dt * g_by)
    gv_x = (_dyT(a_y * mx_f, h, w)
            + _dxT(a_y * my_f + 2.0 * a_x * mx_f, h, w)
            + a_y * dmy_dx + a_x * dmx_dx
            - dt * g_bx)
    gm_y = (gmy + a_y * (dvy_dy + div) + a_x * dvy_dx
            + _dyT(a_y * vy, h, w) + _dxT(a_y * vx, h, w))
    gm_x = (gmx + a_y * dvx_dy + a_x * (dvx_dx + div)
            + _dyT(a_x * vy, h, w) + _dxT(a_x * vx, h, w))
    gv_ref[0] = gv_y
    gv_ref[1] = gv_x
    gm_ref[0] = gm_y
    gm_ref[1] = gm_x


def _specs(h, w):
    return pl.BlockSpec((None, 2, h, w), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def epdiff_step(v, m, u, dt: float, radius: int, interpret: bool):
    """(v, m, u) (N, 2, H, W) -> (m - dt*ad*_v m, -dt*v + warp(u, -dt*v))."""
    n, _, h, w = v.shape
    spec = _specs(h, w)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_fwd_kernel, radius=radius, dt=float(dt)),
        grid=(n,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(v.shape, f32),) * 2,
        interpret=interpret,
    )(v.astype(f32), m.astype(f32), u.astype(f32))


def _step_fwd(v, m, u, dt, radius, interpret):
    return epdiff_step(v, m, u, dt, radius, interpret), (v, m, u)


def _step_bwd(dt, radius, interpret, res, cot):
    v, m, u = res
    gmo, guo = cot
    n, _, h, w = v.shape
    spec = _specs(h, w)
    f32 = jnp.float32
    gv, gm, gu = pl.pallas_call(
        functools.partial(_bwd_kernel, radius=radius, dt=float(dt)),
        grid=(n,),
        in_specs=[spec] * 5,
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct(v.shape, f32),) * 3,
        interpret=interpret,
    )(v.astype(f32), m.astype(f32), u.astype(f32),
      gmo.astype(f32), guo.astype(f32))
    return gv.astype(v.dtype), gm.astype(m.dtype), gu.astype(u.dtype)


epdiff_step.defvjp(_step_fwd, _step_bwd)


def epdiff_step_reference(v, m, u, dt: float):
    """Composite-JAX reference of the fused step (exact XLA-gather warp)."""
    from cardiax.ops.shooting import ad_star
    from cardiax.ops.warp import warp_vector_field
    b = -dt * v
    u_new = b + warp_vector_field(u, b)
    m_new = m - dt * ad_star(v, m)
    return m_new, u_new


def fused_step_supported(h: int, w: int) -> bool:
    """Full-frame VMEM blocks only (the shooting grid is always small)."""
    return h * w <= _MAX_VMEM_PIXELS
