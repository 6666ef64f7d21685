"""Dense image warping (bilinear grid sample) — the TPU analog of lagomorph's
CUDA ``interp`` (SURVEY.md section 2.12).

``bilinear_warp(img, disp)`` samples ``img`` at ``x + disp(x)`` with bilinear
interpolation and edge clamping. Fully differentiable w.r.t. both image and
displacement (the backward pass is the autodiff transpose of the gather +
linear weights — XLA fuses it into the shooting graph).

Implementation: flattened advanced-indexing gather. The four corner gathers
compile to XLA ``gather`` ops; all shapes static. A Pallas tiled variant
can slot in behind the same signature once profiling shows the gather to be
the bottleneck (the conv-heavy momentum UNet usually dominates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img (H, W), iy/ix int32 (H, W) -> img[iy, ix] via flat take."""
    h, w = img.shape
    flat = img.reshape(-1)
    idx = iy * w + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(iy.shape)


def _warp_single(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """img (H, W), disp (2, H, W) [dy, dx] in pixels -> warped (H, W)."""
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cy = yy + disp[0]
    cx = xx + disp[1]
    cy = jnp.clip(cy, 0.0, h - 1.0)
    cx = jnp.clip(cx, 0.0, w - 1.0)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    wy = cy - y0
    wx = cx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    v00 = _gather_hw(img, y0i, x0i)
    v01 = _gather_hw(img, y0i, x1i)
    v10 = _gather_hw(img, y1i, x0i)
    v11 = _gather_hw(img, y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_warp(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Warp with arbitrary leading batch dims.

    img  (..., H, W)       — any number of leading axes
    disp (..., 2, H, W)    — displacement [dy, dx] in pixel units
    returns img sampled at identity + disp, same shape as img.
    """
    img_flat = img.reshape((-1,) + img.shape[-2:])
    disp_flat = disp.reshape((-1, 2) + disp.shape[-2:])
    if img_flat.shape[0] == disp_flat.shape[0]:
        out = jax.vmap(_warp_single)(img_flat, disp_flat)
    elif disp_flat.shape[0] == 1:
        out = jax.vmap(lambda im: _warp_single(im, disp_flat[0]))(img_flat)
    else:
        raise ValueError(f"batch mismatch: img {img.shape} vs disp {disp.shape}")
    return out.reshape(img.shape)


def warp_vector_field(field: jnp.ndarray, disp: jnp.ndarray,
                      warp_fn=None) -> jnp.ndarray:
    """Warp each channel of a (..., C, H, W) field by the same (..., 2, H, W)
    displacement (used for composing deformations in shooting)."""
    wf = warp_fn or bilinear_warp
    c = field.shape[-3]
    stacked = jnp.moveaxis(field, -3, 0)            # (C, ..., H, W)
    out = jnp.stack([wf(stacked[i], disp) for i in range(c)], axis=0)
    return jnp.moveaxis(out, 0, -3)


def compose_displacements(u_outer: jnp.ndarray, u_inner: jnp.ndarray,
                          warp_fn=None) -> jnp.ndarray:
    """Displacement of the composition (id + u_outer) o (id + u_inner):
    u(x) = u_inner(x) + u_outer(x + u_inner(x))."""
    return u_inner + warp_vector_field(u_outer, u_inner, warp_fn)
