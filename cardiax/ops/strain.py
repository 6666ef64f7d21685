"""Displacement -> 126-sector circumferential strain assembly (on-device).

The reference obtains ground-truth strain from MATLAB DENSE meshes
(spl2patchSA / getStrainMatFull, modules/data/utils/DENSE_utils.py:177-324)
and PREDICTED strain from a learned head. This op is the analytic on-device
path: given Lagrangian displacement fields and the frame-0 myocardium mask it
computes the Green-Lagrange circumferential strain E_cc per angular sector —
the north-star fused pipeline (BASELINE.json), and a physics prior usable as
an auxiliary supervision signal.

TPU-first: the per-sector reduction is ONE (S, H*W) x (H*W, T) matmul (MXU),
not a scatter; all geometry (centroid, sector ids, tangent directions) is
computed from the inputs inside jit with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cardiax.ops.shooting import _grad_hw


def mask_centroid(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centroid (cy, cx) of a (H, W) mask (safe for empty masks)."""
    h, w = mask.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    total = jnp.maximum(mask.sum(), 1e-6)
    return (yy * mask).sum() / total, (xx * mask).sum() / total


def sector_matrix(mask: jnp.ndarray, n_sectors: int = 126) -> jnp.ndarray:
    """(S, H*W) soft assignment: pixel -> angular sector, masked by myocardium.

    Sector 0 starts at angle -pi (matching the arctan2 convention used by the
    synthetic generator and the angular sector-roll augmentation semantics).
    """
    h, w = mask.shape
    cy, cx = mask_centroid(mask)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    theta = jnp.arctan2(yy - cy, xx - cx)                    # (-pi, pi]
    sec = jnp.floor((theta + jnp.pi) / (2 * jnp.pi) * n_sectors)
    sec = jnp.clip(sec, 0, n_sectors - 1).astype(jnp.int32).reshape(-1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n_sectors, h * w), 0)
    onehot = (ids == sec[None, :]).astype(jnp.float32)
    return onehot * mask.reshape(1, -1)


def circumferential_strain(disp: jnp.ndarray, mask: jnp.ndarray,
                           n_sectors: int = 126) -> jnp.ndarray:
    """Sector-wise Green-Lagrange circumferential strain.

    disp (2, T, H, W): Lagrangian displacement [dy, dx] of material points of
                       frame 0 at each frame t;
    mask (H, W):       frame-0 myocardium mask;
    returns (S, T) strain matrix.
    """
    two, t, h, w = disp.shape
    cy, cx = mask_centroid(mask)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    theta = jnp.arctan2(yy - cy, xx - cx)
    # circumferential (tangential) unit vector e_c = (-sin, cos) in (y, x)
    ey = jnp.cos(theta)
    ex = -jnp.sin(theta)

    uy, ux = disp[0], disp[1]                                 # (T, H, W)
    duy_dy, duy_dx = _grad_hw(uy)
    dux_dy, dux_dx = _grad_hw(ux)
    # Green-Lagrange E = 0.5 (Du + Du^T + Du^T Du)
    e_yy = duy_dy + 0.5 * (duy_dy ** 2 + dux_dy ** 2)
    e_xx = dux_dx + 0.5 * (duy_dx ** 2 + dux_dx ** 2)
    e_yx = 0.5 * (duy_dx + dux_dy + duy_dy * duy_dx + dux_dy * dux_dx)
    # project: E_cc = e^T E e
    ecc = (e_yy * ey ** 2 + 2.0 * e_yx * ey * ex + e_xx * ex ** 2)  # (T, H, W)

    sec_mat = sector_matrix(mask, n_sectors)                  # (S, H*W)
    counts = jnp.maximum(sec_mat.sum(axis=1, keepdims=True), 1e-6)
    vals = ecc.reshape(t, -1).T                               # (H*W, T)
    return (sec_mat @ vals) / counts                          # (S, T)


def strain_matrix_from_displacements(disp: jnp.ndarray, mask0: jnp.ndarray,
                                     n_sectors: int = 126) -> jnp.ndarray:
    """Batched: disp (B, 2, T, H, W), mask0 (B, H, W) -> (B, S, T)."""
    return jax.vmap(lambda d, m: circumferential_strain(d, m, n_sectors))(disp, mask0)
