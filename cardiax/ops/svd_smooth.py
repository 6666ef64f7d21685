"""Rank-k smoothing of strain matrices (SVD denoise).

Capability parity with reference modules/data/utils/DENSE_utils.py:11-14
(``SVDDenoise``) and the strain net's configured smoothing
(configs/config.json:113-114: method "SVD", rank 5).

Two paths:
  * ``svd_denoise``        — exact truncated SVD (host/numpy or small jnp);
  * ``subspace_denoise``   — differentiable randomized subspace iteration,
    the TPU-friendly version used INSIDE the jitted train step (QR + matmuls
    only: MXU work, stable reverse-mode gradients, no divergence on repeated
    singular values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def svd_denoise(x, rank: int = 3):
    """Exact rank-``rank`` reconstruction of (..., S, T) matrices."""
    if isinstance(x, np.ndarray):
        u, s, vt = np.linalg.svd(x, full_matrices=False)
        s = s.copy()
        s[..., rank:] = 0.0
        return (u * s[..., None, :]) @ vt
    u, s, vt = jnp.linalg.svd(x, full_matrices=False)
    s = s.at[..., rank:].set(0.0)
    return (u * s[..., None, :]) @ vt


def _safe_orth(y: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Near-orthonormal basis of the columns of y (..., n, r), differentiable
    EVERYWHERE — including rank-deficient and zero inputs.

    QR's reverse-mode gradient divides by diag(R) and NaNs the moment the
    input loses rank (which happens by construction at init: a zero-motion
    video gives a rank-1 strain matrix). Instead orthogonalize via a ridge
    Cholesky whiten: Q = y L^{-T} with L L^T = y^T y + eps*scale*I. The ridge
    bounds the backward pass; the basis error is O(eps) and irrelevant for a
    smoothing projector.
    """
    gram = jnp.swapaxes(y, -1, -2) @ y                       # (..., r, r)
    r = gram.shape[-1]
    scale = jnp.trace(gram, axis1=-2, axis2=-1)[..., None, None] / r
    ridge = (eps * scale + 1e-10) * jnp.eye(r, dtype=y.dtype)
    chol = jnp.linalg.cholesky(gram + ridge)                  # lower L
    # Q = y @ inv(L)^T  via triangular solve on the right
    inv_lt = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(jnp.eye(r, dtype=y.dtype), chol.shape), lower=True)
    return y @ jnp.swapaxes(inv_lt, -1, -2)


def subspace_denoise(x: jnp.ndarray, rank: int = 5, n_iters: int = 4) -> jnp.ndarray:
    """Differentiable low-rank projection via subspace (power) iteration.

    x (..., S, T). Builds an orthonormal basis Q of the top-``rank`` column
    space of x and returns Q Q^T x. Deterministic start (fixed PRNG at trace
    time). Exact when x has rank <= ``rank``; otherwise converges to the
    dominant subspace like randomized SVD. Safe to differentiate at ANY input
    rank (see `_safe_orth`).
    """
    omega = jax.random.normal(jax.random.PRNGKey(0), (x.shape[-1], rank), x.dtype)
    q = _safe_orth(x @ omega)                          # (..., S, r)

    def body(q, _):
        z = jnp.swapaxes(x, -1, -2) @ q                # (..., T, r)
        qz = _safe_orth(z)
        q_new = _safe_orth(x @ qz)                     # (..., S, r)
        return q_new, None

    q, _ = jax.lax.scan(body, q, None, length=n_iters)
    return q @ (jnp.swapaxes(q, -1, -2) @ x)
