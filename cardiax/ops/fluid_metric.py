"""Fluid metric: spectral inverse-Helmholtz smoothing K = (gamma - alpha*Lap)^(-s).

The TPU-native replacement for lagomorph's cuFFT fluid metric (SURVEY.md
section 2.12): momentum -> velocity sharping ``v = K m`` and its inverse
``m = L v``, both as real-2D-FFT diagonal operators. The spectral kernel is
built from the DISCRETE 5-point Laplacian eigenvalues

    lam(k) = (2 - 2 cos(2 pi k_y / H)) + (2 - 2 cos(2 pi k_x / W))

so K is exactly the inverse of the finite-difference operator (matching the
discretization lagomorph uses), not the continuum one. Everything is jittable
and differentiable; under jit XLA hoists the (H, W//2+1) kernel to a constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def helmholtz_spectrum(h: int, w: int, alpha: float = 2.0, gamma: float = 1.0,
                       power: int = 2) -> jnp.ndarray:
    """Eigenvalues of L = (gamma - alpha*Laplacian)^power on the rfft2 grid,
    shape (H, W//2+1), float32."""
    ky = jnp.arange(h, dtype=jnp.float32)
    kx = jnp.arange(w // 2 + 1, dtype=jnp.float32)
    lam_y = 2.0 - 2.0 * jnp.cos(2.0 * jnp.pi * ky / h)
    lam_x = 2.0 - 2.0 * jnp.cos(2.0 * jnp.pi * kx / w)
    lam = lam_y[:, None] + lam_x[None, :]
    return (gamma + alpha * lam) ** power


# --- real-DFT matmul path -----------------------------------------------
#
# TPU FFTs lower to custom-calls that are latency-bound at these grid sizes
# (the shooting scan issues ~100 small transforms per step). For H, W up to
# ``_MM_MAX_SIDE`` the same diagonal-in-frequency operators run as dense
# real-DFT matmuls on the MXU instead: measured fwd+bwd on v5e at
# (380, 64, 64) 1.16 -> 0.95 ms and at (380, 128, 128) 1.85 -> 1.08 ms,
# with parity vs the FFT path at 5e-7 relative (einsum precision HIGHEST).
# The 2D spectrum is not separable, but the PROJECTOR onto each (ky, kx)
# mode pair is a tensor product of 1D two-dimensional (cos, sin) projectors,
# so  K = Ty^T [ (Ty x Tx^T) * W ] Tx  with an orthonormal real DFT basis T
# per axis and W[a, b] = spec(freq_y(a), freq_x(b))^-1.

_MM_MAX_SIDE = 128


@functools.lru_cache(maxsize=None)
def _real_dft_basis(n: int):
    """Orthonormal real DFT basis (n, n) float32 + per-row integer frequency.

    Rows: k=0 constant; for 0<k<n/2 a (cos, sin) pair at frequency k; for
    even n a Nyquist alternating row. T @ T^T = I.
    """
    j = np.arange(n)
    rows, freqs = [np.full(n, 1.0 / np.sqrt(n))], [0]
    for k in range(1, (n + 1) // 2):
        rows.append(np.sqrt(2.0 / n) * np.cos(2 * np.pi * k * j / n))
        rows.append(np.sqrt(2.0 / n) * np.sin(2 * np.pi * k * j / n))
        freqs += [k, k]
    if n % 2 == 0:
        rows.append(np.cos(np.pi * j) / np.sqrt(n))
        freqs.append(n // 2)
    return np.stack(rows).astype(np.float32), np.asarray(freqs)


@functools.lru_cache(maxsize=None)
def _helmholtz_mm_weights(h: int, w: int, alpha: float, gamma: float,
                          power: int, inverse: bool):
    ty, fy = _real_dft_basis(h)
    tx, fx = _real_dft_basis(w)
    lam = (2.0 - 2.0 * np.cos(2 * np.pi * fy / h))[:, None] \
        + (2.0 - 2.0 * np.cos(2 * np.pi * fx / w))[None, :]
    spec = (gamma + alpha * lam) ** power
    wgt = (1.0 / spec if inverse else spec).astype(np.float32)
    return ty, tx, wgt


def _helmholtz_mm(x: jnp.ndarray, alpha: float, gamma: float, power: int,
                  inverse: bool) -> jnp.ndarray:
    h, w = x.shape[-2:]
    ty, tx, wgt = _helmholtz_mm_weights(h, w, float(alpha), float(gamma),
                                        int(power), inverse)
    ty, tx, wgt = jnp.asarray(ty), jnp.asarray(tx), jnp.asarray(wgt)
    hi = jax.lax.Precision.HIGHEST
    xh = jnp.einsum("ah,...hw,bw->...ab", ty, x.astype(jnp.float32), tx,
                    precision=hi)
    return jnp.einsum("ah,...ab,bw->...hw", ty, xh * wgt, tx, precision=hi)


@functools.lru_cache(maxsize=None)
def _helmholtz_mm_weights_packed(h_item: int, w_item: int, pr: int, pc: int,
                                 alpha: float, gamma: float, power: int,
                                 inverse: bool):
    """Block-diagonal bases + tiled spectrum for LANE-PACKED planes holding
    a (pr, pc) grid of independent items (epdiff_pallas.pack_items layout).
    The zero off-diagonal blocks cost nothing: the MXU pads the contraction
    to 128 anyway, so a 2x2-packed 64^2 solve contracts over FULL 128-wide
    tiles instead of half-empty 64-wide ones."""
    ty, tx, wgt = _helmholtz_mm_weights(h_item, w_item, alpha, gamma, power,
                                        inverse)
    ty2 = np.kron(np.eye(pr, dtype=np.float32), ty)
    tx2 = np.kron(np.eye(pc, dtype=np.float32), tx)
    return ty2, tx2, np.tile(wgt, (pr, pc))


def solve_mm_operands(h_item: int, w_item: int, pr: int = 1, pc: int = 1,
                      alpha: float = 2.0, gamma: float = 1.0,
                      power: int = 2):
    """(ty, txT, tyT, tx, wgt) jnp operands of the matmul-form solve
    v = Ty^T [ (Ty m Tx^T) * W ] Tx for a (pr*h_item, pc*w_item) plane
    (block-diagonal when lane-packed) — consumed by the fused-solve EPDiff
    kernel (`epdiff_pallas.epdiff_step_solve`), which executes the four
    matmuls on the MXU inside the step kernel."""
    ty, tx, wgt = _helmholtz_mm_weights_packed(
        h_item, w_item, pr, pc, float(alpha), float(gamma), int(power), True)
    return (jnp.asarray(ty), jnp.asarray(tx.T), jnp.asarray(ty.T),
            jnp.asarray(tx), jnp.asarray(wgt))


def sharp_packed(x: jnp.ndarray, h_item: int, w_item: int,
                 alpha: float = 2.0, gamma: float = 1.0,
                 power: int = 2) -> jnp.ndarray:
    """`sharp` on a lane-packed (..., pr*h_item, pc*w_item) plane of
    independent items — numerically the per-item solve."""
    hp, wp = x.shape[-2:]
    pr, pc = hp // h_item, wp // w_item
    ty, tx, wgt = _helmholtz_mm_weights_packed(
        h_item, w_item, pr, pc, float(alpha), float(gamma), int(power), True)
    ty, tx, wgt = jnp.asarray(ty), jnp.asarray(tx), jnp.asarray(wgt)
    hi = jax.lax.Precision.HIGHEST
    xh = jnp.einsum("ah,...hw,bw->...ab", ty, x.astype(jnp.float32), tx,
                    precision=hi)
    return jnp.einsum("ah,...ab,bw->...hw", ty, xh * wgt, tx, precision=hi)


def _canonical_layout(x: jnp.ndarray) -> jnp.ndarray:
    """Force a default (row-major) layout copy.

    XLA:CPU's FFT thunk RET_CHECKs IsMonotonicWithDim0Major on its operand;
    when the momentum arrives via a transpose (NHWC UNet output -> NCHW), the
    layout is fused into the FFT operand and the check fails. Flatten + an
    optimization barrier + unflatten defeats the reshape cancellation and
    yields a physically row-major buffer. No-op cost on TPU (one fusion copy).
    """
    flat = jax.lax.optimization_barrier(x.reshape(-1))
    return flat.reshape(x.shape)


def sharp(momentum: jnp.ndarray, alpha: float = 2.0, gamma: float = 1.0,
          power: int = 2) -> jnp.ndarray:
    """velocity = K momentum (smoothing). momentum (..., H, W)."""
    h, w = momentum.shape[-2:]
    if max(h, w) <= _MM_MAX_SIDE:
        return _helmholtz_mm(momentum, alpha, gamma, power, inverse=True)
    spec = helmholtz_spectrum(h, w, alpha, gamma, power)
    f = jnp.fft.rfft2(_canonical_layout(momentum.astype(jnp.float32)))
    return jnp.fft.irfft2(f / spec, s=(h, w))


def flat(velocity: jnp.ndarray, alpha: float = 2.0, gamma: float = 1.0,
         power: int = 2) -> jnp.ndarray:
    """momentum = L velocity (the inverse of `sharp`)."""
    h, w = velocity.shape[-2:]
    if max(h, w) <= _MM_MAX_SIDE:
        return _helmholtz_mm(velocity, alpha, gamma, power, inverse=False)
    spec = helmholtz_spectrum(h, w, alpha, gamma, power)
    f = jnp.fft.rfft2(velocity.astype(jnp.float32))
    return jnp.fft.irfft2(f * spec, s=(h, w))


class FluidMetric:
    """Bundles (alpha, gamma, power); mirrors lagomorph's FluidMetric object."""

    def __init__(self, alpha: float = 2.0, gamma: float = 1.0, power: int = 2):
        self.alpha = float(alpha)
        self.gamma = float(gamma)
        self.power = int(power)

    def sharp(self, m: jnp.ndarray) -> jnp.ndarray:
        return sharp(m, self.alpha, self.gamma, self.power)

    def flat(self, v: jnp.ndarray) -> jnp.ndarray:
        return flat(v, self.alpha, self.gamma, self.power)


@functools.lru_cache(maxsize=None)
def _band_resize_matrix(n1: int, n2: int) -> np.ndarray:
    """(n2, n1) float32 matrix of the 1D symmetric band-limited resize.

    Frequencies strictly inside the shared band copy verbatim; the band-edge
    (Nyquist of the smaller, even grid) splits/folds with weight 1/2 per sign
    so the operator is conjugate-symmetric. This makes the 2D resize an exact
    tensor product Ry (x) Rx — the FFT path and this matmul path agree to
    float32 roundoff — and gives the adjoint identity R_down = (n2/n1) R_up^T.
    """
    f = np.fft.fft(np.eye(n1), axis=0)            # row r = frequency r
    g = np.zeros((n2, n1), complex)
    k = min(n1, n2) // 2
    g[:k] = f[:k]                                  # freqs 0 .. k-1
    if k > 1:
        g[n2 - k + 1:] = f[n1 - k + 1:]            # freqs -(k-1) .. -1
    if min(n1, n2) == 1:                           # degenerate: DC only
        g[0] = f[0]
    elif min(n1, n2) % 2:                          # odd band edge: +/-k both fit
        g[k] = f[k]
        g[n2 - k] = f[n1 - k]
    elif n2 < n1:                                  # fold +/-k into out Nyquist
        g[k] = 0.5 * (f[k] + f[n1 - k])
    elif n2 > n1:                                  # split in Nyquist into +/-k
        g[k] = 0.5 * f[k]
        g[n2 - k] = 0.5 * f[k]
    else:                                          # same size: identity
        g[k] = f[k]
    return (np.fft.ifft(g, axis=0).real * (n2 / n1)).astype(np.float32)


def _mirror_rows(f: jnp.ndarray) -> jnp.ndarray:
    """Row index map r -> (-r) mod H on (..., H, K) spectral blocks."""
    return jnp.roll(jnp.flip(f, axis=-2), 1, axis=-2)


def spectral_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Band-limited resampling of (..., H, W) fields.

    Value-preserving for signals within the target band (constant -> same
    constant; smooth fields interpolate spectrally); the band-edge Nyquist
    frequency splits/folds symmetrically (see `_band_resize_matrix`). Used by
    the band-limited shooting mode: the fluid metric makes velocities
    low-frequency, so EPDiff can integrate on a small grid (FLASH-style
    band-limited LDDMM — see PAPERS.md: band-limited vector field
    parameterization) and resample back.

    Grids up to ``_MM_MAX_SIDE`` run as two real-DFT matmuls on the MXU;
    larger grids take an rfft2 path with identical semantics.
    """
    h, w = x.shape[-2:]
    h2, w2 = out_hw
    if max(h, w, h2, w2) <= _MM_MAX_SIDE and min(h, w, h2, w2) >= 2:
        ry = jnp.asarray(_band_resize_matrix(h, h2))
        rx = jnp.asarray(_band_resize_matrix(w, w2))
        hi = jax.lax.Precision.HIGHEST
        return jnp.einsum("ah,...hw,bw->...ab", ry, x.astype(jnp.float32),
                          rx, precision=hi)
    f = jnp.fft.rfft2(x.astype(jnp.float32))
    # rows: full-FFT axis, symmetric band rule
    ky = min(h, h2) // 2
    out = jnp.zeros(x.shape[:-2] + (h2, f.shape[-1]), f.dtype)
    out = out.at[..., :ky, :].set(f[..., :ky, :])
    if ky > 1:
        out = out.at[..., h2 - ky + 1:, :].set(f[..., h - ky + 1:, :])
    if min(h, h2) == 1:
        out = out.at[..., 0, :].set(f[..., 0, :])
    elif min(h, h2) % 2:
        out = out.at[..., ky, :].set(f[..., ky, :])
        out = out.at[..., h2 - ky, :].set(f[..., h - ky, :])
    elif h2 < h:
        out = out.at[..., ky, :].set(0.5 * (f[..., ky, :] + f[..., h - ky, :]))
    elif h2 > h:
        out = out.at[..., ky, :].set(0.5 * f[..., ky, :])
        out = out.at[..., h2 - ky, :].set(0.5 * f[..., ky, :])
    else:
        out = out.at[..., ky, :].set(f[..., ky, :])
    # cols: rfft half-spectrum axis; the negative-sign partner of a stored
    # coefficient is conj at the mirrored row, f_full[r, -c] = conj(f[-r, c])
    kx = min(w, w2) // 2
    wf2 = w2 // 2 + 1
    out2 = jnp.zeros(x.shape[:-2] + (h2, wf2), f.dtype)
    out2 = out2.at[..., :, :kx].set(out[..., :, :kx])
    if min(w, w2) == 1:
        out2 = out2.at[..., :, 0].set(out[..., :, 0])
    elif min(w, w2) % 2:
        out2 = out2.at[..., :, kx].set(out[..., :, kx])
    elif w2 < w:
        fold = 0.5 * (out[..., :, kx] + jnp.conj(_mirror_rows(out)[..., :, kx]))
        out2 = out2.at[..., :, kx].set(fold)
    elif w2 > w:
        out2 = out2.at[..., :, kx].set(0.5 * out[..., :, kx])
    else:
        out2 = out2.at[..., :, kx].set(out[..., :, kx])
    y = jnp.fft.irfft2(out2, s=(h2, w2))
    return y * (h2 * w2) / (h * w)
