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

import jax
import jax.numpy as jnp


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
    spec = helmholtz_spectrum(h, w, alpha, gamma, power)
    f = jnp.fft.rfft2(_canonical_layout(momentum.astype(jnp.float32)))
    return jnp.fft.irfft2(f / spec, s=(h, w))


def flat(velocity: jnp.ndarray, alpha: float = 2.0, gamma: float = 1.0,
         power: int = 2) -> jnp.ndarray:
    """momentum = L velocity (the inverse of `sharp`)."""
    h, w = velocity.shape[-2:]
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


def spectral_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Band-limited resampling of (..., H, W) fields via rfft2 crop/pad.

    Value-preserving for signals within the target band (constant -> same
    constant; smooth fields interpolate spectrally). Used by the band-limited
    shooting mode: the fluid metric makes velocities low-frequency, so EPDiff
    can integrate on a small grid (FLASH-style band-limited LDDMM — see
    PAPERS.md: band-limited vector field parameterization) and resample back.
    """
    h, w = x.shape[-2:]
    h2, w2 = out_hw
    f = jnp.fft.rfft2(x.astype(jnp.float32))
    wf2 = w2 // 2 + 1
    ky = min(h, h2) // 2
    out = jnp.zeros(x.shape[:-2] + (h2, wf2), f.dtype)
    # copy the low-frequency block (positive and negative row freqs)
    kx = min(f.shape[-1], wf2)
    out = out.at[..., :ky, :kx].set(f[..., :ky, :kx])
    out = out.at[..., -ky:, :kx].set(f[..., -ky:, :kx])
    y = jnp.fft.irfft2(out, s=(h2, w2))
    return y * (h2 * w2) / (h * w)
