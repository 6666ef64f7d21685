"""Momentum UNet: (src, tar) image pair -> initial momentum field m0.

Reconstruction of the registration backbone from the paper's description
(SURVEY.md section 2.11.1): a UNet-style encoder-decoder over the concatenated
(source, target) pair predicting the initial momentum of a geodesic. TPU-first:
NHWC layout, stride-2 convs (MXU) instead of pooling, bfloat16 activations
with float32 momentum output (the shooting core runs f32 for stability,
SURVEY.md section 7.3).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    dtype=x.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features))(x)
        return nn.gelu(x)


class MomentumUNet(nn.Module):
    """Input NHWC (B, H, W, 2) [src, tar] -> momentum (B, H, W, 2) [my, mx].

    ``half_res``: run the whole encoder-decoder at H/2 x W/2 behind a learned
    stride-2 stem and spectrally upsample the momentum head back to full
    resolution. The fluid metric K = (gamma - alpha*Lap)^-power kills the
    frequencies a half-res grid cannot represent, so for sane metrics the
    reachable velocity fields are (near-)identical while the conv stack — the
    train step's largest cost at full res — shrinks ~4x. Accuracy
    qualification in STATUS.md.
    """
    features: int = 16
    n_levels: int = 3
    half_res: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h_full, w_full = x.shape[1], x.shape[2]
        x = x.astype(jnp.bfloat16)
        f = self.features
        half = self.half_res and h_full % 2 == 0 and w_full % 2 == 0 \
            and min(h_full, w_full) >= 4 * (2 ** self.n_levels)
        if half:
            x = ConvBlock(f, stride=2)(x)                         # learned stem
        skips = []
        for lvl in range(self.n_levels):
            x = ConvBlock(f * (2 ** lvl))(x)
            skips.append(x)
            x = ConvBlock(f * (2 ** lvl), stride=2)(x)
        x = ConvBlock(f * (2 ** self.n_levels))(x)
        x = ConvBlock(f * (2 ** self.n_levels))(x)
        for lvl in reversed(range(self.n_levels)):
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)   # nearest 2x up
            x = nn.Conv(f * (2 ** lvl), (3, 3), dtype=x.dtype)(x)
            skip = skips[lvl]
            x = jnp.concatenate([x[:, : skip.shape[1], : skip.shape[2]], skip], axis=-1)
            x = ConvBlock(f * (2 ** lvl))(x)
        x = x.astype(jnp.float32)
        # zero-init the momentum head: shooting starts from identity at init,
        # which keeps early training stable (standard diffeomorphic-reg trick).
        # Measured: running this conv in bf16 is within noise (<0.5%/step), so
        # it stays f32 — full precision into the f32 shooting core.
        m = nn.Conv(2, (3, 3), kernel_init=nn.initializers.zeros)(x)
        if half:
            from cardiax.ops.fluid_metric import spectral_resize
            m = jnp.moveaxis(m, -1, 1)                            # (B, 2, h, w)
            m = spectral_resize(m, (h_full, w_full))
            m = jnp.moveaxis(m, 1, -1)
        return m
