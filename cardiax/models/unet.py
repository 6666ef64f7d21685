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
    """Input NHWC (B, H, W, 2) [src, tar] -> momentum (B, H, W, 2) [my, mx]."""
    features: int = 16
    n_levels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.bfloat16)
        skips = []
        f = self.features
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
        # which keeps early training stable (standard diffeomorphic-reg trick)
        m = nn.Conv(2, (3, 3), kernel_init=nn.initializers.zeros)(x)
        return m
