"""Strain prediction networks: displacement/motion video -> (126, T) strain matrix.

Contract parity (SURVEY.md sections 2.11.2, 2.11.4):
  * ``NetDisplacement2StrainMat``: model(disp (B,2,H,W,T)) -> {'strainmat': (B,126,T)}
    (reference strainmat_pred_trainer.py:274-280, strainmat_LMA_trainer.py:294-301);
  * ``ResNet3DStrainHead``: the configured ``strainmat_net_type: "ResNet3D"``
    backbone shared with the joint network (configs/config.json:111).

TPU-first: NDHWC 3D convs with stride-2 spatial downsampling (all MXU work),
bf16 activations, temporal axis preserved through the trunk and remapped to
the target strain frame count by a learned temporal projection (a (T_pairs ->
T_strain) dense layer — one matmul).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn


class ResBlock3D(nn.Module):
    features: int
    spatial_stride: int = 1

    @nn.compact
    def __call__(self, x):
        s = (1, self.spatial_stride, self.spatial_stride)
        h = nn.Conv(self.features, (3, 3, 3), strides=s, dtype=x.dtype)(x)
        h = nn.GroupNorm(num_groups=min(8, self.features))(h)
        h = nn.gelu(h)
        h = nn.Conv(self.features, (3, 3, 3), dtype=h.dtype)(h)
        h = nn.GroupNorm(num_groups=min(8, self.features))(h)
        if x.shape != h.shape:
            x = nn.Conv(self.features, (1, 1, 1), strides=s, dtype=x.dtype)(x)
        return nn.gelu(x + h)


class ResNet3DStrainHead(nn.Module):
    """Motion video (B, T, H, W, C) -> strain matrix (B, n_sectors, T_out)."""
    n_sectors: int = 126
    features: int = 16
    n_blocks: int = 3
    out_frames: Optional[int] = None   # None -> keep input T

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.bfloat16)
        x = nn.Conv(self.features, (3, 3, 3), dtype=x.dtype)(x)
        f = self.features
        for i in range(self.n_blocks):
            x = ResBlock3D(f * (2 ** i), spatial_stride=2)(x)
        b, t, h, w, c = x.shape
        x = x.reshape(b, t, h * w, c).mean(axis=2)            # (B, T, C) spatial pool
        x = x.astype(jnp.float32)
        x = nn.gelu(nn.Dense(4 * self.features)(x))
        strain = nn.Dense(self.n_sectors)(x)                   # (B, T, S)
        strain = jnp.moveaxis(strain, 1, 2)                    # (B, S, T)
        if self.out_frames is not None and self.out_frames != t:
            strain = nn.Dense(self.out_frames,
                              kernel_init=nn.initializers.normal(0.02))(strain)
        return strain


class NetDisplacement2StrainMat(nn.Module):
    """model(disp (B,2,H,W,T)) -> {'strainmat': (B, n_sectors, T)}."""
    n_sectors: int = 126
    features: int = 16

    @nn.compact
    def __call__(self, disp: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = jnp.moveaxis(disp, (1, 4), (4, 1))                 # -> (B, T, H, W, 2)
        strain = ResNet3DStrainHead(self.n_sectors, self.features)(x)
        return {"strainmat": strain}
