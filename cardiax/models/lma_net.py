"""LMA networks: strain-matrix -> TOS / LMA-label heads (flax.linen).

Rebuilds the reference's missing ``NetStrainMat2LMA`` from its pinned contract
(SURVEY.md section 2.11.3; reference configs/config.json:117-124 and trainer
call sites LMA_trainer.py:229-248):

    model(strain_matrix (B,1,126,40)) -> {'TOS': (B,126)}          TOS_regression
                                      -> {'sector_LMA_labels': (B,2,126)}
                                      -> {'slice_LMA_label': (B,2)}

TPU-first design notes:
  * the (126, 40) strain matrix is laid out NHWC so convs hit the MXU with
    the channel axis in lanes;
  * the sector axis is angularly periodic (126 sectors tile the annulus), so
    sector-axis padding is CIRCULAR — rotation augmentation (sector roll)
    then commutes with the conv stack by construction;
  * all shapes static; the whole head is one fused XLA region inside the
    joint train step.

Also provides ``NetDisplacement2LMA`` for the displacement-video LMA modality
(reference LMA_trainer.py:184-193: input (B,2,H,W,T) cat of X/Y fields).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn


def _circular_pad_sectors(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Circularly pad the sector axis (axis 1 of NHWC)."""
    if pad == 0:
        return x
    return jnp.concatenate([x[:, -pad:], x, x[:, :pad]], axis=1)


class SectorConvBlock(nn.Module):
    """Conv over (sectors, frames) with circular sector padding + GroupNorm."""
    features: int
    kernel: tuple = (3, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad_s = self.kernel[0] // 2
        x = _circular_pad_sectors(x, pad_s)
        x = nn.Conv(self.features, self.kernel, padding=((0, 0), (self.kernel[1] // 2,) * 2),
                    dtype=x.dtype)(x)
        # pinned dtype: the default would promote bf16 -> f32 through the f32
        # scale/bias params and de-bf16 every later conv (see unet.ConvBlock)
        x = nn.GroupNorm(num_groups=min(8, self.features),
                         dtype=jnp.bfloat16)(x)
        return nn.gelu(x)


class NetStrainMat2LMA(nn.Module):
    """Small conv stack over the (n_sectors, n_frames) strain matrix + head."""
    LMA_task: str = "TOS_regression"
    num_conv_layers: int = 3
    inner_conv_channel_num: int = 16
    input_channel_num: int = 1
    n_frames: int = 40
    n_sectors: int = 126
    n_classes: int = 1

    @nn.compact
    def __call__(self, strain_matrix: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        # accept (B, 1, S, T) channel-first (reference contract) -> NHWC
        x = jnp.moveaxis(strain_matrix, 1, -1)                   # (B, S, T, C)
        x = x.astype(jnp.bfloat16)
        for _ in range(self.num_conv_layers):
            x = SectorConvBlock(self.inner_conv_channel_num)(x)
        # temporal reduction per sector: (B, S, T, C) -> (B, S, T*C) -> (B, S, F)
        b, s, t, c = x.shape
        x = x.reshape(b, s, t * c)
        feat = nn.Dense(4 * self.inner_conv_channel_num, dtype=jnp.bfloat16)(x)
        feat = nn.gelu(feat)
        feat = feat.astype(jnp.float32)

        if self.LMA_task == "TOS_regression":
            tos = nn.Dense(1)(feat)[..., 0]                      # (B, S)
            # TOS is measured in frames and strictly positive; softplus keeps
            # the regression head in-range without clipping gradients
            tos = nn.softplus(tos) + 1.0
            return {"TOS": tos}
        if self.LMA_task == "LMA_sector_classification":
            logits = nn.Dense(2)(feat)                            # (B, S, 2)
            return {"sector_LMA_labels": jnp.moveaxis(logits, -1, 1)}  # (B, 2, S)
        if self.LMA_task == "LMA_slice_classification":
            pooled = feat.mean(axis=1)                            # (B, F)
            return {"slice_LMA_label": nn.Dense(2)(pooled)}       # (B, 2)
        raise ValueError(f"Unknown LMA_task: {self.LMA_task}")


class NetDisplacement2LMA(nn.Module):
    """Displacement-video -> LMA head (reference LMA/displacement modality,
    LMA_trainer.py:184-193 and joint_registration_regression_trainer.py:293).

    Input (B, 2, T, H, W) or (B, 2, H, W, T); internally folded-2D
    spatiotemporal blocks with stride-2 spatial downsampling (MXU-friendly),
    then a projection to the sector axis and the same task heads as
    NetStrainMat2LMA.
    """
    LMA_task: str = "TOS_regression"
    n_sectors: int = 126
    features: int = 16
    num_conv_layers: int = 3
    time_axis_last: bool = True

    @nn.compact
    def __call__(self, disp: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        # normalize to (B, T, H, W, C=2)
        if self.time_axis_last:                                   # (B, 2, H, W, T)
            x = jnp.moveaxis(disp, (1, 4), (4, 1))
        else:                                                     # (B, 2, T, H, W)
            x = jnp.moveaxis(disp, 1, -1)
        x = x.astype(jnp.bfloat16)
        f = self.features
        # Conv3D lowers ~4x slower than its factorization on v5e: use the same
        # folded-2D + temporal shift-mix blocks as the strain head
        from cardiax.models.strain_net import SpatioTemporalBlock
        for i in range(self.num_conv_layers):
            x = SpatioTemporalBlock(f * (2 ** i), spatial_stride=2)(x)
        b, t, h, w, c = x.shape
        x = x.reshape(b, t, h * w * c).mean(axis=1)               # temporal+spatial squeeze
        x = x.astype(jnp.float32)
        feat = nn.gelu(nn.Dense(8 * f)(x))

        if self.LMA_task == "TOS_regression":
            tos = nn.softplus(nn.Dense(self.n_sectors)(feat)) + 1.0
            return {"TOS": tos}
        if self.LMA_task == "LMA_sector_classification":
            logits = nn.Dense(2 * self.n_sectors)(feat).reshape(b, 2, self.n_sectors)
            return {"sector_LMA_labels": logits}
        if self.LMA_task == "LMA_slice_classification":
            return {"slice_LMA_label": nn.Dense(2)(feat)}
        raise ValueError(f"Unknown LMA_task: {self.LMA_task}")
