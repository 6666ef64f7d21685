"""Diffeomorphic registration network: momentum UNet -> fluid metric -> EPDiff
shooting -> warp.

Output-contract parity with the reference's (missing) registration model as
pinned by its trainers (SURVEY.md section 2.11.1; reg_trainer.py:45, 220-232;
joint_registration_regression_trainer.py:276, 300-306):

    model(src (B,1,H,W), tar (B,1,H,W)) -> {
        'displacement':     (B,2,H,W),   # phi^{-1} - id (pull-back field)
        'velocity':         (B,2,H,W),   # v0 = K m0
        'momentum':         (B,2,H,W),   # m0
        'deformed_source':  (B,1,H,W),   # src o phi^{-1}
    }

plus the ``sigma`` attribute used by the hardcoded LDDMM loss
(reg_trainer.py:230 — carried on the ModelBundle).

The whole pipeline (UNet convs in bf16 -> f32 FFT metric -> scan shooting ->
gather warp) is one differentiable jitted graph; the lagomorph CUDA surface
(fluid metric, EPDiff, interp) maps to cardiax.ops (SURVEY.md section 2.12).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from cardiax.models.unet import MomentumUNet
from cardiax.ops.shooting import deform_image, expmap_shooting


class RegistrationNet(nn.Module):
    features: int = 16
    n_levels: int = 3
    alpha: float = 2.0
    gamma: float = 1.0
    fluid_power: int = 2
    n_integration_steps: int = 5
    shoot_downsample: int = 2
    reg_half_res: bool = True
    final_warp_radius: int = 12
    # exact_warp=True forces the XLA-gather warp + composite scan (the exact
    # reference path; all-OFF arm of the qualification A/B, STATUS.md)
    exact_warp: bool = False
    # item->channel packing of the momentum UNet (unet.py); ~bf16-ULP-exact.
    # OFF by default: packed convs win level-by-level microbenchmarks but the
    # pack/repack relayouts between levels break XLA's conv+norm+gelu fusion
    # and the FULL joint step regresses (303 vs 625 slices/sec on v5e-1).
    channel_pack: Any = False

    @nn.compact
    def __call__(self, src: jnp.ndarray, tar: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        x = jnp.concatenate([src, tar], axis=1)          # (B, 2, H, W) NCHW
        x = jnp.moveaxis(x, 1, -1)                        # NHWC for the UNet
        m0 = MomentumUNet(self.features, self.n_levels,
                          half_res=self.reg_half_res,
                          channel_pack=self.channel_pack)(x)
        m0 = jnp.moveaxis(m0, -1, 1)                      # (B, 2, H, W)
        u_inv, v0 = expmap_shooting(
            m0, alpha=self.alpha, gamma=self.gamma, power=self.fluid_power,
            n_steps=self.n_integration_steps,
            warp_radius=None if self.exact_warp else 8,
            shoot_downsample=self.shoot_downsample)
        deformed = deform_image(src, u_inv,
                                warp_radius=None if self.exact_warp
                                else self.final_warp_radius,
                                img_const=True)
        return {
            "displacement": u_inv,
            "velocity": v0,
            "momentum": m0,
            "deformed_source": deformed,
        }
