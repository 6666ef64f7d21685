"""JointRegisterStrainMatNet: the flagship volume-registration + strain model.

Contract parity (SURVEY.md section 2.11.2; reference
joint_registration_strainmat_LMA.py:307-318, configs/config.json:108-115):

    forward_volume(src_vol (B,1,P,H,W), tar_vol (B,1,P,H,W)) -> {
        'strain_matrix':   (B, 1, n_sectors, n_strain_matrix_frames),
        'deformed_source': (B, 1, P, H, W),
        'velocity':        (B, 2, P, H, W),
        'momentum':        (B, 2, P, H, W),
    }

where P = T-1 Lagrangian pairs (frame 0 vs frames 1..T-1).

TPU-first composition — everything below is ONE jitted fwd-bwd graph:
  1. the P pair axis folds into the batch axis so the momentum UNet and
     geodesic shooting run as one big (B*P)-batched program (this is the axis
     the mesh shards, SURVEY.md section 5.7);
  2. per-pair displacements regroup into a motion video (B, P, H, W, 2) for
     the ResNet3D strain head (strainmat_net_type "ResNet3D");
  3. the predicted strain matrix is low-rank smoothed on-device
     (strainmat_smoothing_method "SVD", rank 5) via differentiable subspace
     iteration — the reference's SVDDenoise (DENSE_utils.py:11-14) inside the
     training graph instead of a post-hoc numpy pass.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from cardiax.models.strain_net import ResNet3DStrainHead
from cardiax.models.unet import MomentumUNet
from cardiax.ops.fluid_metric import spectral_resize
from cardiax.ops.shooting import deform_image, expmap_shooting
from cardiax.ops.svd_smooth import subspace_denoise


class JointRegisterStrainMatNet(nn.Module):
    strainmat_net_type: str = "ResNet3D"
    n_strain_matrix_frames: int = 40
    strainmat_smoothing_method: str = "SVD"
    strainmat_smoothing_SVD_rank: int = 5
    strainmat_smoothing_iters: int = 4
    n_sectors: int = 126
    reg_features: int = 16
    reg_levels: int = 3
    alpha: float = 2.0
    gamma: float = 1.0
    fluid_power: int = 2
    n_integration_steps: int = 5
    shoot_downsample: int = 2
    reg_half_res: bool = True
    strain_downsample: int = 2
    final_warp_radius: int = 12
    strain_features: int = 16
    # temporal-mix lowering in the strain head ("shift" | "bandmm" |
    # "shiftflat"); identical math and params — see
    # strain_net.SpatioTemporalBlock for the measured A/B
    strain_tmix: str = "shiftflat"
    # exact_warp=True forces the XLA-gather warp + composite (non-Pallas) scan
    # everywhere — the exact reference path, used as the all-approximations-OFF
    # arm of the qualification A/B runs (STATUS.md)
    exact_warp: bool = False
    # item->channel packing of the momentum UNet (unet.py); ~bf16-ULP-exact.
    # OFF by default: packed convs win level-by-level microbenchmarks but the
    # pack/repack relayouts break XLA's conv+norm+gelu fusion and the FULL
    # joint step regresses (~305 vs ~625 slices/sec on v5e-1, STATUS.md).
    channel_pack: Any = False

    @nn.compact
    def __call__(self, src_vol: jnp.ndarray, tar_vol: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        return self.forward_volume(src_vol, tar_vol, train)

    def _analytic_strain(self, disp_video: jnp.ndarray,
                         mask0: jnp.ndarray) -> jnp.ndarray:
        """Physics path (strainmat_net_type='analytic'): Green-Lagrange
        circumferential strain assembled on-device from the predicted
        Lagrangian displacements (cardiax.ops.strain) — the BASELINE.json
        north-star fused pipeline; no learned strain head.

        disp_video (B, P, 2, H, W); mask0 (B, H, W). Returns (B, S, Ts) via a
        fixed linear temporal resample from P pair-frames to Ts strain frames.
        """
        from cardiax.ops.strain import strain_matrix_from_displacements
        b, p = disp_video.shape[:2]
        disp = jnp.moveaxis(disp_video, 1, 2)                 # (B, 2, P, H, W)
        strain_p = strain_matrix_from_displacements(
            disp, mask0, self.n_sectors)                       # (B, S, P)
        ts = self.n_strain_matrix_frames
        # static (P, Ts) linear-interpolation matrix: frame 0 of the strain
        # matrix is the (zero-strain) reference frame, pairs cover 1..P
        src_pos = jnp.arange(1, p + 1, dtype=jnp.float32)
        dst_pos = jnp.linspace(0.0, float(p), ts)
        d = jnp.abs(dst_pos[None, :] - src_pos[:, None])
        m = jnp.clip(1.0 - d, 0.0, 1.0)                        # hat weights
        m = m / jnp.maximum(m.sum(axis=0, keepdims=True), 1e-6)
        return strain_p @ m                                    # (B, S, Ts)

    def forward_volume(self, src_vol: jnp.ndarray, tar_vol: jnp.ndarray,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        b, c, p, h, w = src_vol.shape
        # 1. fold pairs into batch: (B*P, H, W, 2) NHWC pair stack
        src = src_vol.reshape(b * p, 1, h, w)
        tar = tar_vol.reshape(b * p, 1, h, w)
        x = jnp.concatenate([src, tar], axis=1)
        x = jnp.moveaxis(x, 1, -1)
        m0 = MomentumUNet(self.reg_features, self.reg_levels,
                          half_res=self.reg_half_res,
                          channel_pack=self.channel_pack,
                          name="momentum_unet")(x)
        m0 = jnp.moveaxis(m0, -1, 1)                          # (B*P, 2, H, W)
        u_inv, v0, u_low = expmap_shooting(
            m0, alpha=self.alpha, gamma=self.gamma, power=self.fluid_power,
            n_steps=self.n_integration_steps,
            warp_radius=None if self.exact_warp else 8,
            shoot_downsample=self.shoot_downsample, return_low=True)
        deformed = deform_image(src, u_inv,
                                warp_radius=None if self.exact_warp
                                else self.final_warp_radius,
                                img_const=True)                   # (B*P, 1, H, W)

        # 2. regroup displacements into a motion video for the strain head
        disp_video = u_inv.reshape(b, p, 2, h, w)
        if self.strainmat_net_type == "analytic":
            mask0 = src_vol[:, 0, 0]                          # shared frame 0
            strain = self._analytic_strain(disp_video, mask0)
        else:                                                  # "ResNet3D"
            # The displacement field is band-limited by the fluid metric, so
            # the learned head can consume it on a downsampled grid (same
            # argument as shoot_downsample/reg_half_res; params are identical
            # — only activation sizes shrink ahead of the global pool).
            # Opt out with strain_downsample: 1.
            ds = int(self.strain_downsample)
            if ds > 1 and h % ds == 0 and w % ds == 0 \
                    and min(h, w) >= 16 * ds:
                if u_low is not None and u_low.shape[-2:] == (h // ds, w // ds):
                    # band-limited shooting already integrated on this grid —
                    # reuse its full-pixel displacement, skipping an up-down
                    # spectral round trip
                    small = u_low
                else:
                    small = spectral_resize(u_inv, (h // ds, w // ds))
                head_video = small.reshape(b, p, 2, h // ds, w // ds)
            else:
                head_video = disp_video
            video = jnp.moveaxis(head_video, 2, -1)           # (B, P, h, w, 2)
            strain = ResNet3DStrainHead(
                self.n_sectors, self.strain_features,
                out_frames=self.n_strain_matrix_frames,
                tmix=self.strain_tmix, name="strain_head")(video)

        # 3. on-device low-rank smoothing of the predicted strain matrix
        if self.strainmat_smoothing_method == "SVD":
            strain = subspace_denoise(strain, self.strainmat_smoothing_SVD_rank,
                                      n_iters=self.strainmat_smoothing_iters)

        return {
            "strain_matrix": strain[:, None],                 # (B, 1, S, Ts)
            "deformed_source": deformed.reshape(b, 1, p, h, w),
            "velocity": v0.reshape(b, 2, p, h, w),
            "momentum": m0.reshape(b, 2, p, h, w),
            "displacement": disp_video,                        # (B, P, 2, H, W)
        }
