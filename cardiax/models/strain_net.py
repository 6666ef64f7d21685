"""Strain prediction networks: displacement/motion video -> (126, T) strain matrix.

Contract parity (SURVEY.md sections 2.11.2, 2.11.4):
  * ``NetDisplacement2StrainMat``: model(disp (B,2,H,W,T)) -> {'strainmat': (B,126,T)}
    (reference strainmat_pred_trainer.py:274-280, strainmat_LMA_trainer.py:294-301);
  * ``ResNet3DStrainHead``: the configured ``strainmat_net_type: "ResNet3D"``
    backbone shared with the joint network (configs/config.json:111).

TPU-first: direct Conv3D lowers ~4x slower than its factorization on v5e, so
each "3D" residual block is a fold-frames-into-batch 2D spatial conv (pure
MXU NHWC conv) + a temporal shift-concat 1x1 mix (a matmul) — mathematically a
constrained (3,3,3) kernel. Measured: 56 ms -> 15.5 ms grad for the flagship
strain head. bf16 activations; temporal axis preserved through the trunk and
remapped to the target strain frame count by a learned (T_pairs -> T_strain)
dense projection.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn


class SpatioTemporalBlock(nn.Module):
    """Residual block over (B, T, H, W, C): folded-2D spatial conv + temporal
    shift-mix. Edge frames replicate (same boundary as 'SAME' conv3d).

    ``tmix`` selects the temporal-mix lowering (identical math, identical
    params — checkpoints are interchangeable):
      * ``"shiftflat"`` (default since round 5): the temporal mix computed
        on the FOLDED (B*T, H, W, .) layout — one C->3F matmul + major-axis
        shifts with per-frame edge masks; every reshape in the block then
        merges/splits LEADING dims only (bitcasts), so XLA materializes no
        transposed 5-D layouts at all. Measured on v5e (full joint step,
        tools/probe_tmix.py, exp_results/round5/probe_tmix_shiftflat.log):
        0.941x / 0.903x / 0.875x step time vs 'bandmm' at b10/b20/b40 —
        it kills the fold-reshape layout copies (~2.4 ms/step at b40,
        STATUS round-4 profile) and brings b40 per-slice within 3% of b20.
        Qualified 150 epochs x 3 seeds (exp_results/qualify_shiftflat/).
      * ``"bandmm"`` (default in round 4): the tridiagonal shift structure
        embedded in small (T_out x T_in) banded matrices contracted on the
        MXU — no concats, no per-tap shifts. Measured: -11% step time at
        b10, -10% at b20, -15% at b40 vs 'shift' (STATUS round-4 b40
        analysis) — but its 5-D einsum still forces layout copies around
        the block reshapes that 'shiftflat' avoids.
      * ``"shift"``: one C->3F matmul + two edge-replicated shift-concat
        adds along T (the round-3 formulation; kept as the structural
        reference for the parity test).
    """
    features: int
    spatial_stride: int = 1
    tmix: str = "shiftflat"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c)
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.spatial_stride,) * 2, dtype=x.dtype)(y)
        h2, w2 = y.shape[1], y.shape[2]
        # pinned dtype: the default promotes bf16 -> f32 via the f32
        # scale/bias params and de-bf16s the rest of the trunk (unet.ConvBlock)
        y = nn.GroupNorm(num_groups=min(8, self.features),
                         dtype=jnp.bfloat16)(y)
        y = nn.gelu(y)
        y = y.reshape(b, t, h2, w2, self.features)
        # temporal (3,1,1) mix as ONE (C -> 3F) matmul on y followed by
        # shift-adds of the F-wide products — same math as
        # Dense(concat([prev, y, nxt])) with kernel row-blocks [W_p; W_y; W_n]
        # (z_t = W_p y_{t-1} + W_y y_t + W_n y_{t+1}, edges replicated), but
        # never materializes the 3C-wide concat (round-3 profile: the concat's
        # split/slice transpose cost ~0.5 ms/step). Param shape/init matches
        # the Dense it replaces (lecun_normal fan_in = 3C).
        f = self.features
        kernel = self.param("mix_kernel", nn.initializers.lecun_normal(),
                            (3 * f, f), jnp.float32)
        bias = self.param("mix_bias", nn.initializers.zeros, (f,), jnp.float32)
        # (c, k, f) kernel order keeps k in the MINOR output dims: the einsum
        # is then a plain C -> 3F matmul (no k-to-front transpose, which the
        # round-3 profile priced at ~0.45 ms/step at b20) and the three
        # F-wide products are intra-register lane slices.
        if self.tmix == "bandmm":
            # Same z, computed as y @ A with the shift structure folded into
            # a dense (T*C -> T*F) operator: A[t,c,s,f] = sum_k S_k[s,t]
            # W_k[c,f], where S_p/S_y/S_n are the edge-replicated sub-/main-/
            # super-diagonal (T_out x T_in) 0/1 matrices. The extra MXU FLOPs
            # (xT on the mix matmul) are ~us-level at flagship shapes; in
            # exchange there are no temporal concats or per-tap slices for
            # XLA to de-fuse at large batch.
            tt = y.shape[1]
            i = jnp.arange(tt)
            d = i[:, None] - i[None, :]                       # s - t
            s_p = (d == 1) | ((i[:, None] == 0) & (i[None, :] == 0))
            s_y = d == 0
            s_n = (d == -1) | ((i[:, None] == tt - 1) & (i[None, :] == tt - 1))
            s3 = jnp.stack([s_p, s_y, s_n]).astype(jnp.float32)   # (3, s, t)
            k3 = kernel.reshape(3, f, f)                          # (k, c, f)
            a = jnp.einsum("kcf,kst->tcsf", k3, s3).astype(y.dtype)
            z = (jnp.einsum("bthwc,tcsf->bshwf", y, a)
                 + bias.astype(y.dtype))
            return nn.gelu(z + y)
        if self.tmix == "shiftflat":
            # Temporal mix on the FOLDED (B*T, H, W, ·) layout: one C->3F
            # matmul + major-axis shifts with per-frame edge masks. No 5-D
            # einsum => no transposed layouts for XLA to materialize — every
            # reshape in the block merges/splits LEADING dims only (bitcast).
            # Math and params identical to 'shift'/'bandmm' (z_t = W_p
            # y_{t-1} + W_y y_t + W_n y_{t+1}, edges replicated); built for
            # the b40 regime where the bandmm einsum's layout copies cost
            # ~2.4 ms/step (STATUS round-4 profile).
            k2 = kernel.reshape(3, f, f).transpose(1, 0, 2).reshape(f, 3 * f)
            yf = y.reshape(b * t, h2, w2, f)              # leading-dim merge
            mm = yf @ k2.astype(y.dtype)                  # (B*T, H, W, 3F)
            m_p, m_y, m_n = mm[..., :f], mm[..., f:2 * f], mm[..., 2 * f:]
            ti = jnp.arange(b * t, dtype=jnp.int32) % t
            first = (ti == 0)[:, None, None, None]
            last = (ti == t - 1)[:, None, None, None]
            # row n-1 is frame t-1 of the same item except at t==0, where the
            # edge replicates (the where overrides the cross-item leak)
            sh_p = jnp.concatenate([m_p[:1], m_p[:-1]], axis=0)
            sh_n = jnp.concatenate([m_n[1:], m_n[-1:]], axis=0)
            z = (jnp.where(first, m_p, sh_p) + m_y
                 + jnp.where(last, m_n, sh_n) + bias.astype(y.dtype))
            return nn.gelu(z + yf).reshape(b, t, h2, w2, f)
        k3 = kernel.reshape(3, f, f).transpose(1, 0, 2).astype(y.dtype)
        m = jnp.einsum("bthwc,ckf->bthwkf", y, k3)
        m_p, m_y, m_n = m[..., 0, :], m[..., 1, :], m[..., 2, :]
        z = (jnp.concatenate([m_p[:, :1], m_p[:, :-1]], axis=1) + m_y
             + jnp.concatenate([m_n[:, 1:], m_n[:, -1:]], axis=1)
             + bias.astype(y.dtype))
        return nn.gelu(z + y)


# Backwards-compatible alias: the block IS a factorized 3D residual unit.
ResBlock3D = SpatioTemporalBlock


class ResNet3DStrainHead(nn.Module):
    """Motion video (B, T, H, W, C) -> strain matrix (B, n_sectors, T_out)."""
    n_sectors: int = 126
    features: int = 16
    n_blocks: int = 3
    out_frames: Optional[int] = None   # None -> keep input T
    tmix: str = "shiftflat"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.bfloat16)
        f = self.features
        for i in range(self.n_blocks):
            x = SpatioTemporalBlock(f * (2 ** i), spatial_stride=2,
                                    tmix=self.tmix)(x)
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
    tmix: str = "shiftflat"

    @nn.compact
    def __call__(self, disp: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = jnp.moveaxis(disp, (1, 4), (4, 1))                 # -> (B, T, H, W, 2)
        strain = ResNet3DStrainHead(self.n_sectors, self.features,
                                    tmix=self.tmix)(x)
        return {"strainmat": strain}
