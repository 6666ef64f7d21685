"""Momentum UNet: (src, tar) image pair -> initial momentum field m0.

Reconstruction of the registration backbone from the paper's description
(SURVEY.md section 2.11.1): a UNet-style encoder-decoder over the concatenated
(source, target) pair predicting the initial momentum of a geodesic. TPU-first:
NHWC layout, stride-2 convs (MXU) instead of pooling, bfloat16 activations
with float32 momentum output (the shooting core runs f32 for stability,
SURVEY.md section 7.3).

Item->channel packing (round 3): the UNet's channel counts (16/32/64) leave
the MXU contraction and the VPU lanes mostly idle — a 16-channel weight-grad
matmul uses ~7% of the MXU, and norm/gelu on 16-wide tensors use 16 of 128
lanes. ``PackedConvBlock`` packs G = 128 // C independent batch items into the
channel axis and runs ONE grouped conv (``feature_group_count=G`` with the
shared per-item kernel tiled across groups): identical math to a dense
kron(I_G, W) block-diagonal kernel at 1/G the MACs, and measured faster than
both that dense form and the unpacked conv at every UNet level on v5e — the
layout argument is the same as the lane-packed EPDiff scan and its
block-diagonal spectral solve (ops/epdiff_pallas.py). Per-item GroupNorm
stats are computed inside the packed layout (groups never cross item
boundaries), so the math is EXACTLY the unpacked model's — parity is
test-pinned (tests/test_ops.py-style A/B in tests/test_schemes.py) and no
accuracy requalification is needed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pack_items(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(N, H, W, C) -> (ceil(N/g), H, W, g*C), item-major channel blocks.
    Pads N up to a multiple of g with zero items (discarded by _unpack_items).
    """
    n, h, w, c = x.shape
    if g == 1:
        return x
    pad = (-n) % g
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, h, w, c), x.dtype)], axis=0)
    m = x.shape[0] // g
    return x.reshape(m, g, h, w, c).transpose(0, 2, 3, 1, 4) \
        .reshape(m, h, w, g * c)


def _unpack_items(x: jnp.ndarray, g: int, n: int) -> jnp.ndarray:
    """Inverse of _pack_items; slices back to the original n items."""
    if g == 1:
        return x
    m, h, w, gc = x.shape
    c = gc // g
    out = x.reshape(m, h, w, g, c).transpose(0, 3, 1, 2, 4) \
        .reshape(m * g, h, w, c)
    return out[:n]


def _repack(x: jnp.ndarray, g_from: int, g_to: int, n: int) -> jnp.ndarray:
    if g_from == g_to:
        return x
    return _pack_items(_unpack_items(x, g_from, n), g_to)


def _packed_concat(a: jnp.ndarray, b: jnp.ndarray, g: int) -> jnp.ndarray:
    """Channel-concat that keeps per-item blocks contiguous in the packed
    layout (plain concat would interleave items across group boundaries)."""
    if g == 1:
        return jnp.concatenate([a, b], axis=-1)
    m, h, w, gca = a.shape
    ca, cb = gca // g, b.shape[-1] // g
    ar = a.reshape(m, h, w, g, ca)
    br = b.reshape(m, h, w, g, cb)
    return jnp.concatenate([ar, br], axis=-1).reshape(m, h, w, g * (ca + cb))


class PackedConv(nn.Module):
    """3x3 conv on a g-packed layout with shared per-item weights. With g=1
    this is exactly ``nn.Conv(features, (3, 3), strides, dtype=x.dtype)``
    (same init: lecun_normal over (3, 3, C, F), zero bias)."""
    features: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.groups
        c_in = x.shape[-1] // g
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # Grouped conv: group i convolves item i's channel block with the
        # SAME shared W — identical math to kron(I_g, W) but at 1/g the MACs
        # (measured faster than both the dense block-diagonal kernel and the
        # unpacked conv at every UNet level on v5e).
        k = kernel.astype(x.dtype)
        w = k if g == 1 else jnp.concatenate([k] * g, axis=-1)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g)
        b = bias if g == 1 else jnp.tile(bias, g)
        return y + b.astype(y.dtype)


class PackedConvBlock(nn.Module):
    """conv + per-item GroupNorm + gelu on a g-packed layout. GroupNorm
    mirrors flax exactly (f32 fast-variance stats over (H, W, group), eps
    1e-6, bf16 output — see flax.linen.normalization._compute_stats) with the
    group axis nested INSIDE each item's channel block."""
    features: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.groups
        y = PackedConv(self.features, self.stride, g, name="conv")(x)
        n_groups = min(8, self.features)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        shift = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
        m, h, w, gc = y.shape
        gs = self.features // n_groups
        yr = y.reshape(m, h, w, g, n_groups, gs)
        y32 = yr.astype(jnp.float32)
        mu = y32.mean(axis=(1, 2, 5), keepdims=True)
        mu2 = (y32 * y32).mean(axis=(1, 2, 5), keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mul = jax.lax.rsqrt(var + 1e-6) \
            * scale.reshape(1, 1, 1, 1, n_groups, gs)
        out = (y32 - mu) * mul + shift.reshape(1, 1, 1, 1, n_groups, gs)
        out = out.astype(jnp.bfloat16).reshape(m, h, w, gc)
        return nn.gelu(out)


# Back-compat alias for external users of the original block (g=1 semantics).
class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        return PackedConvBlock(self.features, self.stride, groups=1,
                               name="block")(x)


class MomentumUNet(nn.Module):
    """Input NHWC (B, H, W, 2) [src, tar] -> momentum (B, H, W, 2) [my, mx].

    ``half_res``: run the whole encoder-decoder at H/2 x W/2 behind a learned
    stride-2 stem and spectrally upsample the momentum head back to full
    resolution. The fluid metric K = (gamma - alpha*Lap)^-power kills the
    frequencies a half-res grid cannot represent, so for sane metrics the
    reachable velocity fields are (near-)identical while the conv stack — the
    train step's largest cost at full res — shrinks ~4x. Accuracy
    qualification in STATUS.md.

    ``channel_pack``: item->channel packing of the low-channel levels (module
    docstring); exact math, auto-disabled per level when the packed conv
    would not fill more of the MXU (g=1). Default OFF: packed convs win
    per-level microbenchmarks but the pack/repack relayouts between levels
    break XLA's cross-layer fusion and the full joint step regresses
    (~305 vs ~625 slices/sec on v5e-1) — kept as a tested opt-in.
    """
    features: int = 16
    n_levels: int = 3
    half_res: bool = False
    channel_pack: Any = False

    def _g(self, features: int, n_items: int) -> int:
        cp = self.channel_pack
        if not cp:
            return 1
        if cp is True:                       # per-level adaptive (fills lanes,
            return max(1, min(128 // features, n_items))   # but relayouts)
        # fixed g: pack ONCE at the input, unpack ONCE at the output — every
        # level keeps the same g so _repack is a no-op everywhere and XLA's
        # cross-layer fusion is undisturbed (the adaptive mode's regression).
        return max(1, min(int(cp), n_items))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_items, h_full, w_full = x.shape[0], x.shape[1], x.shape[2]
        x = x.astype(jnp.bfloat16)
        f = self.features
        half = self.half_res and h_full % 2 == 0 and w_full % 2 == 0 \
            and min(h_full, w_full) >= 4 * (2 ** self.n_levels)

        g = self._g(f, n_items)
        x = _pack_items(x, g)
        if half:
            x = PackedConvBlock(f, stride=2, groups=g)(x)         # learned stem
        skips = []
        gs = []
        for lvl in range(self.n_levels):
            fl = f * (2 ** lvl)
            g_new = self._g(fl, n_items)
            x = _repack(x, g, g_new, n_items)
            g = g_new
            x = PackedConvBlock(fl, groups=g)(x)
            skips.append(x)
            gs.append(g)
            x = PackedConvBlock(fl, stride=2, groups=g)(x)
        fb = f * (2 ** self.n_levels)
        g_new = self._g(fb, n_items)
        x = _repack(x, g, g_new, n_items)
        g = g_new
        x = PackedConvBlock(fb, groups=g)(x)
        x = PackedConvBlock(fb, groups=g)(x)
        for lvl in reversed(range(self.n_levels)):
            fl = f * (2 ** lvl)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)   # nearest 2x up
            g_new = gs[lvl]
            x = _repack(x, g, g_new, n_items)
            g = g_new
            x = PackedConv(fl, groups=g)(x)
            skip = skips[lvl]
            x = _packed_concat(x[:, : skip.shape[1], : skip.shape[2]], skip, g)
            x = PackedConvBlock(fl, groups=g)(x)
        x = _unpack_items(x, g, n_items)
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
