"""Item->channel packing of the momentum UNet (unet.py round-3) is EXACT:
packed and unpacked paths share one param tree and must agree in outputs and
gradients to float roundoff — the no-requalification argument."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cardiax.models.unet import (MomentumUNet, _pack_items, _packed_concat,
                                 _unpack_items)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(10, 8, 8, 4)).astype(np.float32))
    for g in (1, 2, 4, 8):   # 10 % 4 != 0 exercises the zero-item padding
        y = _unpack_items(_pack_items(x, g), g, 10)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_packed_concat_keeps_item_blocks():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(8, 4, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8, 4, 4, 5)).astype(np.float32))
    g = 4
    packed = _packed_concat(_pack_items(a, g), _pack_items(b, g), g)
    out = _unpack_items(packed, g, 8)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.concatenate([a, b], axis=-1)))


def test_fixed_g_pack_matches_unpacked():
    """channel_pack=<int> keeps ONE fixed g at every level (pack once, no
    inter-level relayouts); same exactness contract as the adaptive mode."""
    rng = np.random.default_rng(5)
    h = 32
    x = jnp.asarray(rng.normal(size=(10, h, h, 2)).astype(np.float32))
    m_fix = MomentumUNet(features=8, n_levels=2, half_res=True,
                         channel_pack=2)
    m_ref = MomentumUNet(features=8, n_levels=2, half_res=True,
                         channel_pack=False)
    params = jax.jit(m_fix.init)(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params)
    y_fix = jax.jit(m_fix.apply)(params, x)
    y_ref = jax.jit(m_ref.apply)(params, x)
    assert y_fix.shape == (10, h, h, 2)
    scale_y = float(jnp.max(jnp.abs(y_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(y_fix - y_ref))) <= 5e-3 * scale_y


def test_coerce_pack_config_values():
    from cardiax.models import _coerce_pack
    assert _coerce_pack(False) is False and _coerce_pack(True) is True
    assert _coerce_pack(0) is False and _coerce_pack(1) is False
    assert _coerce_pack(2) == 2 and _coerce_pack("4") == 4


@pytest.mark.parametrize("n_items,half", [(12, False), (10, True)])
def test_packed_unet_matches_unpacked(n_items, half):
    """Same params, packed vs unpacked compute: outputs and grads equal.
    n_items=10 is NOT divisible by the pack factor — exercises padding."""
    rng = np.random.default_rng(2)
    h = 32
    x = jnp.asarray(rng.normal(size=(n_items, h, h, 2)).astype(np.float32))

    m_pack = MomentumUNet(features=8, n_levels=2, half_res=half,
                          channel_pack=True)
    m_ref = MomentumUNet(features=8, n_levels=2, half_res=half,
                         channel_pack=False)
    params = jax.jit(m_pack.init)(jax.random.PRNGKey(0), x)
    # the momentum head is zero-init (output would be trivially 0 both ways):
    # perturb ALL params so forward and backward carry real signal
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params)

    # Forward agrees to ~bf16 ULP: block-diagonal kernels add only zero
    # products to the f32 conv accumulation and the packed GroupNorm reduces
    # exactly the per-item element sets, but the f32 reduction tree may
    # associate differently, so bf16 activations can flip ~1 ULP per layer.
    y_pack = jax.jit(m_pack.apply)(params, x)
    y_ref = jax.jit(m_ref.apply)(params, x)
    assert y_pack.shape == (n_items, h, h, 2)
    scale_y = float(jnp.max(jnp.abs(y_ref))) + 1e-6
    assert float(jnp.max(jnp.abs(y_pack - y_ref))) <= 5e-3 * scale_y

    def loss(mod):
        def f(p):
            y = mod.apply(p, x)
            return jnp.sum(y * y) * 1e3
        return f

    # PARAM GRADS agree to ~1 bf16 ULP on every LIVE parameter: the packed
    # weight-gradient rounds each of the G diagonal blocks to bf16 before the
    # f32 block sum, where the unpacked path rounds once — the same
    # float-reordering drift class as the fused EPDiff kernel (STATUS.md).
    # Conv BIASES are excluded: a per-channel constant is (group-mean-)
    # annihilated by the following GroupNorm, so their gradient is a
    # catastrophic cancellation over ~1e5 near-zero cotangents — reduction-
    # order noise in BOTH paths, not a packing artifact (verified: the
    # unpacked path's own bias grads flip sign under input reordering).
    g_pack = jax.jit(jax.grad(loss(m_pack)))(params)
    g_ref = jax.jit(jax.grad(loss(m_ref)))(params)
    compared = 0
    for (path, gp), gr in zip(
            jax.tree_util.tree_leaves_with_path(g_pack),
            jax.tree_util.tree_leaves(g_ref)):
        keys = [getattr(k, "key", str(k)) for k in path]
        norm_dead_bias = keys[-1] == "bias" and (
            keys[-2] == "conv" or keys[-2].startswith("PackedConv_"))
        if norm_dead_bias:
            continue
        compared += 1
        gp, gr = np.asarray(gp), np.asarray(gr)
        scale = np.max(np.abs(gr)) + 1e-6
        assert np.max(np.abs(gp - gr)) <= 0.02 * scale, \
            (path, np.max(np.abs(gp - gr)), scale)
    assert compared >= 10   # kernels + norm scales/shifts + head
