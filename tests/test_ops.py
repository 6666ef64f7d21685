"""Numerical tests for the native ops layer (SURVEY.md section 4, item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from cardiax.ops.fluid_metric import FluidMetric, sharp, flat
from cardiax.ops.shooting import ad_star, deform_image, expmap_shooting, expmap_svf
from cardiax.ops.strain import circumferential_strain, sector_matrix
from cardiax.ops.svd_smooth import subspace_denoise, svd_denoise
from cardiax.ops.warp import (bilinear_warp, compose_displacements,
                              warp_vector_field)

H = W = 32


def _smooth_img(seed=0, h=H, w=W):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h, w))
    return ndimage.gaussian_filter(img, 2.0).astype(np.float32)


class TestWarp:
    def test_identity(self):
        img = jnp.asarray(_smooth_img())
        out = bilinear_warp(img, jnp.zeros((2, H, W)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_integer_shift(self):
        img = jnp.asarray(_smooth_img(1))
        disp = jnp.zeros((2, H, W)).at[0].set(1.0)  # sample at y+1
        out = bilinear_warp(img, disp)
        np.testing.assert_allclose(out[:-1], img[1:], atol=1e-6)

    def test_matches_map_coordinates(self):
        img = _smooth_img(2)
        rng = np.random.default_rng(3)
        disp = ndimage.gaussian_filter(rng.normal(size=(2, H, W)), 3.0).astype(np.float32) * 2
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        cy = np.clip(yy + disp[0], 0, H - 1)
        cx = np.clip(xx + disp[1], 0, W - 1)
        ref = ndimage.map_coordinates(img, [cy, cx], order=1, mode="nearest")
        out = bilinear_warp(jnp.asarray(img), jnp.asarray(disp))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_batched_and_grad(self):
        imgs = jnp.asarray(np.stack([_smooth_img(i) for i in range(4)]))   # (4, H, W)
        disp = jnp.full((4, 2, H, W), 0.3)

        def loss(d):
            return jnp.sum(bilinear_warp(imgs, d) ** 2)

        g = jax.grad(loss)(disp)
        assert g.shape == disp.shape
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_compose(self):
        u1 = jnp.zeros((2, H, W)).at[0].set(1.0)
        u2 = jnp.zeros((2, H, W)).at[1].set(2.0)
        u = compose_displacements(u1, u2)
        # interior: total displacement = inner + outer
        np.testing.assert_allclose(np.asarray(u[0, 4:-4, 4:-4]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(u[1, 4:-4, 4:-4]), 2.0, atol=1e-5)


class TestFluidMetric:
    def test_sharp_flat_roundtrip(self):
        m = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, H, W)).astype(np.float32))
        v = sharp(m, alpha=2.0, gamma=1.0, power=2)
        m_back = flat(v, alpha=2.0, gamma=1.0, power=2)
        np.testing.assert_allclose(np.asarray(m_back), np.asarray(m), atol=1e-4)

    def test_smooths(self):
        rng = np.random.default_rng(1)
        m = jnp.asarray(rng.normal(size=(1, 1, H, W)).astype(np.float32))
        v = FluidMetric(alpha=2.0, gamma=1.0, power=2).sharp(m)
        # high-frequency energy must shrink much more than DC
        def hf_energy(x):
            f = np.fft.rfft2(np.asarray(x)[0, 0])
            return np.abs(f[H // 4: 3 * H // 4]).sum()
        assert hf_energy(v) < 0.05 * hf_energy(m)

    def test_dc_gain(self):
        m = jnp.ones((1, 1, H, W))
        v = sharp(m, alpha=2.0, gamma=1.0, power=2)
        np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-5)  # K has DC gain 1/gamma^p


class TestFluidMetricMatmulPath:
    """The real-DFT matmul path (grids <= _MM_MAX_SIDE) must match the FFT
    path to float32 roundoff — same diagonal operator, different lowering."""

    def test_sharp_flat_match_fft(self, monkeypatch):
        import cardiax.ops.fluid_metric as fm
        rng = np.random.default_rng(0)
        for (h, w) in ((64, 64), (32, 48), (17, 23)):
            x = jnp.asarray(rng.normal(size=(3, 2, h, w)).astype(np.float32))
            a_sharp, a_flat = fm.sharp(x, 2.0, 1.0, 2), fm.flat(x, 2.0, 1.0, 2)
            monkeypatch.setattr(fm, "_MM_MAX_SIDE", 0)   # force FFT
            b_sharp, b_flat = fm.sharp(x, 2.0, 1.0, 2), fm.flat(x, 2.0, 1.0, 2)
            monkeypatch.undo()
            np.testing.assert_allclose(np.asarray(a_sharp), np.asarray(b_sharp),
                                       rtol=0, atol=2e-5)
            np.testing.assert_allclose(np.asarray(a_flat), np.asarray(b_flat),
                                       rtol=0, atol=1e-3)  # flat amplifies ~(1+8a)^2

    def test_resize_matmul_matches_fft(self, monkeypatch):
        import cardiax.ops.fluid_metric as fm
        rng = np.random.default_rng(1)
        for (h, w, h2, w2) in ((64, 64, 32, 32), (32, 32, 64, 64),
                               (48, 64, 24, 32), (33, 47, 17, 23),
                               (17, 23, 33, 47), (64, 64, 63, 65),
                               (64, 64, 64, 64)):
            x = jnp.asarray(rng.normal(size=(2, h, w)).astype(np.float32))
            a = fm.spectral_resize(x, (h2, w2))
            monkeypatch.setattr(fm, "_MM_MAX_SIDE", 0)
            b = fm.spectral_resize(x, (h2, w2))
            monkeypatch.undo()
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-5)

    def test_resize_adjoint_identity(self):
        # symmetric band rule: R_down == (n2/n1) * R_up^T
        from cardiax.ops.fluid_metric import _band_resize_matrix
        down = _band_resize_matrix(64, 32)
        up = _band_resize_matrix(32, 64)
        np.testing.assert_allclose(down, (32 / 64) * up.T, atol=1e-6)


class TestShooting:
    def test_zero_momentum(self):
        m0 = jnp.zeros((1, 2, H, W))
        u, v0 = expmap_shooting(m0, n_steps=4)
        assert float(jnp.abs(u).max()) == 0.0
        assert float(jnp.abs(v0).max()) == 0.0

    def test_svf_constant_field(self):
        v = jnp.zeros((1, 2, H, W)).at[:, 0].set(2.0)
        u = expmap_svf(v, n_squarings=4)
        np.testing.assert_allclose(np.asarray(u[0, 0, 8:-8, 8:-8]), 2.0, atol=1e-4)

    def test_shooting_small_deformation_diffeomorphic(self):
        # smooth random momentum -> displacement finite, smooth, invertible-ish
        rng = np.random.default_rng(2)
        m0 = ndimage.gaussian_filter(rng.normal(size=(1, 2, H, W)), 4.0).astype(np.float32)
        m0 = jnp.asarray(m0 * 20.0)
        u, v0 = expmap_shooting(m0, alpha=2.0, gamma=1.0, power=2, n_steps=5)
        assert np.isfinite(np.asarray(u)).all()
        # Jacobian of id+u must stay positive (no folding) for small fields
        from cardiax.ops.shooting import _grad_hw
        uy_y, uy_x = _grad_hw(u[0, 0])
        ux_y, ux_x = _grad_hw(u[0, 1])
        jac = (1 + uy_y) * (1 + ux_x) - uy_x * ux_y
        assert float(jac.min()) > 0.0

    def test_energy_conservation(self):
        rng = np.random.default_rng(3)
        m0 = ndimage.gaussian_filter(rng.normal(size=(1, 2, H, W)), 4.0).astype(np.float32)
        m0 = jnp.asarray(m0 * 5.0)
        # <m, Km> at t=0 vs after integration with many steps: drift stays small
        from cardiax.ops.fluid_metric import sharp as K
        from cardiax.ops.shooting import ad_star

        def energy(m):
            return float(jnp.sum(m * K(m)))

        e0 = energy(m0)
        m = m0
        dt = 1.0 / 20
        for _ in range(20):
            v = K(m)
            m = m - dt * ad_star(v, m)
        drift = abs(energy(m) - e0) / (abs(e0) + 1e-9)
        assert drift < 0.05, f"EPDiff energy drift {drift}"

    def test_deform_image_grad(self):
        img = jnp.asarray(_smooth_img(4))[None, None]
        m0 = jnp.asarray(np.random.default_rng(5).normal(size=(1, 2, H, W)).astype(np.float32))

        def loss(m):
            u, _ = expmap_shooting(m, n_steps=3)
            return jnp.sum(deform_image(img, u) ** 2)

        g = jax.grad(loss)(m0)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestSVD:
    def test_exact_on_low_rank(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(126, 3)) @ rng.normal(size=(3, 40))
        a = jnp.asarray(a.astype(np.float32))
        out = subspace_denoise(a, rank=5)
        rel = np.linalg.norm(np.asarray(out) - np.asarray(a)) / np.linalg.norm(np.asarray(a))
        assert rel < 1e-2, f"rank-3 matrix not preserved: rel err {rel}"

    def test_matches_numpy_truncation(self):
        # operating regime: low-rank signal + small noise (strain matrices),
        # i.e. a clear spectral gap — where subspace iteration converges fast.
        # (on a gapless Gaussian matrix the top-5 subspace is ill-defined and
        # ANY method's truncation is arbitrary.)
        rng = np.random.default_rng(1)
        a = (rng.normal(size=(126, 4)) @ rng.normal(size=(4, 40))
             + 0.05 * rng.normal(size=(126, 40))).astype(np.float32)
        ref = svd_denoise(a, rank=5)
        out = subspace_denoise(jnp.asarray(a), rank=5, n_iters=8)
        err = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
        assert err < 0.02, err

    def test_differentiable(self):
        a = jnp.asarray(np.random.default_rng(2).normal(size=(8, 126, 40)).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(subspace_denoise(x, 5) ** 2))(a)
        assert np.isfinite(np.asarray(g)).all()


class TestStrain:
    def _annulus(self):
        yy, xx = np.mgrid[0:H, 0:W]
        rr = np.hypot(yy - H / 2, xx - W / 2)
        return ((rr > 5) & (rr < 12)).astype(np.float32)

    def test_sector_matrix_partitions_mask(self):
        mask = jnp.asarray(self._annulus())
        sm = sector_matrix(mask, 126)
        np.testing.assert_allclose(np.asarray(sm.sum(axis=0)),
                                   np.asarray(mask).reshape(-1), atol=1e-6)

    def test_uniform_scaling_strain(self):
        # material displacement u = s*(x - c): E_cc = s + s^2/2 everywhere
        s = -0.1
        mask = self._annulus()
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        cy = (yy * mask).sum() / mask.sum()
        cx = (xx * mask).sum() / mask.sum()
        t = 3
        disp = np.zeros((2, t, H, W), np.float32)
        for f in range(t):
            disp[0, f] = s * (yy - cy)
            disp[1, f] = s * (xx - cx)
        strain = circumferential_strain(jnp.asarray(disp), jnp.asarray(mask), 126)
        expected = s + 0.5 * s * s
        vals = np.asarray(strain)
        active = vals[np.abs(vals).sum(axis=1) > 0]
        np.testing.assert_allclose(active, expected, atol=0.02)


class TestBandedWarpKernel:
    """Pallas banded warp vs the XLA-gather reference (interpret mode on CPU;
    the same kernel was validated bit-exact on TPU v5e)."""

    def _data(self, n=2, h=32, w=32, amp=5.0, seed=0):
        rng = np.random.default_rng(seed)
        img = ndimage.gaussian_filter(rng.normal(size=(n, h, w)), 2.0).astype(np.float32)
        disp = np.clip(ndimage.gaussian_filter(rng.normal(size=(n, 2, h, w)), 3.0) * 10,
                       -amp, amp).astype(np.float32)
        return jnp.asarray(img), jnp.asarray(disp)

    def test_forward_matches_reference(self):
        from cardiax.ops.warp_pallas import bilinear_warp_banded
        img, disp = self._data()
        ref = bilinear_warp(img, disp)
        out = bilinear_warp_banded(img, disp, radius=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_match_reference(self):
        from cardiax.ops.warp_pallas import bilinear_warp_banded
        img, disp = self._data(seed=1)
        g_ref = jax.grad(lambda d: jnp.sum(bilinear_warp(img, d) ** 2))(disp)
        g_new = jax.grad(lambda d: jnp.sum(
            bilinear_warp_banded(img, d, radius=8, interpret=True) ** 2))(disp)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)
        gi_ref = jax.grad(lambda i: jnp.sum(bilinear_warp(i, disp) ** 2))(img)
        gi_new = jax.grad(lambda i: jnp.sum(
            bilinear_warp_banded(i, disp, radius=8, interpret=True) ** 2))(img)
        np.testing.assert_allclose(np.asarray(gi_new), np.asarray(gi_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_cpu_fallback_is_reference(self):
        from cardiax.ops.warp_pallas import bilinear_warp_banded
        img, disp = self._data(seed=2)
        ref = bilinear_warp(img, disp)
        out = bilinear_warp_banded(img, disp)   # backend cpu -> gather path
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_shooting_banded_matches_gather(self):
        rng = np.random.default_rng(3)
        m0 = jnp.asarray(ndimage.gaussian_filter(
            rng.normal(size=(1, 2, H, W)), 4.0).astype(np.float32) * 20.0)
        u_banded, _ = expmap_shooting(m0, n_steps=3, warp_radius=8)
        u_gather, _ = expmap_shooting(m0, n_steps=3, warp_radius=None)
        np.testing.assert_allclose(np.asarray(u_banded), np.asarray(u_gather),
                                   atol=1e-5)


class TestMultiChannelBandedWarp:
    """C channels warped by one shared displacement: one kernel, shared tap
    weights, channel-summed disp cotangent, optional const-image VJP."""

    def _data(self, n=2, c=2, h=32, w=32, amp=5.0, seed=0):
        rng = np.random.default_rng(seed)
        field = ndimage.gaussian_filter(
            rng.normal(size=(n, c, h, w)), 2.0).astype(np.float32)
        disp = np.clip(ndimage.gaussian_filter(
            rng.normal(size=(n, 2, h, w)), 3.0) * 10, -amp, amp
        ).astype(np.float32)
        return jnp.asarray(field), jnp.asarray(disp)

    def test_forward_matches_per_channel(self):
        from cardiax.ops.warp_pallas import bilinear_warp_banded_multi
        field, disp = self._data()
        ref = warp_vector_field(field, disp)          # exact XLA gather
        out = bilinear_warp_banded_multi(field, disp, radius=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_match_reference(self):
        from cardiax.ops.warp_pallas import bilinear_warp_banded_multi
        field, disp = self._data(seed=1)
        loss_ref = lambda f, d: jnp.sum(warp_vector_field(f, d) ** 2)  # noqa: E731
        loss_new = lambda f, d: jnp.sum(bilinear_warp_banded_multi(  # noqa: E731
            f, d, radius=8, interpret=True) ** 2)
        for arg in (0, 1):
            g_ref = jax.grad(loss_ref, arg)(field, disp)
            g_new = jax.grad(loss_new, arg)(field, disp)
            np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                       atol=1e-4, rtol=1e-4)

    def test_const_img_disp_grad_matches(self):
        from cardiax.ops.warp_pallas import bilinear_warp_banded_multi
        field, disp = self._data(seed=2)
        g_ref = jax.grad(lambda d: jnp.sum(
            warp_vector_field(field, d) ** 2))(disp)
        g_new = jax.grad(lambda d: jnp.sum(bilinear_warp_banded_multi(
            field, d, radius=8, interpret=True, img_const=True) ** 2))(disp)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)
        g_img = jax.grad(lambda f: jnp.sum(bilinear_warp_banded_multi(
            f, disp, radius=8, interpret=True, img_const=True) ** 2))(field)
        assert float(jnp.abs(g_img).max()) == 0.0

    def test_hoist1_config_radius16(self):
        # 128x128 at radius 16 fits only ONE hoisted weight list (the final
        # image warp configuration): parity incl. gradients
        from cardiax.ops.warp_pallas import (_precompute_wys_ok,
                                             bilinear_warp_banded_multi)
        assert _precompute_wys_ok(128, 128, 16, n_lists=1)
        assert not _precompute_wys_ok(128, 128, 16, n_lists=2)
        field, disp = self._data(n=1, c=1, h=128, w=128, amp=12.0, seed=3)
        ref = warp_vector_field(field, disp)
        out = bilinear_warp_banded_multi(field, disp, radius=16,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        g_ref = jax.grad(lambda d: jnp.sum(
            warp_vector_field(field, d) ** 2))(disp)
        g_new = jax.grad(lambda d: jnp.sum(bilinear_warp_banded_multi(
            field, d, radius=16, interpret=True, img_const=True) ** 2))(disp)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_deform_image_const_matches(self):
        from cardiax.ops.shooting import deform_image
        field, disp = self._data(seed=4)
        ref = deform_image(field, disp, warp_radius=None)
        out = deform_image(field, disp, warp_radius=None, img_const=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestFusedEPDiffStep:
    """Fused Pallas EPDiff step (fwd + hand-derived VJP) vs the composite
    JAX reference (ad_star + exact gather warp), interpret mode on CPU."""

    def _data(self, n=2, h=24, w=24, seed=0, scale=3.0):
        rng = np.random.default_rng(seed)
        sm = lambda s: ndimage.gaussian_filter(  # noqa: E731
            rng.normal(size=(n, 2, h, w)), 2.5).astype(np.float32) * s
        return jnp.asarray(sm(scale)), jnp.asarray(sm(scale)), \
            jnp.asarray(sm(1.0))

    def test_forward_matches_reference(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step,
                                               epdiff_step_reference)
        v, m, u = self._data()
        mr, ur = epdiff_step_reference(v, m, u, 0.2)
        mk, uk = epdiff_step(v, m, u, 0.2, 3, True)
        np.testing.assert_allclose(np.asarray(mk), np.asarray(mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(uk), np.asarray(ur), atol=1e-5)

    def test_gradients_match_reference(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step,
                                               epdiff_step_reference)
        v, m, u = self._data(seed=1)
        wy = jnp.asarray(np.random.default_rng(9).normal(
            size=v.shape).astype(np.float32))

        def loss_ref(v, m, u):
            mn, un = epdiff_step_reference(v, m, u, 0.2)
            return jnp.sum(mn * wy) + jnp.sum(un ** 2)

        def loss_ker(v, m, u):
            mn, un = epdiff_step(v, m, u, 0.2, 3, True)
            return jnp.sum(mn * wy) + jnp.sum(un ** 2)

        for arg in (0, 1, 2):
            g_ref = jax.grad(loss_ref, arg)(v, m, u)
            g_ker = jax.grad(loss_ker, arg)(v, m, u)
            np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                       atol=2e-4, rtol=2e-4)

    def test_integration_matches_composite_scan(self):
        # the fused step chained 3x under autodiff == the composite scan
        from cardiax.ops.epdiff_pallas import epdiff_step
        from cardiax.ops.fluid_metric import sharp

        rng = np.random.default_rng(4)
        m0 = jnp.asarray(ndimage.gaussian_filter(
            rng.normal(size=(1, 2, H, W)), 4.0).astype(np.float32) * 20.0)

        def shoot_fused(m0):
            m, u = m0, jnp.zeros_like(m0)
            for _ in range(3):
                v = sharp(m)
                m, u = epdiff_step(v, m, u, 1.0 / 3, 3, True)
            return u

        u_ref, _ = expmap_shooting(m0, n_steps=3, warp_radius=None)
        u_fused = shoot_fused(m0)
        np.testing.assert_allclose(np.asarray(u_fused), np.asarray(u_ref),
                                   atol=1e-4)
        g_ref = jax.grad(lambda m: jnp.sum(
            expmap_shooting(m, n_steps=3, warp_radius=None)[0] ** 2))(m0)
        g_fused = jax.grad(lambda m: jnp.sum(shoot_fused(m) ** 2))(m0)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   atol=2e-3, rtol=2e-3)


class TestFusedSolveEPDiffStep:
    """Fused-solve step kernel (spectral solve v = K m as in-kernel MXU
    matmuls + the fused pointwise core, VERDICT r4 #4) vs the composite
    (sharp -> epdiff_step_reference) path, interpret mode on CPU."""

    def _data(self, n=2, h=24, w=24, seed=0, scale=3.0):
        rng = np.random.default_rng(seed)
        sm = lambda s: ndimage.gaussian_filter(  # noqa: E731
            rng.normal(size=(n, 2, h, w)), 2.5).astype(np.float32) * s
        return jnp.asarray(sm(scale)), jnp.asarray(sm(1.0))

    def test_forward_matches_composite(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step_reference,
                                               epdiff_step_solve)
        from cardiax.ops.fluid_metric import solve_mm_operands
        m, u = self._data()
        ops = solve_mm_operands(24, 24)
        v = sharp(m)
        mr, ur = epdiff_step_reference(v, m, u, 0.2)
        mk, uk = epdiff_step_solve(m, u, *ops, 0.2, 3, True)
        np.testing.assert_allclose(np.asarray(mk), np.asarray(mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(uk), np.asarray(ur), atol=1e-5)

    def test_gradients_match_composite(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step_reference,
                                               epdiff_step_solve)
        from cardiax.ops.fluid_metric import solve_mm_operands
        m, u = self._data(seed=1)
        ops = solve_mm_operands(24, 24)
        wy = jnp.asarray(np.random.default_rng(9).normal(
            size=m.shape).astype(np.float32))

        def loss_ref(m, u):
            mn, un = epdiff_step_reference(sharp(m), m, u, 0.2)
            return jnp.sum(mn * wy) + jnp.sum(un ** 2)

        def loss_ker(m, u):
            mn, un = epdiff_step_solve(m, u, *ops, 0.2, 3, True)
            return jnp.sum(mn * wy) + jnp.sum(un ** 2)

        for arg in (0, 1):
            g_ref = jax.grad(loss_ref, arg)(m, u)
            g_ker = jax.grad(loss_ker, arg)(m, u)
            np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                       atol=2e-4, rtol=2e-4)

    def test_packed_matches_unpacked(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step_solve, pack_items,
                                               unpack_items)
        from cardiax.ops.fluid_metric import solve_mm_operands
        m, u = self._data(n=8, h=16, w=16, seed=2)
        ops1 = solve_mm_operands(16, 16)
        mr, ur = epdiff_step_solve(m, u, *ops1, 0.2, 3, True)
        ops4 = solve_mm_operands(16, 16, 2, 2)
        mp, up = (pack_items(a, 2, 2) for a in (m, u))
        mk, uk = epdiff_step_solve(mp, up, *ops4, 0.2, 3, True, 16, 16)
        np.testing.assert_allclose(np.asarray(unpack_items(mk, 2, 2)),
                                   np.asarray(mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(unpack_items(uk, 2, 2)),
                                   np.asarray(ur), atol=1e-5)


class TestPackedEPDiff:
    """Lane-packed item grids: packed kernels/solves == per-item results."""

    def _fields(self, n=8, h=16, w=16, seed=0):
        rng = np.random.default_rng(seed)
        sm = lambda s: ndimage.gaussian_filter(  # noqa: E731
            rng.normal(size=(n, 2, h, w)), 2.0).astype(np.float32) * s
        return jnp.asarray(sm(3.0)), jnp.asarray(sm(3.0)), \
            jnp.asarray(sm(1.0))

    def test_pack_roundtrip(self):
        from cardiax.ops.epdiff_pallas import pack_items, unpack_items
        x, _, _ = self._fields()
        y = pack_items(x, 2, 2)
        assert y.shape == (2, 2, 32, 32)
        np.testing.assert_array_equal(np.asarray(unpack_items(y, 2, 2)),
                                      np.asarray(x))

    def test_sharp_packed_matches(self):
        from cardiax.ops.epdiff_pallas import pack_items, unpack_items
        from cardiax.ops.fluid_metric import sharp, sharp_packed
        x, _, _ = self._fields(seed=1)
        ref = sharp(x)
        out = unpack_items(sharp_packed(pack_items(x, 2, 2), 16, 16), 2, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_packed_step_matches_unpacked(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step, pack_items,
                                               unpack_items)
        v, m, u = self._fields(seed=2)
        mr, ur = epdiff_step(v, m, u, 0.2, 3, True)
        vp, mp, up = (pack_items(a, 2, 2) for a in (v, m, u))
        mk, uk = epdiff_step(vp, mp, up, 0.2, 3, True, 16, 16)
        np.testing.assert_allclose(np.asarray(unpack_items(mk, 2, 2)),
                                   np.asarray(mr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(unpack_items(uk, 2, 2)),
                                   np.asarray(ur), atol=1e-5)

    def test_packed_step_gradients_match(self):
        from cardiax.ops.epdiff_pallas import (epdiff_step, pack_items,
                                               unpack_items)
        v, m, u = self._fields(seed=3)

        def loss_ref(v, m, u):
            mn, un = epdiff_step(v, m, u, 0.2, 3, True)
            return jnp.sum(mn ** 2) + jnp.sum(un ** 2)

        def loss_pack(v, m, u):
            vp, mp, up = (pack_items(a, 2, 2) for a in (v, m, u))
            mn, un = epdiff_step(vp, mp, up, 0.2, 3, True, 16, 16)
            return jnp.sum(mn ** 2) + jnp.sum(un ** 2)

        for arg in (0, 1, 2):
            g_ref = jax.grad(loss_ref, arg)(v, m, u)
            g_new = jax.grad(loss_pack, arg)(v, m, u)
            np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                       atol=1e-4, rtol=1e-4)


class TestFusedShootingIntegration:
    """The FULL fused scan path (pack plan + zero-pad + packed solve + fused
    kernels, interpret mode) vs the exact gather scan — the code path the TPU
    runs, driven on CPU via the shooting._FORCE_FUSED test hook."""

    @pytest.mark.parametrize("fused_solve", [True, False])
    def test_fused_scan_matches_gather_including_pad(self, monkeypatch,
                                                     fused_solve):
        # fused_solve=True: the shipping path — the spectral solve runs as
        # MXU matmuls INSIDE the step kernel; False: the separate XLA solve
        import cardiax.ops.shooting as sh
        rng = np.random.default_rng(5)
        # batch 5: pack_plan pads to a multiple of pr*pc
        m0 = jnp.asarray(ndimage.gaussian_filter(
            rng.normal(size=(5, 2, H, W)), 4.0).astype(np.float32) * 20.0)
        u_ref, v_ref = expmap_shooting(m0, n_steps=3, warp_radius=None)
        monkeypatch.setattr(sh, "_FORCE_FUSED", True)
        monkeypatch.setattr(sh, "_FUSED_SOLVE", fused_solve)
        u_fused, v_fused = expmap_shooting(m0, n_steps=3, warp_radius=8)
        np.testing.assert_allclose(np.asarray(u_fused), np.asarray(u_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref),
                                   atol=1e-5)
        g_ref = jax.grad(lambda m: jnp.sum(expmap_shooting(
            m, n_steps=3, warp_radius=None)[0] ** 2))(m0)
        g_fused = jax.grad(lambda m: jnp.sum(expmap_shooting(
            m, n_steps=3, warp_radius=8)[0] ** 2))(m0)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   atol=2e-3, rtol=2e-3)


class TestSpectralResize:
    def test_constant_preserved(self):
        from cardiax.ops.fluid_metric import spectral_resize
        x = jnp.full((2, 64, 64), 3.25)
        y = spectral_resize(x, (16, 16))
        np.testing.assert_allclose(np.asarray(y), 3.25, atol=1e-5)
        z = spectral_resize(y, (64, 64))
        np.testing.assert_allclose(np.asarray(z), 3.25, atol=1e-5)

    def test_smooth_field_roundtrip(self):
        from cardiax.ops.fluid_metric import spectral_resize
        yy, xx = np.mgrid[0:64, 0:64] / 64.0
        f = (np.sin(2 * np.pi * 2 * yy) * np.cos(2 * np.pi * 3 * xx)
             ).astype(np.float32)[None]
        down = spectral_resize(jnp.asarray(f), (16, 16))
        up = spectral_resize(down, (64, 64))
        np.testing.assert_allclose(np.asarray(up), f, atol=1e-4)

    def test_bandlimited_shooting_close_to_fullres(self):
        from cardiax.ops.shooting import expmap_shooting
        rng = np.random.default_rng(4)
        m0 = ndimage.gaussian_filter(rng.normal(size=(1, 2, 64, 64)), 6.0)
        m0 = jnp.asarray(m0.astype(np.float32) * 60.0)
        u_full, v_full = expmap_shooting(m0, n_steps=4, warp_radius=None)
        u_band, v_band = expmap_shooting(m0, n_steps=4, warp_radius=None,
                                         shoot_downsample=2)
        np.testing.assert_allclose(np.asarray(v_band), np.asarray(v_full),
                                   atol=1e-5)   # v0 stays full-res
        # band-limited shooting is an approximation (the network trains
        # against its own operator); demand close agreement in RMS for a
        # non-trivial (several-pixel) deformation
        rel_rms = float(jnp.sqrt(jnp.mean((u_band - u_full) ** 2))
                        / jnp.sqrt(jnp.mean(u_full ** 2)))
        assert rel_rms < 0.15, f"band-limited displacement RMS dev {rel_rms:.3f}"
        assert float(jnp.abs(u_full).max()) > 1.0  # deformation non-trivial


class TestTiledBandedWarp:
    """Tiled-kernel parity (frames beyond one VMEM block, SURVEY.md 2.12 /
    VERDICT round 1 #3). The VMEM threshold is monkeypatched so the tiled
    grid runs at test-sized frames under the interpreter."""

    def _data(self, seed=0, n=2, h=48, w=64, amp=6.0):
        rng = np.random.default_rng(seed)
        img = ndimage.gaussian_filter(rng.normal(size=(n, h, w)), 2.0).astype(np.float32)
        disp = np.clip(ndimage.gaussian_filter(rng.normal(size=(n, 2, h, w)), 3.0) * 10,
                       -amp, amp).astype(np.float32)
        return jnp.asarray(img), jnp.asarray(disp)

    def _tiled(self, monkeypatch):
        import cardiax.ops.warp_pallas as wp
        monkeypatch.setattr(wp, "_MAX_VMEM_PIXELS", 1024)
        monkeypatch.setattr(wp, "_MAX_FULL_WARP_PIXELS", 1024)
        monkeypatch.setattr(wp, "_TILE_ROWS", 16)
        return wp

    def test_tile_plan(self):
        from cardiax.ops.warp_pallas import _tile_plan
        assert _tile_plan(1024, 1024, 8) == 64
        assert _tile_plan(1000, 1024, 8) == 8      # 1000 % 64 != 0, % 8 == 0
        assert _tile_plan(1001, 1024, 8) is None   # untileable -> XLA fallback

    def test_tiled_forward_matches_reference(self, monkeypatch):
        wp = self._tiled(monkeypatch)
        img, disp = self._data()
        assert img.shape[-2] * img.shape[-1] > wp._MAX_FULL_WARP_PIXELS
        ref = bilinear_warp(img, disp)
        out = wp.bilinear_warp_banded(img, disp, radius=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_tiled_gradients_match_reference(self, monkeypatch):
        wp = self._tiled(monkeypatch)
        img, disp = self._data(seed=1)
        g_ref = jax.grad(lambda d: jnp.sum(bilinear_warp(img, d) ** 2))(disp)
        g_new = jax.grad(lambda d: jnp.sum(
            wp.bilinear_warp_banded(img, d, radius=8, interpret=True) ** 2))(disp)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)
        gi_ref = jax.grad(lambda i: jnp.sum(bilinear_warp(i, disp) ** 2))(img)
        gi_new = jax.grad(lambda i: jnp.sum(
            wp.bilinear_warp_banded(i, disp, radius=8, interpret=True) ** 2))(img)
        np.testing.assert_allclose(np.asarray(gi_new), np.asarray(gi_ref),
                                   atol=1e-4, rtol=1e-4)

    def test_tiled_edge_blocks_clamp_like_reference(self, monkeypatch):
        """Large vertical displacement at the frame borders: the clamped
        window + global-row hat weights must reproduce the gather's
        border-clip exactly (the wraparound-is-zero-weight argument)."""
        wp = self._tiled(monkeypatch)
        img, disp = self._data(seed=3)
        disp = disp.at[:, 0].set(6.9)   # push everything down, clamp at edge
        ref = bilinear_warp(img, disp)
        out = wp.bilinear_warp_banded(img, disp, radius=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_tiled_large_radius_fori_path(self, monkeypatch):
        """radius 16 (1089 taps > unroll limit) exercises the tiled kernels'
        fori_loop + dynamic-rotate fallback — the path real TPUs take for the
        final image warp on large frames."""
        wp = self._tiled(monkeypatch)
        img, disp = self._data(seed=4, h=64, w=64, amp=10.0)
        ref = bilinear_warp(img, disp)
        out = wp.bilinear_warp_banded(img, disp, radius=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        g_ref = jax.grad(lambda d: jnp.sum(bilinear_warp(img, d) ** 2))(disp)
        g_new = jax.grad(lambda d: jnp.sum(
            wp.bilinear_warp_banded(img, d, radius=16, interpret=True) ** 2))(disp)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)
