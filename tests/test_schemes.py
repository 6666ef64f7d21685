"""Integration tests: all remaining training schemes end-to-end on tiny shapes
(BASELINE configs #3-#5). CPU backend, 8 virtual devices."""

import numpy as np
import pytest

from cardiax.data.datasets import build_datasets
from cardiax.data.synthetic import (
    add_displacement_fields,
    make_dataset,
    make_registration_pairs,
)
from cardiax.models import build_model
from cardiax.train import build_trainer

H = W = 16
T = 6
NSEC = 126


def _slice_data(n_subjects=3, seed=0):
    data = make_dataset(n_subjects=n_subjects, slices_per_subject=1,
                        h=H, w=W, n_frames=T, seed=seed)
    data = add_displacement_fields(data, seed=seed)
    for i, d in enumerate(data):
        d["slice_full_id"] = f"{d['subject_id']}-{i}"
        d["slice_idx"] = i
        d["augmented"] = False
    return data


def _train_and_test(cfg, datasets, epochs=2):
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    trained, _ = trainer.train(models=networks, datasets=datasets,
                               trainer_config=cfg["training"], full_config=cfg)
    # guard against silent NaN training (best_epoch stays -1 when every
    # epoch's loss is NaN, since nan < inf is False)
    assert trained["best_epoch"] >= 0, "no epoch improved: training loss was NaN"
    assert np.isfinite(trained["best_val_loss"])
    preds, perf, _ = trainer.test(models=trained, datasets=datasets,
                                  trainer_config=cfg["training"], full_config=cfg,
                                  target_dataset="val")
    return trained, preds, perf


REG_NET = {"type": "RegistrationNet", "features": 8, "n_levels": 2,
           "n_integration_steps": 2, "alpha": 2.0, "gamma": 1.0}


def test_reg_scheme():
    pairs = make_registration_pairs(_slice_data())
    splits = {"train": {"data": pairs}, "val": {"data": pairs[:4]}}
    datasets = build_datasets(
        {n: {"type": "BasicRegistrationDataset", "data_split": [n]}
         for n in ("train", "val")}, splits)
    cfg = {
        "networks": {"registration": REG_NET},
        "training": {"scheme": "reg", "seed": 0, "batch_size": 5, "epochs": 2,
                     "optimizers": {"registration": {"type": "Adam",
                                                     "learning_rate": 1e-3}}},
        "losses": {},   # scheme injects the hardcoded LDDMM default
        "saving": {}, "others": {},
    }
    trained, preds, perf = _train_and_test(cfg, datasets)
    p = preds[0]
    assert p["deformed_source_pred"].shape == (1, H, W)
    assert p["displacement_pred"].shape == (2, H, W)
    assert p["momentum_pred"].shape == (2, H, W)
    assert np.isfinite(perf["final-val/reconstruction_mse"])
    # check the LDDMM default got injected
    assert "registration_reconstruction" in cfg["losses"]


def test_strainmat_pred_scheme():
    data = _slice_data()
    splits = {"train": {"data": data}, "val": {"data": data}}
    datasets = build_datasets(
        {n: {"type": "StrainMatDataset", "data_split": [n],
             "n_frames_to_use_for_regression": T} for n in ("train", "val")}, splits)
    cfg = {
        "networks": {"masks_to_strain_mat": {"type": "NetDisplacement2StrainMat",
                                             "features": 8}},
        "training": {"scheme": "strainmat_pred", "seed": 0, "batch_size": 3,
                     "epochs": 2,
                     "optimizers": {"masks_to_strain_mat": {"type": "Adam",
                                                            "learning_rate": 1e-3}}},
        "losses": {}, "saving": {}, "others": {},
    }
    trained, preds, perf = _train_and_test(cfg, datasets)
    assert preds[0]["strainmat_pred"].shape == (NSEC, T)
    assert np.isfinite(perf["final-val/strainmat_mse"])


def test_strainmat_lma_scheme():
    data = _slice_data()
    splits = {"train": {"data": data}, "val": {"data": data}}
    datasets = build_datasets(
        {n: {"type": "StrainMatDataset", "data_split": [n],
             "n_frames_to_use_for_regression": T} for n in ("train", "val")}, splits)
    cfg = {
        "networks": {
            "strain": {"type": "NetDisplacement2StrainMat", "features": 8},
            "LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 2,
                    "inner_conv_channel_num": 8, "n_frames": T}},
        "training": {"scheme": "strainmat_LMA", "seed": 0, "batch_size": 3,
                     "epochs": 2,
                     "optimizers": {
                         "strain": {"type": "Adam", "learning_rate": 1e-3},
                         "LMA": {"type": "Adam", "learning_rate": 1e-3}}},
        "losses": {}, "saving": {}, "others": {},
    }
    trained, preds, perf = _train_and_test(cfg, datasets)
    assert preds[0]["strainmat_pred"].shape == (NSEC, T)
    assert preds[0]["TOS_pred"].shape == (NSEC,)
    assert np.isfinite(perf["final-val/sector_error"])


def test_joint_registration_strainmat_lma_scheme():
    data = _slice_data(n_subjects=4)
    splits = {"train": {"data": data}, "val": {"data": data[:2]}}
    ts = 12
    datasets = build_datasets(
        {n: {"type": "JointDataset", "data_split": [n],
             "n_myo_frames_to_use_for_regression": T,
             "n_strainmat_frames_to_use_for_regression": ts}
         for n in ("train", "val")}, splits)
    cfg = {
        "networks": {
            "joint_register_strainmat": {
                "type": "JointRegisterStrainMatNet", "strainmat_net_type": "ResNet3D",
                "n_strain_matrix_frames": ts, "strainmat_smoothing_method": "SVD",
                "strainmat_smoothing_SVD_rank": 5, "reg_features": 8,
                "n_integration_steps": 2},
            "LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 2,
                    "inner_conv_channel_num": 8, "n_frames": ts}},
        "training": {"scheme": "joint_registration_strainmat_LMA",
                     "LMA_task": "TOS_regression", "LMA_threshold": 20,
                     "seed": 2434, "batch_size": 4, "epochs": 2,
                     "optimizers": {
                         "joint_register_strainmat": {"type": "Adam",
                                                      "learning_rate": 1e-4},
                         "LMA": {"type": "Adam", "learning_rate": 5e-4}}},
        "losses": {
            "registration_reconstruction": {
                "criterion": "registration_reconstruction", "prediction": "various",
                "target": "registration_target", "weight": 1.0, "sigma": 0.03,
                "regularization_weight": 0.1, "enable": True},
            "registration_supervision": {"criterion": "MSELoss",
                                         "prediction": "strainmat",
                                         "target": "strainmat", "weight": 1000.0,
                                         "enable": True},
            "TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                               "target": "TOS", "weight": 0.005, "enable": True}},
        "saving": {}, "others": {},
    }
    trained, preds, perf = _train_and_test(cfg, datasets)
    p = preds[0]
    assert p["strain_matrix_pred"].shape == (1, NSEC, ts)
    assert p["TOS_pred"].shape == (NSEC,)
    assert np.isfinite(perf["final-val/sector_error"])
    assert "final-val/LMA_accuracy" in perf
    # predicted Lagrangian displacement video is exported (and feeds the
    # engine's banded-warp saturation guard)
    assert p["displacement_pred"].shape[-3] == 2


def test_joint_scheme_rectangular_frames():
    """Full joint scheme at h != w (clinical DENSE frames are often
    rectangular pre-resize; the TPU kernels were full-step-proven at
    768x512 / 1024x512 in round 4 — this pins the shape plumbing on CPU)."""
    h, w, t = 16, 24, 6
    data = make_dataset(n_subjects=3, slices_per_subject=1, h=h, w=w,
                        n_frames=t, seed=5)
    data = add_displacement_fields(data, seed=5)
    for i, d in enumerate(data):
        d["slice_full_id"] = f"{d['subject_id']}-{i}"
        d["slice_idx"] = i
        d["augmented"] = False
    splits = {"train": {"data": data}, "val": {"data": data[:2]}}
    ts = 12
    datasets = build_datasets(
        {n: {"type": "JointDataset", "data_split": [n],
             "n_myo_frames_to_use_for_regression": t,
             "n_strainmat_frames_to_use_for_regression": ts}
         for n in ("train", "val")}, splits)
    cfg = {
        "networks": {
            "joint_register_strainmat": {
                "type": "JointRegisterStrainMatNet",
                "strainmat_net_type": "ResNet3D",
                "n_strain_matrix_frames": ts,
                "strainmat_smoothing_method": "SVD",
                "strainmat_smoothing_SVD_rank": 5, "reg_features": 8,
                "n_integration_steps": 2},
            "LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 2,
                    "inner_conv_channel_num": 8, "n_frames": ts}},
        "training": {"scheme": "joint_registration_strainmat_LMA",
                     "LMA_task": "TOS_regression", "LMA_threshold": 20,
                     "seed": 7, "batch_size": 3, "epochs": 2,
                     "optimizers": {
                         "joint_register_strainmat": {"type": "Adam",
                                                      "learning_rate": 1e-4},
                         "LMA": {"type": "Adam", "learning_rate": 5e-4}}},
        "losses": {
            "registration_reconstruction": {
                "criterion": "registration_reconstruction",
                "prediction": "various", "target": "registration_target",
                "weight": 1.0, "sigma": 0.03,
                "regularization_weight": 0.1, "enable": True},
            "TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                               "target": "TOS", "weight": 0.005,
                               "enable": True}},
        "saving": {}, "others": {},
    }
    trained, preds, perf = _train_and_test(cfg, datasets)
    p = preds[0]
    assert p["strain_matrix_pred"].shape == (1, NSEC, ts)
    assert p["deformed_source_pred"].shape[-2:] == (h, w)
    assert p["displacement_pred"].shape[-2:] == (h, w)
    assert np.isfinite(perf["final-val/sector_error"])


def test_displacement_band_guard_warns():
    import types
    import warnings
    from cardiax.train.engine import TrainerEngine
    ns = types.SimpleNamespace(_warned_disp_band=False, _disp_band=11)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TrainerEngine._check_displacement_band(ns, 5.0)   # far from the band
        assert not w and not ns._warned_disp_band
        TrainerEngine._check_displacement_band(ns, 10.5)  # within 10%
        assert ns._warned_disp_band
        assert any("final_warp_radius" in str(x.message) for x in w)
        n = len(w)
        TrainerEngine._check_displacement_band(ns, 11.0)  # warn once only
        assert len(w) == n


def test_joint_registration_regression_scheme():
    pairs = make_registration_pairs(_slice_data(n_subjects=3))
    splits = {"train": {"data": pairs}, "val": {"data": pairs}}
    datasets = build_datasets(
        {n: {"type": "BasicRegistrationDataset", "data_split": [n],
             "feed_masks": True} for n in ("train", "val")}, splits)
    cfg = {
        "networks": {
            "cine_registraion": REG_NET,
            "LMA": {"type": "NetDisplacement2LMA", "num_conv_layers": 2,
                    "inner_conv_channel_num": 8, "time_axis_last": False}},
        "training": {"scheme": "joint_registration_regression", "seed": 0,
                     "batch_size": 2, "epochs": 2, "LMA_n_frames": 8,
                     "mask_displacement": True,
                     "optimizers": {
                         "cine_registraion": {"type": "Adam", "learning_rate": 1e-3},
                         "LMA": {"type": "Adam", "learning_rate": 1e-3}}},
        "losses": {}, "saving": {}, "others": {},
    }
    trained, preds, perf = _train_and_test(cfg, datasets)
    p = preds[0]
    assert p["TOS_pred"].shape == (NSEC,)
    assert np.isfinite(perf["final-val/sector_error"])


def test_joint_analytic_strain_path():
    """strainmat_net_type='analytic': strain assembled by the physics op
    (north-star fused pipeline) instead of the learned head."""
    import jax
    import jax.numpy as jnp
    from cardiax.models import build_model

    data = _slice_data(n_subjects=2)
    vol = np.stack([d["cine_lv_myo_masks"] for d in data])       # (B, H, W, T)
    vol = np.moveaxis(vol, -1, 1)[:, None]                        # (B, 1, T, H, W)
    src = np.broadcast_to(vol[:, :, :1], vol[:, :, :-1].shape).copy()
    tar = vol[:, :, 1:]

    bundle = build_model({"type": "JointRegisterStrainMatNet",
                          "strainmat_net_type": "analytic",
                          "n_strain_matrix_frames": 12, "reg_features": 8,
                          "n_integration_steps": 2})
    params = jax.jit(bundle.module.init)(jax.random.PRNGKey(0),
                                         jnp.asarray(src), jnp.asarray(tar))
    out = jax.jit(lambda p, s, t: bundle.module.apply(p, s, t))(
        params, jnp.asarray(src), jnp.asarray(tar))
    assert out["strain_matrix"].shape == (2, 1, NSEC, 12)
    assert np.isfinite(np.asarray(out["strain_matrix"])).all()
    # zero-init momentum head => zero displacement => zero strain at init
    assert float(jnp.abs(out["strain_matrix"]).max()) < 1e-5
    # and the path is differentiable end-to-end
    g = jax.grad(lambda p: jnp.sum(bundle.module.apply(
        p, jnp.asarray(src), jnp.asarray(tar))["strain_matrix"] ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_joint_exact_warp_arm_matches_default(monkeypatch):
    """networks.*.exact_warp=true (the all-approximations-OFF qualification
    arm, tools/qualify_stack.py) must run the XLA-gather warp + composite scan
    and agree with the default banded path for in-band displacements.

    Off-TPU the banded arm would silently fall back to the very gather/
    composite path it is compared against (a vacuous self-comparison), so the
    default arm's TPU kernels are FORCED here: the fused Pallas scan via the
    shooting._FORCE_FUSED hook and the banded final warp via interpret=True
    — the same Mosaic-interpreter coverage as tests/test_ops.py."""
    import jax
    import jax.numpy as jnp
    from cardiax.models import build_model
    from cardiax.ops import shooting as sh

    monkeypatch.setattr(sh, "_FORCE_FUSED", True)
    orig_multi = sh.bilinear_warp_banded_multi
    monkeypatch.setattr(
        sh, "bilinear_warp_banded_multi",
        lambda field, disp, radius=8, interpret=None, img_const=False:
            orig_multi(field, disp, radius=radius, interpret=True,
                       img_const=img_const))

    data = _slice_data(n_subjects=2)
    vol = np.stack([d["cine_lv_myo_masks"] for d in data])
    vol = np.moveaxis(vol, -1, 1)[:, None]
    src = np.broadcast_to(vol[:, :, :1], vol[:, :, :-1].shape).copy()
    tar = vol[:, :, 1:]

    base_cfg = {"type": "JointRegisterStrainMatNet",
                "n_strain_matrix_frames": 12, "reg_features": 8,
                "n_integration_steps": 2, "shoot_downsample": 1,
                "strain_downsample": 1, "reg_half_res": False,
                "final_warp_radius": 4}   # keep the interpreted unroll small
    b_def = build_model(base_cfg)
    b_exact = build_model({**base_cfg, "exact_warp": True})
    assert b_exact.module.exact_warp and not b_def.module.exact_warp
    params = jax.jit(b_def.module.init)(jax.random.PRNGKey(0),
                                        jnp.asarray(src), jnp.asarray(tar))
    out_d = jax.jit(lambda p, s, t: b_def.module.apply(p, s, t))(
        params, jnp.asarray(src), jnp.asarray(tar))
    out_e = jax.jit(lambda p, s, t: b_exact.module.apply(p, s, t))(
        params, jnp.asarray(src), jnp.asarray(tar))
    for k in ("deformed_source", "strain_matrix", "displacement"):
        np.testing.assert_allclose(np.asarray(out_d[k]), np.asarray(out_e[k]),
                                   atol=1e-5,
                                   err_msg=f"exact vs banded mismatch on {k}")


def test_temporal_mix_matches_dense_concat():
    """SpatioTemporalBlock's one-matmul temporal mix == Dense over the
    [prev, y, next] concat with the SAME (3F, F) kernel (row blocks
    [W_p; W_y; W_n]) — the formulation it replaced (round-3 perf work)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cardiax.models.strain_net import SpatioTemporalBlock

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 5, 8, 8, 6)).astype(np.float32))
    blk = SpatioTemporalBlock(features=6)
    params = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(blk.apply)(params, x)

    # reference recomputation of the block with explicit concat+Dense mix
    p = params["params"]
    y = jax.lax.conv_general_dilated(
        x.reshape(10, 8, 8, 6), p["Conv_0"]["kernel"].astype(x.dtype),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["Conv_0"]["bias"]
    import flax.linen as nn
    y = nn.GroupNorm(num_groups=6, dtype=jnp.bfloat16).apply(
        {"params": p["GroupNorm_0"]}, y)
    y = nn.gelu(y).reshape(2, 5, 8, 8, 6)
    prev = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    nxt = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
    z = jnp.concatenate([prev, y, nxt], axis=-1).astype(jnp.float32)
    z = z @ p["mix_kernel"] + p["mix_bias"]
    ref = nn.gelu(z.astype(y.dtype) + y)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("variant", ["bandmm", "shiftflat"])
def test_temporal_mix_lowerings_match_shift(variant):
    """tmix='bandmm' (banded T-matmul) and tmix='shiftflat' (folded-layout
    masked major-axis shifts, round 5) == tmix='shift' (concat shift-adds)
    on the SAME params — fwd and param grads. All three are the same math;
    the lowerings exist because at b40 XLA materializes the shift concats /
    the bandmm einsum's layout copies as standalone data-formatting ops
    (STATUS round-4 b40 analysis, VERDICT r4 #5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cardiax.models.strain_net import SpatioTemporalBlock

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 8, 8, 6)).astype(np.float32))
    blk_s = SpatioTemporalBlock(features=6, tmix="shift")
    blk_b = SpatioTemporalBlock(features=6, tmix=variant)
    params = jax.jit(blk_s.init)(jax.random.PRNGKey(0), x)
    # identical param trees: bandmm reuses mix_kernel/mix_bias verbatim
    assert jax.tree_util.tree_structure(jax.jit(blk_b.init)(
        jax.random.PRNGKey(0), x)) == jax.tree_util.tree_structure(params)

    out_s = jax.jit(blk_s.apply)(params, x)
    out_b = jax.jit(blk_b.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out_b, np.float32),
                               np.asarray(out_s, np.float32),
                               atol=2e-2, rtol=2e-2)

    def loss(mod):
        return lambda p: jnp.sum(jnp.square(mod.apply(p, x).astype(jnp.float32)))

    g_s = jax.jit(jax.grad(loss(blk_s)))(params)
    g_b = jax.jit(jax.grad(loss(blk_b)))(params)

    def _check(path, vs, vb):
        # bf16 accumulation-order noise scales with the leaf's magnitude;
        # compare against 2% of the leaf's own scale (elementwise rtol is
        # meaningless on near-zero entries)
        vs = np.asarray(vs, np.float32)
        vb = np.asarray(vb, np.float32)
        # floor: Conv_0/bias's true grad is 0 (GroupNorm subtracts the mean),
        # both modes produce ~1e-4 dust
        scale = max(np.abs(vs).max(), 1e-1)
        np.testing.assert_allclose(vb, vs, atol=2e-2 * scale, rtol=0,
                                   err_msg=f"grad mismatch at {path}")

    jax.tree_util.tree_map_with_path(_check, g_s, g_b)
