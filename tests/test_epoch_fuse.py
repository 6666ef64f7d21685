"""training.epoch_fuse: the fused-epoch lax.scan trainer must reproduce the
step-loop trainer exactly — same batch schedule (DeviceBatcher.epoch_plan ==
__iter__), same math (the scan body IS the step core), so same metrics and
same final params. CPU backend, 8 virtual devices (conftest)."""

import numpy as np
import pytest

from cardiax.data.datasets import build_datasets
from cardiax.data.synthetic import add_displacement_fields, make_dataset
from cardiax.models import build_model
from cardiax.train import build_trainer

H = W = 16
T = 6


def _slice_data(n_subjects=4, seed=0):
    data = make_dataset(n_subjects=n_subjects, slices_per_subject=1,
                        h=H, w=W, n_frames=T, seed=seed)
    data = add_displacement_fields(data, seed=seed)
    for i, d in enumerate(data):
        d["slice_full_id"] = f"{d['subject_id']}-{i}"
        d["slice_idx"] = i
        d["augmented"] = False
    return data


def _cfg(epoch_fuse, batch_size=3, epochs=3, mesh=None):
    ts = 12
    return {
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
                     "seed": 2434, "batch_size": batch_size, "epochs": epochs,
                     "device_data_cache": True, "epoch_fuse": epoch_fuse,
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


def _datasets(data):
    ts = 12
    splits = {"train": {"data": data}, "val": {"data": data[:2]}}
    return build_datasets(
        {n: {"type": "JointDataset", "data_split": [n],
             "n_myo_frames_to_use_for_regression": T,
             "n_strainmat_frames_to_use_for_regression": ts}
         for n in ("train", "val")}, splits)


def _run(epoch_fuse, batch_size=3, mesh=None, cfg_extra=None,
         return_trainer=False):
    data = _slice_data()
    datasets = _datasets(data)
    cfg = _cfg(epoch_fuse, batch_size=batch_size)
    if cfg_extra:
        cfg["training"].update(cfg_extra)
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
    trained, _ = trainer.train(models=networks, datasets=datasets,
                               trainer_config=cfg["training"], full_config=cfg)
    if return_trainer:
        return trained, trained["train_loss_dict"], trainer
    return trained, trained["train_loss_dict"]


def _assert_same(a, b, first_tol=1e-4, tol=5e-3, n_steps=6):
    """Fused vs loop is the SAME math compiled in a different fusion context
    (the scan body vs the standalone step program), so it is float-reorder
    equivalent, not bit-identical — the same equivalence class as the fused
    EPDiff kernel and the einsum reorders (STATUS round 2/3). Epoch 0 must
    match tightly (one step of drift); later epochs within compounded-
    reorder drift."""
    (ta, ha), (tb, hb) = a, b
    assert set(ha) == set(hb) and ha
    for k in ha:
        va, vb = np.asarray(ha[k]), np.asarray(hb[k])
        np.testing.assert_allclose(va[0], vb[0], rtol=first_tol,
                                   atol=first_tol, err_msg=f"{k} (epoch 0)")
        np.testing.assert_allclose(va, vb, rtol=tol, atol=tol, err_msg=k)
    assert np.isclose(ta["best_val_loss"], tb["best_val_loss"],
                      rtol=tol, atol=tol)
    import jax
    pa = ta["joint_register_strainmat_model"].params
    pb = tb["joint_register_strainmat_model"].params
    flat_a = jax.tree_util.tree_leaves(pa)
    flat_b = jax.tree_util.tree_leaves(pb)
    # Adam sign-flip rule (same as __graft_entry__._assert_params_equal):
    # a ~0-gradient element whose reorder-dust gradient flips sign walks
    # ~lr per step apart between the variants — bound those by lr*steps and
    # cap their frequency instead of tightening atol below Adam's floor.
    n_total = n_flip = 0
    lr_steps = 5e-4 * n_steps    # max lr x total optimizer steps in this run
    for la, lb in zip(flat_a, flat_b):
        la = np.asarray(la, np.float32)
        lb = np.asarray(lb, np.float32)
        scale = max(float(np.abs(la).max()), 1e-3)
        d = np.abs(la - lb)
        assert float(d.max()) <= max(tol * scale, 2 * lr_steps), \
            (float(d.max()), scale)
        n_total += d.size
        n_flip += int((d > tol * scale).sum())
    assert n_flip <= max(1, n_total // 100), (n_flip, n_total)


def test_epoch_fuse_matches_step_loop():
    fused = _run(True)
    loop = _run(False)
    _assert_same(fused, loop)


def test_auto_engages_at_any_epoch_length():
    """`auto` fuses short AND long epochs — both regimes are TPU-measured
    (round 4: unrolled wins at 5 steps; round 5 probe_fuse_scale: the rolled
    scan wins 1.82x over the step loop at 36 steps/epoch)."""
    # 4 items / batch 3 -> 2 steps <= 16: both train and val fuse (unrolled)
    *_, tr = _run("auto", return_trainer=True)
    assert tr.last_fuse_engaged == (True, True)
    # 4 items / batch 1 -> 4 steps > cap 2: still fused (rolled regime)
    *_, tr = _run("auto", batch_size=1,
                  cfg_extra={"epoch_fuse_max_steps": 2}, return_trainer=True)
    assert tr.last_fuse_engaged == (True, True)


def test_combined_trainval_dispatch_engages_and_matches():
    """When train AND val fuse, each valid_period epoch runs train+val as ONE
    jitted program (engine._build_epoch_trainval_fn) — the round-5 host-wall
    win (-16 ms/epoch, exp_results/host_profile.json). It must (a) actually
    engage (a silent fall-back to separate dispatches would still pass the
    numerics tests), and (b) match the step loop under a mixed
    valid_period=2 schedule, where combined-dispatch epochs interleave with
    train-only-program epochs."""
    *_, tr = _run("auto", return_trainer=True)
    assert tr.last_fuse_engaged == (True, True)
    assert tr.last_fuse_trainval is True

    def run_vp2(epoch_fuse):
        data = _slice_data()
        datasets = _datasets(data)
        cfg = _cfg(epoch_fuse, epochs=4)
        cfg["others"] = {"valid_period": 2}
        networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
        trainer = build_trainer(cfg["training"], None, cfg)
        trained, _ = trainer.train(models=networks, datasets=datasets,
                                   trainer_config=cfg["training"],
                                   full_config=cfg)
        return trained, trained["train_loss_dict"]

    _assert_same(run_vp2(True), run_vp2(False), n_steps=8)


def test_fused_rolled_regime_matches_loop():
    """Epochs past `epoch_fuse_max_steps` run the ROLLED scan (the regime
    probe_fuse_scale measured fastest at 36 steps); math must match the
    step loop."""
    fused = _run("true", batch_size=1, cfg_extra={"epoch_fuse_max_steps": 2})
    loop = _run(False, batch_size=1)
    # 3 epochs x 4 steps; 4 optimizer steps happen before the first val
    # epoch (vs 2 in the batch-3 tests), so epoch-0 reorder drift is larger
    _assert_same(fused, loop, n_steps=12, first_tol=1e-3)


def test_val_fuse_gated_on_train_decision():
    """When the train loader fails to cache (budget) but the val loader
    caches, `auto` must NOT fuse validation: best-epoch selection rides val
    metrics and the run must stay in one numerics regime (ADVICE r4)."""
    data = _slice_data()
    item0 = _datasets(data)["train"][0]
    item_mb = sum(v.nbytes for v in item0.values()
                  if isinstance(v, np.ndarray)) / 2 ** 20
    # budget fits the 2-item val set but not the 4-item train set
    # (cache mode must be "auto" too: `true` force-caches past the budget)
    *_, tr = _run("auto",
                  cfg_extra={"device_data_cache": "auto",
                             "device_data_cache_budget_mb": 3 * item_mb},
                  return_trainer=True)
    assert tr.last_fuse_engaged == (False, False)


def test_epoch_fuse_plan_matches_iter():
    """epoch_plan and __iter__ must consume the SAME permutation stream."""
    from cardiax.data.loader import Batcher, DeviceBatcher, collate  # noqa: F401
    data = _slice_data()
    datasets = _datasets(data)
    ds = datasets["train"]
    a = DeviceBatcher(ds, 3, shuffle=True, seed=5, epoch=2)
    b = DeviceBatcher(ds, 3, shuffle=True, seed=5, epoch=2)
    idx_mat, mask_mat = a.epoch_plan()
    batches = list(b)
    assert idx_mat.shape[0] == len(batches)
    for i, batch in enumerate(batches):
        np.testing.assert_array_equal(mask_mat[i],
                                      np.asarray(batch["sample_mask"]))
    # both advanced their epoch counter identically
    assert a._epoch == b._epoch


def test_epoch_fuse_requested_without_cache_warns():
    data = _slice_data()
    datasets = _datasets(data)
    cfg = _cfg(True)
    cfg["training"]["device_data_cache"] = False
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    with pytest.warns(RuntimeWarning, match="device-resident"):
        trained, _ = trainer.train(models=networks, datasets=datasets,
                                   trainer_config=cfg["training"],
                                   full_config=cfg)
    assert trained["best_epoch"] >= 0


def test_epoch_fuse_resume_equals_uninterrupted(tmp_path):
    """Fused-mode resume certification (round-4 continuity item): an
    interrupted-then-resumed FUSED run must replay the uninterrupted FUSED
    run bit-exactly from the resume epoch. Same bar the step loop met in
    tests/test_checkpoint.py::test_resume_equals_uninterrupted — epoch-
    indexed shuffle + full state in the checkpoint + a deterministic fused
    program. This is the gate for flipping ``epoch_fuse`` to ``auto``."""
    import json

    data = _slice_data()
    datasets = _datasets(data)

    def train(epochs, resume, out):
        cfg = _cfg("true", epochs=epochs)
        cfg["training"]["resume"] = resume
        cfg["saving"] = {"saving_dir": str(out), "save_checkpoint": True}
        networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
        trainer = build_trainer(cfg["training"], None, cfg)
        trainer.train(models=networks, datasets=datasets,
                      trainer_config=cfg["training"], full_config=cfg)

    train(5, False, tmp_path / "full")       # uninterrupted fused 0..4
    train(2, False, tmp_path / "resumed")    # "interrupted" after epoch 1
    train(5, True, tmp_path / "resumed")     # fused resume 2..4

    def epochs_of(out):
        rows = [json.loads(l) for l in open(out / "metrics.jsonl")]
        train_rows = [r for r in rows
                      if any(k.startswith("train/") for k in r)]
        # each epoch must appear EXACTLY once — a duplicate row (e.g. a
        # resume re-logging a completed epoch) would be silently masked by
        # last-row-wins dict construction and the bit-exact comparison could
        # pass against the wrong row (ADVICE r4)
        steps = [r["step"] for r in train_rows]
        assert len(steps) == len(set(steps)), sorted(steps)
        return {r["step"]: r for r in train_rows}

    full = epochs_of(tmp_path / "full")
    resumed = epochs_of(tmp_path / "resumed")
    assert set(full) == set(resumed) == {0, 1, 2, 3, 4}
    n_exact = 0
    for e in (2, 3, 4):   # post-resume epochs must match bit-for-bit
        for k, v in full[e].items():
            if isinstance(v, float):
                assert v == resumed[e][k], (e, k, v, resumed[e][k])
                n_exact += 1
    assert n_exact > 0


def test_epoch_fuse_8dev_mesh_matches_loop():
    """Fused epochs under a data-sharded mesh == the step loop (the gather's
    sharding constraints mirror the DeviceBatcher's out_shardings)."""
    import jax
    from cardiax.parallel.mesh import get_mesh
    mesh = get_mesh()
    fused = _run(True, batch_size=4, mesh=mesh)   # 4 % 8 != 0 -> replicated
    loop = _run(False, batch_size=4, mesh=mesh)
    _assert_same(fused, loop)
