"""Checkpoint/resume: exact state restore (SURVEY.md section 5.4 build goal)."""

import jax.numpy as jnp
import numpy as np

from cardiax.io.checkpoints import CheckpointManager


def test_save_restore_roundtrip(tmp_path):
    params = {"LMA": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}}
    opt = {"LMA": {"mu": jnp.zeros((2, 3)), "count": jnp.asarray(7)}}
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    assert mgr.latest_epoch() is None
    mgr.save(0, params, opt, extra={"epoch": 0, "best_val": 1.5}, force=True)
    mgr.save(1, params, opt, extra={"epoch": 1, "best_val": 0.5}, force=True)
    mgr.wait()
    assert mgr.latest_epoch() == 1
    state = mgr.restore(template={"params": params, "opt_states": opt,
                                  "extra": {"epoch": 0, "best_val": 0.0}})
    np.testing.assert_array_equal(np.asarray(state["params"]["LMA"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert state["extra"]["epoch"] == 1
    assert state["extra"]["best_val"] == 0.5
    mgr.close()


def test_retention_policy(tmp_path):
    params = {"m": jnp.ones(2)}
    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    for e in range(5):
        mgr.save(e, params, {}, extra={"epoch": e}, force=True)
    mgr.wait()
    assert mgr.latest_epoch() == 4
    # only 2 kept
    kept = sorted(int(p.name) for p in (tmp_path / "ck").iterdir()
                  if p.name.isdigit())
    assert len(kept) <= 2
    mgr.close()


def test_engine_resume_continues_from_checkpoint(tmp_path):
    """Train 2 epochs with checkpointing, then resume to 4: the resumed run
    must start at epoch 2 (exact state restore, SURVEY.md 5.4)."""
    import json

    from cardiax.data.datasets import build_datasets
    from cardiax.data.synthetic import make_dataset
    from cardiax.models import build_model
    from cardiax.train import build_trainer

    data = make_dataset(n_subjects=2, slices_per_subject=1, h=16, w=16,
                        n_frames=8, seed=5)
    for i, d in enumerate(data):
        d.update(slice_full_id=f"s{i}", slice_idx=i, augmented=False)
    datasets = build_datasets(
        {"train": {"type": "LMADataset", "data_split": ["train"],
                   "n_frames_to_use_for_regression": 8}},
        {"train": {"data": data}})

    def cfg(epochs, resume):
        return {
            "networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                                 "inner_conv_channel_num": 4, "n_frames": 8}},
            "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 0,
                         "batch_size": 2, "epochs": epochs, "resume": resume,
                         "optimizers": {"LMA": {"type": "Adam",
                                                "learning_rate": 1e-3}}},
            "losses": {"TOS_regression": {"criterion": "MSELoss",
                                          "prediction": "TOS", "target": "TOS",
                                          "weight": 1.0}},
            "saving": {"saving_dir": str(tmp_path), "save_checkpoint": True},
            "others": {},
        }

    c1 = cfg(2, False)
    networks = {n: build_model(mc) for n, mc in c1["networks"].items()}
    t1 = build_trainer(c1["training"], None, c1)
    t1.train(models=networks, datasets=datasets,
             trainer_config=c1["training"], full_config=c1)

    c2 = cfg(4, True)
    networks2 = {n: build_model(mc) for n, mc in c2["networks"].items()}
    t2 = build_trainer(c2["training"], None, c2)
    t2.train(models=networks2, datasets=datasets,
             trainer_config=c2["training"], full_config=c2)

    steps = [json.loads(l).get("step")
             for l in open(tmp_path / "metrics.jsonl") if '"step"' in l]
    steps = [s for s in steps if s is not None]
    # run 1 logs epochs 0,1 (+best); run 2 resumes at 2 and logs 2,3 (+best)
    assert 0 in steps and 1 in steps and 2 in steps and 3 in steps
    first_resumed = steps[steps.index(1) + 1]
    assert first_resumed >= 1, steps   # no restart from 0
    assert steps.count(0) == 1, f"resumed run retrained epoch 0: {steps}"


def test_resume_equals_uninterrupted(tmp_path):
    """Interrupt-at-k + resume reproduces the uninterrupted run's epoch-k..N
    metrics EXACTLY: epoch-indexed shuffle + full early-stop state in the
    checkpoint (VERDICT r3 #3's resumed-equals-uninterrupted spot check,
    here as a permanent CPU test)."""
    import json

    from cardiax.data.datasets import build_datasets
    from cardiax.data.synthetic import make_dataset
    from cardiax.models import build_model
    from cardiax.train import build_trainer

    data = make_dataset(n_subjects=3, slices_per_subject=2, h=16, w=16,
                        n_frames=8, seed=9)
    for i, d in enumerate(data):
        d.update(slice_full_id=f"s{i}", slice_idx=i, augmented=False)
    datasets = build_datasets(
        {"train": {"type": "LMADataset", "data_split": ["train"],
                   "n_frames_to_use_for_regression": 8}},
        {"train": {"data": data}})

    def cfg(epochs, resume, out):
        return {
            "networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                                 "inner_conv_channel_num": 4, "n_frames": 8}},
            "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 3,
                         "batch_size": 4, "epochs": epochs, "resume": resume,
                         "optimizers": {"LMA": {"type": "Adam",
                                                "learning_rate": 1e-3}}},
            "losses": {"TOS_regression": {"criterion": "MSELoss",
                                          "prediction": "TOS", "target": "TOS",
                                          "weight": 1.0}},
            "saving": {"saving_dir": str(out), "save_checkpoint": True},
            "others": {},
        }

    def train(epochs, resume, out):
        c = cfg(epochs, resume, out)
        networks = {n: build_model(mc) for n, mc in c["networks"].items()}
        t = build_trainer(c["training"], None, c)
        t.train(models=networks, datasets=datasets,
                trainer_config=c["training"], full_config=c)

    train(5, False, tmp_path / "full")          # uninterrupted 0..4
    train(2, False, tmp_path / "resumed")       # "interrupted" after epoch 1
    train(5, True, tmp_path / "resumed")        # resume 2..4

    def epochs_of(out):
        rows = [json.loads(l) for l in open(out / "metrics.jsonl")]
        return {r["step"]: r for r in rows
                if any(k.startswith("train/") for k in r)}

    full, resumed = epochs_of(tmp_path / "full"), epochs_of(tmp_path / "resumed")
    assert set(full) == set(resumed) == {0, 1, 2, 3, 4}
    for e in (2, 3, 4):   # the resumed epochs must match bit-for-bit
        for k, v in full[e].items():
            if isinstance(v, float):
                assert v == resumed[e][k], (e, k, v, resumed[e][k])
