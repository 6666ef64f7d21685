"""Synthetic-data generator CLI + engine loss-history contract."""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def test_synthetic_cli_slices_and_pairs(tmp_path):
    out = tmp_path / "s.npy"
    r = subprocess.run(
        [sys.executable, "-m", "cardiax.data.synthetic", "--out", str(out),
         "--subjects", "2", "--slices", "1", "--size", "16", "--frames", "6",
         "--displacements"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    data = np.load(out, allow_pickle=True).tolist()
    assert len(data) == 2
    assert data[0]["cine_lv_myo_masks"].shape == (16, 16, 6)
    assert "displacement_field_X" in data[0]

    pairs_out = tmp_path / "p.npy"
    r = subprocess.run(
        [sys.executable, "-m", "cardiax.data.synthetic", "--out", str(pairs_out),
         "--subjects", "2", "--slices", "1", "--size", "16", "--frames", "6",
         "--pairs"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    pairs = np.load(pairs_out, allow_pickle=True).tolist()
    assert len(pairs) == 10  # 2 slices x 5 Lagrangian pairs
    assert "source_image" in pairs[0] and "DENSE_displacement_field_X" in pairs[0]


def test_exp_dict_loss_history(tmp_path):
    from cardiax.data.datasets import build_datasets
    from cardiax.data.synthetic import make_dataset
    from cardiax.models import build_model
    from cardiax.train import build_trainer

    data = make_dataset(n_subjects=2, slices_per_subject=1, h=16, w=16,
                        n_frames=8, seed=3)
    for i, d in enumerate(data):
        d.update(slice_full_id=f"s{i}", slice_idx=i, augmented=False)
    datasets = build_datasets(
        {"train": {"type": "LMADataset", "data_split": ["train"],
                   "n_frames_to_use_for_regression": 8}},
        {"train": {"data": data}})
    cfg = {"networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                                "inner_conv_channel_num": 4, "n_frames": 8}},
           "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 0,
                        "batch_size": 2, "epochs": 3,
                        "optimizers": {"LMA": {"type": "Adam",
                                               "learning_rate": 1e-3}}},
           "losses": {"TOS_regression": {"criterion": "MSELoss",
                                         "prediction": "TOS", "target": "TOS",
                                         "weight": 1.0}},
           "saving": {}, "others": {}}
    networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    trained, _ = trainer.train(models=networks, datasets=datasets,
                               trainer_config=cfg["training"], full_config=cfg)
    hist = trained["train_loss_dict"]
    assert len(hist["train/total_loss"]) == 3   # one entry per epoch
    assert all(np.isfinite(v) for v in hist["train/total_loss"])
