"""Local-grid sweep runner over the LMA scheme."""

import json

import numpy as np

from cardiax.config.sweep import apply_sweep_params
from cardiax.data.synthetic import make_dataset, save_npy
from cardiax.sweep import expand_grid, run_sweep

T = 10


def test_expand_grid():
    grid = expand_grid({"parameters": {
        "training--batch_size": {"values": [2, 4]},
        "losses--TOS_regression--weight": {"values": [1.0, 0.5]},
        "training--seed": {"value": 7},
    }})
    assert len(grid) == 4
    assert all(g["training--seed"] == 7 for g in grid)


def test_apply_sweep_params():
    cfg = {"training": {"batch_size": 10}}
    out = apply_sweep_params(cfg, {"training--batch_size": {"value": 4}})
    assert out["training"]["batch_size"] == 4


def test_run_sweep_grid(tmp_path):
    p = tmp_path / "s.npy"
    save_npy(str(p), make_dataset(n_subjects=3, slices_per_subject=1,
                                  h=16, w=16, n_frames=T, seed=30))
    cfg = {
        "info": {"experiment_name": "sweep-test"},
        "data": {"npy_filename": str(p),
                 "data_to_feed": [{"key": "strain_matrix"}, {"key": "TOS"}]},
        "data_split": {"method": "by_pattern", "splits": {
            "train": {"patterns": [".*"], "exclude_patterns": [".*CT00.*"]},
            "val": {"patterns": [".*CT00.*"]}}},
        "datasets": {n: {"type": "LMADataset", "data_split": [n],
                         "n_frames_to_use_for_regression": T}
                     for n in ("train", "val")},
        "networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                             "inner_conv_channel_num": 4, "n_frames": T}},
        "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 0,
                     "batch_size": 2, "epochs": 2,
                     "optimizers": {"LMA": {"type": "Adam",
                                            "learning_rate": 1e-3}}},
        "losses": {"TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                      "target": "TOS", "weight": 1.0}},
        "saving": {"save_prediction": False, "saving_dir": str(tmp_path / "sw")},
        "others": {"use_wandb": False},
    }
    sweep_def = {"metric": {"name": "final-val/sector_error", "goal": "minimize"},
                 "parameters": {"training--optimizers--LMA--learning_rate":
                                {"values": [1e-3, 3e-3]}}}
    results = run_sweep(cfg, sweep_def, mode="grid")
    assert len(results) == 2
    assert all(r["score"] is not None and np.isfinite(r["score"])
               for r in results)
