"""K-fold CV driver end-to-end on the LMA scheme (tiny)."""

import numpy as np

from cardiax.data.synthetic import make_dataset, save_npy
from cardiax.kfold import run_kfold

T = 10


def test_run_kfold(tmp_path):
    p = tmp_path / "slices.npy"
    save_npy(str(p), make_dataset(n_subjects=4, slices_per_subject=1,
                                  h=16, w=16, n_frames=T, seed=9))
    cfg = {
        "info": {"experiment_name": "kfold-test"},
        "data": {"npy_filename": str(p),
                 "data_to_feed": [{"key": "strain_matrix"}, {"key": "TOS"}]},
        "data_split": {},
        "datasets": {n: {"type": "LMADataset", "data_split": [n],
                         "n_frames_to_use_for_regression": T}
                     for n in ("train", "val", "test")},
        "networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                             "inner_conv_channel_num": 4, "n_frames": T}},
        "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 0,
                     "batch_size": 2, "epochs": 2,
                     "optimizers": {"LMA": {"type": "Adam", "learning_rate": 1e-3}}},
        "losses": {"TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                      "target": "TOS", "weight": 1.0}},
        "saving": {}, "others": {},
    }
    folds = [[".*CT00.*"], [".*CT01.*"], [".*CT02.*"], [".*CT03.*"]]
    out = run_kfold(cfg, folds)
    assert len(out["folds"]) == 4
    # fold-prefixed metrics present and averaged correctly
    f0 = out["folds"][0]["performance"]
    assert any(k.startswith("fold0/final-test/") for k in f0)
    avg_key = "average/final-test/sector_error"
    assert avg_key in out["average"]
    per_fold = [v for r in out["folds"]
                for k, v in r["performance"].items()
                if k.endswith("final-test/sector_error")]
    assert np.isclose(out["average"][avg_key], np.mean(per_fold))
