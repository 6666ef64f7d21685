"""CLI orchestration: train -> save -> inference_only reload roundtrip."""

import json

import numpy as np

from cardiax.data.synthetic import make_dataset, save_npy
from cardiax.main import main

T = 10


def _cfg(tmp_path):
    p = tmp_path / "slices.npy"
    save_npy(str(p), make_dataset(n_subjects=3, slices_per_subject=1,
                                  h=16, w=16, n_frames=T, seed=21))
    cfg = {
        "info": {"experiment_name": "cli-test"},
        "data": {"npy_filename": str(p),
                 "data_to_feed": [{"key": "strain_matrix"}, {"key": "TOS"}]},
        "data_split": {"method": "by_pattern", "splits": {
            "train": {"patterns": [".*"], "exclude_patterns": [".*CT00.*"]},
            "val": {"patterns": [".*CT00.*"]},
            "test": {"patterns": [".*CT00.*"]}}},
        "datasets": {n: {"type": "LMADataset", "data_split": [n],
                         "n_frames_to_use_for_regression": T}
                     for n in ("train", "val", "test")},
        "networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                             "inner_conv_channel_num": 4, "n_frames": T}},
        "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 0,
                     "batch_size": 2, "epochs": 3,
                     "optimizers": {"LMA": {"type": "Adam",
                                            "learning_rate": 3e-3}}},
        "losses": {"TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                      "target": "TOS", "weight": 1.0}},
        "saving": {"save_final_model": True, "save_prediction": True,
                   "saving_dir": str(tmp_path / "out")},
        "others": {"use_wandb": False},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return cfg_path, tmp_path / "out"


def test_train_then_inference_only_reload(tmp_path):
    cfg_path, out = _cfg(tmp_path)
    res = main(["--config-file", str(cfg_path)])
    trained_err = res["test_performance"]["final-test/sector_error"]
    assert (out / "model-LMA.msgpack").exists()
    assert (out / "test_pred.npy").exists()

    # inference-only run must reload the trained params and reproduce the
    # trained-quality predictions (not re-randomized ones)
    res2 = main(["--config-file", str(cfg_path),
                 "--training--inference_only=true"])
    reloaded_err = res2["test_performance"]["final-test/sector_error"]
    assert np.isclose(reloaded_err, trained_err, rtol=1e-4), \
        f"reloaded {reloaded_err} vs trained {trained_err}"

    preds = np.load(out / "test_pred.npy", allow_pickle=True).tolist()
    assert preds[0]["TOS_pred"].shape == (126,)


def test_epoch_walltime_metric_opt_in(tmp_path):
    """training.log_epoch_walltime stamps time/epoch_wall_s per epoch row;
    it stays OFF by default (extra keys would break bit-equality row
    comparisons, tools/stability_run.py)."""
    cfg_path, out = _cfg(tmp_path)
    main(["--config-file", str(cfg_path),
          "--training--log_epoch_walltime=true"])
    rows = [json.loads(l) for l in open(out / "metrics.jsonl")]
    epoch_rows = [r for r in rows if any(k.startswith("train/") for k in r)]
    assert epoch_rows and all("time/epoch_wall_s" in r for r in epoch_rows)
    assert all(r["time/epoch_wall_s"] > 0 for r in epoch_rows)

    # default: the key is absent
    out2 = tmp_path / "out2"
    main(["--config-file", str(cfg_path),
          f"--saving--saving_dir={out2}"])
    rows2 = [json.loads(l) for l in open(out2 / "metrics.jsonl")]
    assert not any("time/epoch_wall_s" in r for r in rows2)
