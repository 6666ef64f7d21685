"""End-to-end LMA scheme: strain matrix -> TOS regression (BASELINE config #1/#2).

Exercises config -> data -> model -> engine -> losses -> metrics on the CPU
backend with an 8-device mesh, i.e. the full minimum slice of the framework.
"""

import numpy as np
import pytest

from cardiax.data import load_data
from cardiax.data.datasets import build_datasets
from cardiax.data.split import split_data
from cardiax.data.synthetic import make_dataset, save_npy
from cardiax.losses.calculator import LossCalculator
from cardiax.losses.metrics import get_average_performance_dict
from cardiax.models import build_model
from cardiax.train import build_trainer

H, W, T, NSEC = 24, 24, 16, 126


@pytest.fixture(scope="module")
def pipeline_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("lma") / "slices.npy"
    save_npy(str(p), make_dataset(n_subjects=6, slices_per_subject=2,
                                  h=H, w=W, n_frames=T, seed=11))
    return {
        "info": {"experiment_name": "test-LMA"},
        "data": {"npy_filename": str(p), "n_read": -1,
                 "data_to_feed": [{"key": "strain_matrix"}, {"key": "TOS"}]},
        "data_split": {"method": "by_pattern", "splits": {
            "train": {"patterns": [".*"], "exclude_patterns": [".*CT0[01].*"]},
            "val": {"patterns": [".*CT00.*"]},
            "test": {"patterns": [".*CT01.*"]}}},
        "datasets": {name: {"type": "LMADataset", "data_split": [name],
                            "n_frames_to_use_for_regression": T}
                     for name in ("train", "val", "test")},
        "networks": {"LMA": {"type": "NetStrainMat2LMA", "LMA_task": "TOS_regression",
                             "num_conv_layers": 2, "inner_conv_channel_num": 8,
                             "n_frames": T, "n_sectors": NSEC}},
        "training": {"scheme": "LMA", "LMA_task": "TOS_regression",
                     "LMA_modality": "strain_mat", "seed": 0,
                     "batch_size": 4, "epochs": 30,
                     "epochs_without_improvement_tolerance": 50,
                     "optimizers": {"LMA": {"type": "Adam", "learning_rate": 3e-3,
                                            "weight_decay": 1e-4,
                                            "lr_scheduler": {"enable": True,
                                                             "type": "CosineAnnealingLR",
                                                             "T_max": 30,
                                                             "eta_min": 1e-5}}}},
        "losses": {"TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                      "target": "TOS", "weight": 1.0, "enable": True}},
        "saving": {"save_prediction": False, "save_final_model": False},
        "others": {"use_wandb": False},
    }


def test_loss_calculator_weights():
    calc = LossCalculator({
        "a": {"criterion": "MSELoss", "prediction": "x", "target": "x", "weight": 2.0},
        "off": {"criterion": "MSELoss", "prediction": "x", "target": "x",
                "weight": 5.0, "enable": False},
    })
    import jax.numpy as jnp
    out = {"x": jnp.ones((2, 3))}
    tgt = {"x": jnp.zeros((2, 3))}
    total, vals = calc(out, tgt)
    assert float(vals["a"]) == pytest.approx(1.0)
    assert float(total) == pytest.approx(2.0)
    assert "off" not in vals


def test_lma_train_learns_and_test_exports(pipeline_cfg):
    cfg = pipeline_cfg
    data = load_data(cfg["data"])
    splits = split_data(data, cfg["data_split"])
    datasets = build_datasets(cfg["datasets"], splits, cfg)
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)

    trained, tracker = trainer.train(models=networks, datasets=datasets,
                                     trainer_config=cfg["training"], full_config=cfg)
    assert "LMA_model" in trained
    assert trained["best_epoch"] >= 0

    preds, perf, _ = trainer.test(models=trained, datasets=datasets,
                                  trainer_config=cfg["training"], full_config=cfg,
                                  target_dataset="test")
    assert len(preds) == 2  # 2 real test slices, padding excluded
    p = preds[0]
    assert p["TOS_pred"].shape == (NSEC,)
    assert p["TOS"].shape == (NSEC,)
    assert "slice_full_id" in p
    err = perf["final-test/sector_error"]
    # untrained softplus head starts around |TOS|~5-20 frames error; training
    # on consistent synthetic data must reach a clearly-learned level
    assert err < 8.0, f"sector_error {err} — LMA head failed to learn"


def test_lma_sector_classification(pipeline_cfg):
    cfg = {**pipeline_cfg}
    cfg["networks"] = {"LMA": {"type": "NetStrainMat2LMA",
                               "LMA_task": "LMA_sector_classification",
                               "num_conv_layers": 2, "inner_conv_channel_num": 8,
                               "n_frames": T, "n_sectors": NSEC}}
    cfg["training"] = {**pipeline_cfg["training"],
                       "LMA_task": "LMA_sector_classification", "epochs": 10}
    cfg["losses"] = {"sector_CE": {"criterion": "CrossEntropyLoss",
                                   "prediction": "sector_LMA_labels",
                                   "target": "sector_LMA_labels", "weight": 1.0}}
    data = load_data(cfg["data"])
    splits = split_data(data, cfg["data_split"])
    datasets = build_datasets(cfg["datasets"], splits, cfg)
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    trained, _ = trainer.train(models=networks, datasets=datasets,
                               trainer_config=cfg["training"], full_config=cfg)
    preds, perf, _ = trainer.test(models=trained, datasets=datasets,
                                  trainer_config=cfg["training"], full_config=cfg,
                                  target_dataset="val")
    assert preds[0]["sector_LMA_labels_pred"].shape == (2, NSEC)
    assert perf["final-val/accuracy"] > 0.6


def test_average_performance_dict():
    folds = [{"fold0/final-val/sector_error": 10.0},
             {"fold1/final-val/sector_error": 20.0}]
    avg = get_average_performance_dict(folds)
    assert avg["average/final-val/sector_error"] == pytest.approx(15.0)


def test_valid_period_and_early_stop_metric(pipeline_cfg):
    """others.valid_period skips val epochs; early_stop_metric selects the
    monitored metric (reference --valid-period / --early-stop-metric)."""
    import copy
    cfg = copy.deepcopy(pipeline_cfg)
    cfg["training"]["epochs"] = 6
    cfg["training"]["early_stop_metric"] = "val/TOS_regression"
    cfg["others"]["valid_period"] = 3
    data = load_data(cfg["data"])
    splits = split_data(data, cfg["data_split"])
    datasets = build_datasets(cfg["datasets"], splits, cfg)
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    trained, tracker = trainer.train(models=networks, datasets=datasets,
                                     trainer_config=cfg["training"],
                                     full_config=cfg)
    hist = trained["train_loss_dict"]
    val_epochs = len(hist.get("val/TOS_regression", []))
    train_epochs = len(hist["train/total_loss"])
    assert train_epochs == 6
    assert val_epochs == 3          # epochs 0, 3, and the final epoch 5
    assert trained["best_epoch"] in (0, 3, 5)  # only evaluated epochs qualify


def test_training_test_false_skips_inference(pipeline_cfg, tmp_path):
    import copy
    from cardiax.main import run
    cfg = copy.deepcopy(pipeline_cfg)
    cfg["training"]["epochs"] = 1
    cfg["training"]["test"] = False
    cfg["saving"]["saving_dir"] = str(tmp_path)
    results = run(cfg)
    assert "val_performance" not in results
    assert "test_performance" not in results
