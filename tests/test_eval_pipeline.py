"""Pipelined inference (engine.test eval_pipeline, default ON) is bit-exact
vs the synchronous per-batch loop.

The pipelined path dispatches batch k+1's eval step before downloading
batch k's predictions; programs, inputs, and output ORDER are unchanged —
only the host read is deferred, so every pred array and every perf metric
must be exactly equal. Mirrors the guarantee tests/test_epoch_pipeline.py
pins for the training loop.
"""

import numpy as np

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


def _slice_data(n_subjects=5, seed=0):
    data = make_dataset(n_subjects=n_subjects, slices_per_subject=1,
                        h=H, w=W, n_frames=T, seed=seed)
    data = add_displacement_fields(data, seed=seed)
    for i, d in enumerate(data):
        d["slice_full_id"] = f"{d['subject_id']}-{i}"
        d["slice_idx"] = i
        d["augmented"] = False
    return data


def test_eval_pipeline_bit_exact():
    # 7 pairs at batch 3 -> 3 eval batches incl. a padded tail, so the
    # pipelined loop exercises dispatch-ahead, drain, and sample masking
    pairs = make_registration_pairs(_slice_data())[:7]
    splits = {"train": {"data": pairs}, "val": {"data": pairs}}
    datasets = build_datasets(
        {n: {"type": "BasicRegistrationDataset", "data_split": [n]}
         for n in ("train", "val")}, splits)
    cfg = {
        "networks": {"registration": {"type": "RegistrationNet", "features": 8,
                                      "n_levels": 2, "n_integration_steps": 2,
                                      "alpha": 2.0, "gamma": 1.0}},
        "training": {"scheme": "reg", "seed": 0, "batch_size": 3, "epochs": 1,
                     "optimizers": {"registration": {"type": "Adam",
                                                     "learning_rate": 1e-3}}},
        "losses": {}, "saving": {}, "others": {},
    }
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    trained, _ = trainer.train(models=networks, datasets=datasets,
                               trainer_config=cfg["training"],
                               full_config=cfg)

    def run(pipeline):
        tc = dict(cfg["training"])
        tc["eval_pipeline"] = pipeline
        return trainer.test(models=trained, datasets=datasets,
                            trainer_config=tc, full_config=cfg,
                            target_dataset="val")

    preds_p, perf_p, _ = run(True)
    preds_s, perf_s, _ = run(False)

    assert len(preds_p) == len(preds_s) == 7
    for a, b in zip(preds_p, preds_s):
        assert set(a.keys()) == set(b.keys())
        for k in a:
            va, vb = a[k], b[k]
            if isinstance(va, np.ndarray):
                np.testing.assert_array_equal(va, vb, err_msg=k)
            else:
                assert va == vb, k
    assert set(perf_p.keys()) == set(perf_s.keys())
    for k in perf_p:
        assert perf_p[k] == perf_s[k], k
