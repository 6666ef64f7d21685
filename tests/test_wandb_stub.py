"""Execute the wandb writer + sweep paths via an injected stub module
(VERDICT r2 weak #5: the branch had never run — wandb isn't installed here,
so a typo'd ``wandb.init`` kwarg would surface only in production).

Reference semantics being certified: ``wandb.init(anonymous='must', mode=...)``
and per-epoch dict logging + ``best-`` relogs
(/root/reference/modules/trainer/joint_registration_strainmat_LMA.py:133-170,
251-258), and sweep registration/agent dispatch (config.py:244-263)."""

import json
import sys
import types

import numpy as np
import pytest

from cardiax.io.metrics import MetricsTracker

T = 10


class _FakeRun:
    def __init__(self, rec):
        self._rec = rec

    def log(self, metrics, step=None):
        self._rec["logs"].append((step, dict(metrics)))

    def finish(self):
        self._rec["finished"] = True


@pytest.fixture
def fake_wandb(monkeypatch):
    rec = {"init_kwargs": [], "logs": [], "finished": False,
           "sweeps": [], "agent_sweep_id": None}
    mod = types.ModuleType("wandb")
    mod._rec = rec

    def init(**kwargs):
        rec["init_kwargs"].append(dict(kwargs))
        return _FakeRun(rec)

    def log(metrics, step=None):
        rec["logs"].append((step, dict(metrics)))

    def sweep(sweep_def, project=None):
        rec["sweeps"].append((dict(sweep_def), project))
        return "sweep-id-1"

    def agent(sweep_id, function=None, count=None):
        rec["agent_sweep_id"] = sweep_id
        function()

    mod.init = init
    mod.log = log
    mod.sweep = sweep
    mod.agent = agent
    mod.config = {}
    monkeypatch.setitem(sys.modules, "wandb", mod)
    monkeypatch.setenv("WANDB_MODE", "offline")
    return mod


def test_tracker_init_log_best_finish(fake_wandb, tmp_path):
    rec = fake_wandb._rec
    t = MetricsTracker(use_wandb=True, log_dir=str(tmp_path), quiet=True,
                       run_name="cardiax-test", wandb_config={"lr": 1e-3})
    assert t._wandb is not None, "stubbed wandb writer failed to start"
    (kw,) = rec["init_kwargs"]
    assert kw["project"] == "cardiax-test"
    assert kw["anonymous"] == "must"
    assert kw["mode"] == "offline"
    assert kw["config"] == {"lr": 1e-3}

    t.log({"train/total_loss": 1.5}, step=0)
    t.log({"train/total_loss": 1.2}, step=1)
    t.log_best({"val/total_loss": 0.9, "epoch_time": 3}, step=1)
    t.finish()

    steps = [s for s, _ in rec["logs"]]
    assert steps[:2] == [0, 1]
    assert rec["logs"][0][1]["train/total_loss"] == 1.5
    best = rec["logs"][2][1]
    assert best["best-val/total_loss"] == 0.9 and best["best-epoch_time"] == 3
    assert rec["finished"]


def _tiny_lma_config(tmp_path, extra_others=None):
    from cardiax.data.synthetic import make_dataset, save_npy
    p = tmp_path / "slices.npy"
    save_npy(str(p), make_dataset(n_subjects=3, slices_per_subject=1,
                                  h=16, w=16, n_frames=T, seed=21))
    return {
        "info": {"experiment_name": "wandb-stub-test"},
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
                     "batch_size": 2, "epochs": 2,
                     "optimizers": {"LMA": {"type": "Adam",
                                            "learning_rate": 3e-3}}},
        "losses": {"TOS_regression": {"criterion": "MSELoss",
                                      "prediction": "TOS", "target": "TOS",
                                      "weight": 1.0}},
        "saving": {"save_final_model": False, "save_prediction": False,
                   "saving_dir": str(tmp_path / "out")},
        "others": {"use_wandb": True, **(extra_others or {})},
    }


def test_engine_drives_wandb_epoch_logs(fake_wandb, tmp_path):
    """Full CLI train with others.use_wandb=true: the engine's per-epoch
    metric dicts and the final best- relog land in wandb.log."""
    from cardiax.main import run
    rec = fake_wandb._rec
    run(_tiny_lma_config(tmp_path))

    assert rec["init_kwargs"], "trainer never called wandb.init"
    assert rec["init_kwargs"][0]["anonymous"] == "must"
    epoch_logs = [m for s, m in rec["logs"] if "train/total_loss" in m]
    assert len(epoch_logs) >= 2, "per-epoch dicts not logged"
    assert any(any(k.startswith("best-") for k in m) for _, m in rec["logs"]), \
        "best- relog missing"
    assert rec["finished"], "wandb run not finished at exit"


def test_sweep_wandb_mode(fake_wandb, tmp_path):
    """cardiax.sweep --mode wandb registers the sweep and the agent runs the
    config with wandb.config's params applied."""
    from cardiax.sweep import run_sweep
    rec = fake_wandb._rec
    fake_wandb.config = {
        "training--optimizers--LMA--learning_rate": 5e-3}
    sweep_def = {"method": "grid",
                 "metric": {"name": "final-val/sector_error",
                            "goal": "minimize"},
                 "parameters": {"training--optimizers--LMA--learning_rate":
                                {"values": [5e-3]}}}
    cfg = _tiny_lma_config(tmp_path, extra_others={"use_wandb": False})
    run_sweep(cfg, sweep_def, mode="wandb")

    assert rec["sweeps"] and rec["sweeps"][0][0]["method"] == "grid"
    assert rec["sweeps"][0][1] == "wandb-stub-test"
    assert rec["agent_sweep_id"] == "sweep-id-1"
    # the agent ran the config and logged final performance dicts
    perf_logs = [m for _, m in rec["logs"]
                 if any(k.startswith("final-") for k in m)]
    assert perf_logs, "agent did not log final performance"
