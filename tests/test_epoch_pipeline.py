"""training.epoch_pipeline: the pipelined fused-epoch loop (dispatch epoch
k+1 before syncing epoch k's metrics) must be BIT-IDENTICAL to the
synchronous fused loop — the same jitted programs run on the same inputs in
the same order; only the host-side metric read is deferred and the
best-params snapshot moves to a pre-donation device copy. CPU backend,
8 virtual devices (conftest)."""

import numpy as np
import pytest

from cardiax.models import build_model
from cardiax.train import build_trainer

from test_epoch_fuse import _cfg, _datasets, _slice_data


def _run(epoch_pipeline, epoch_fuse="true", epochs=4, cfg_extra=None,
         saving=None):
    data = _slice_data()
    datasets = _datasets(data)
    cfg = _cfg(epoch_fuse, epochs=epochs)
    cfg["training"]["epoch_pipeline"] = epoch_pipeline
    if cfg_extra:
        cfg["training"].update(cfg_extra)
    if saving:
        cfg["saving"] = saving
    networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    trained, _ = trainer.train(models=networks, datasets=datasets,
                               trainer_config=cfg["training"],
                               full_config=cfg)
    return trained, trained["train_loss_dict"], trainer


def _assert_bit_identical(a, b):
    (ta, ha, _), (tb, hb, _) = a, b
    assert set(ha) == set(hb) and ha
    for k in ha:
        np.testing.assert_array_equal(np.asarray(ha[k]), np.asarray(hb[k]),
                                      err_msg=k)
    assert ta["best_epoch"] == tb["best_epoch"]
    assert ta["best_val_loss"] == tb["best_val_loss"]
    import jax
    pa = jax.tree_util.tree_leaves(
        ta["joint_register_strainmat_model"].params)
    pb = jax.tree_util.tree_leaves(
        tb["joint_register_strainmat_model"].params)
    for la, lb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_pipeline_bit_identical_to_sync():
    """Pipelined vs synchronous fused training: metrics history, best-epoch
    selection, and final (best) params must all be exactly equal."""
    piped = _run(True)
    sync = _run(False)
    assert piped[2].last_pipeline_engaged is True
    assert sync[2].last_pipeline_engaged is False
    _assert_bit_identical(piped, sync)


def test_pipeline_bit_identical_with_early_stop():
    """A run that early-stops must stop at the same epoch with the same
    best-params whether or not an epoch was speculatively in flight."""
    # tolerance 0 + an oscillation-inducing LR so the monitored val loss
    # regresses within a few epochs and the stop actually fires
    extra = {"epochs_without_improvement_tolerance": 0,
             "optimizers": {
                 "joint_register_strainmat": {"type": "Adam",
                                              "learning_rate": 5e-2},
                 "LMA": {"type": "Adam", "learning_rate": 5e-2}}}
    piped = _run(True, epochs=8, cfg_extra=extra)
    sync = _run(False, epochs=8, cfg_extra=extra)
    _assert_bit_identical(piped, sync)
    # the early stop actually fired (fewer epochs than requested), else this
    # test degenerates into the plain equality test above
    n_epochs = len(next(iter(piped[1].values())))
    assert n_epochs < 8, n_epochs


def test_pipeline_bit_identical_valid_period():
    """valid_period > 1 interleaves combined train+val dispatches with
    train-only dispatches; the pipeline must handle both record shapes."""
    def run(pipe):
        data = _slice_data()
        datasets = _datasets(data)
        cfg = _cfg("true", epochs=5)
        cfg["training"]["epoch_pipeline"] = pipe
        cfg["others"] = {"valid_period": 2}
        networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
        trainer = build_trainer(cfg["training"], None, cfg)
        trained, _ = trainer.train(models=networks, datasets=datasets,
                                   trainer_config=cfg["training"],
                                   full_config=cfg)
        return trained, trained["train_loss_dict"], trainer

    _assert_bit_identical(run(True), run(False))


def test_pipeline_auto_gates_on_checkpointing(tmp_path):
    """'auto' must NOT engage when checkpointing is on (the checkpoint needs
    epoch-k opt state, which the pipeline has already donated to epoch k+1)
    — and the run still works via the synchronous loop."""
    *_, tr = _run("auto", saving={"saving_dir": str(tmp_path),
                                  "save_checkpoint": True})
    assert tr.last_pipeline_engaged is False
    # explicit request under the same constraint warns instead of silently
    # degrading
    with pytest.warns(RuntimeWarning, match="epoch_pipeline"):
        *_, tr = _run(True, saving={"saving_dir": str(tmp_path / "b"),
                                    "save_checkpoint": True})
    assert tr.last_pipeline_engaged is False


def test_pipeline_auto_gates_on_step_loop():
    """'auto' requires the fused path: with epoch_fuse=false the pipeline
    must not engage (the step loop's val would read in-flight params)."""
    *_, tr = _run("auto", epoch_fuse=False)
    assert tr.last_pipeline_engaged is False
