"""Parity gates vs reference semantics (SURVEY.md section 4 item 5):
identical loss values on fixed inputs between the jitted JAX losses and an
independent PyTorch (CPU) evaluation of the reference formulas."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cardiax.losses.calculator import LossCalculator
from cardiax.losses.registration import lddmm_energy


def test_lddmm_energy_matches_torch():
    rng = np.random.default_rng(0)
    tar = rng.normal(size=(4, 1, 16, 16)).astype(np.float32)
    sdef = rng.normal(size=(4, 1, 16, 16)).astype(np.float32)
    v = rng.normal(size=(4, 2, 16, 16)).astype(np.float32)
    m = rng.normal(size=(4, 2, 16, 16)).astype(np.float32)
    sigma, reg_w = 0.03, 0.1

    ours = float(lddmm_energy(jnp.asarray(tar), jnp.asarray(sdef),
                              jnp.asarray(v), jnp.asarray(m),
                              sigma=sigma, regularization_weight=reg_w))

    # reference formula (registration_losses.py:22-28):
    # 0.5 * MSE(tar, Sdef) / sigma^2 + reg_w * (v*m).sum() / tar.numel()
    t_tar, t_sdef = torch.from_numpy(tar), torch.from_numpy(sdef)
    t_v, t_m = torch.from_numpy(v), torch.from_numpy(m)
    theirs = (0.5 * torch.nn.functional.mse_loss(t_tar, t_sdef) / sigma ** 2
              + reg_w * (t_v * t_m).sum() / t_tar.numel())
    assert np.isclose(ours, float(theirs), rtol=1e-5), (ours, float(theirs))


def test_mse_and_ce_match_torch():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(6, 126)).astype(np.float32)
    tgt = rng.normal(size=(6, 126)).astype(np.float32)
    logits = rng.normal(size=(6, 2, 126)).astype(np.float32)
    labels = rng.integers(0, 2, size=(6, 126))

    calc = LossCalculator({
        "mse": {"criterion": "MSELoss", "prediction": "TOS", "target": "TOS",
                "weight": 1.0},
        "ce": {"criterion": "CrossEntropyLoss", "prediction": "sec",
               "target": "sec", "weight": 1.0},
    })
    total, vals = calc({"TOS": jnp.asarray(pred), "sec": jnp.asarray(logits)},
                       {"TOS": jnp.asarray(tgt), "sec": jnp.asarray(labels)})

    t_mse = torch.nn.functional.mse_loss(torch.from_numpy(pred),
                                         torch.from_numpy(tgt))
    t_ce = torch.nn.functional.cross_entropy(torch.from_numpy(logits),
                                             torch.from_numpy(labels))
    assert np.isclose(float(vals["mse"]), float(t_mse), rtol=1e-5)
    assert np.isclose(float(vals["ce"]), float(t_ce), rtol=1e-5)


def test_coupled_adam_matches_torch():
    """Reference configs use torch.optim.Adam(weight_decay=1e-4) — COUPLED L2
    (wd*theta added to the gradient before the moments, reference
    joint_registration_strainmat_LMA.py:55-70, configs/config.json:139-152).
    Pin 5 optimizer steps of cardiax's build_optimizer against torch on a
    fixed gradient sequence; also pin that decoupled (AdamW) diverges."""
    import jax
    from cardiax.train.engine import build_optimizer

    rng = np.random.default_rng(7)
    theta0 = rng.normal(size=(13,)).astype(np.float32)
    grads = [rng.normal(size=(13,)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-2, 1e-2   # large wd so coupled-vs-decoupled is visible

    # torch coupled Adam
    t_theta = torch.nn.Parameter(torch.from_numpy(theta0.copy()))
    t_opt = torch.optim.Adam([t_theta], lr=lr, weight_decay=wd)
    for g in grads:
        t_opt.zero_grad()
        t_theta.grad = torch.from_numpy(g.copy())
        t_opt.step()

    def run(conf):
        tx = build_optimizer(conf, steps_per_epoch=1, total_epochs=5)
        p = {"w": jnp.asarray(theta0)}
        st = tx.init(p)
        for g in grads:
            upd, st = tx.update({"w": jnp.asarray(g)}, st, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b, p, upd)
        return np.asarray(p["w"])

    coupled = run({"type": "Adam", "learning_rate": lr, "weight_decay": wd})
    assert np.allclose(coupled, t_theta.detach().numpy(), atol=1e-6), (
        np.abs(coupled - t_theta.detach().numpy()).max())

    decoupled = run({"type": "Adam", "learning_rate": lr, "weight_decay": wd,
                     "decoupled_weight_decay": True})
    assert not np.allclose(decoupled, t_theta.detach().numpy(), atol=1e-5)


def test_coupled_sgd_matches_torch():
    """torch.optim.SGD(momentum, weight_decay) also couples wd into the
    gradient before the momentum buffer."""
    import jax
    from cardiax.train.engine import build_optimizer

    rng = np.random.default_rng(8)
    theta0 = rng.normal(size=(9,)).astype(np.float32)
    grads = [rng.normal(size=(9,)).astype(np.float32) for _ in range(4)]
    lr, wd, mom = 1e-2, 1e-2, 0.9

    t_theta = torch.nn.Parameter(torch.from_numpy(theta0.copy()))
    t_opt = torch.optim.SGD([t_theta], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads:
        t_theta.grad = torch.from_numpy(g.copy())
        t_opt.step()

    tx = build_optimizer({"type": "SGD", "learning_rate": lr,
                          "weight_decay": wd, "momentum": mom},
                         steps_per_epoch=1, total_epochs=4)
    p = {"w": jnp.asarray(theta0)}
    st = tx.init(p)
    for g in grads:
        upd, st = tx.update({"w": jnp.asarray(g)}, st, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, upd)
    ours = np.asarray(p["w"])
    assert np.allclose(ours, t_theta.detach().numpy(), atol=1e-6), (
        np.abs(ours - t_theta.detach().numpy()).max())


def test_sector_error_identity():
    """sector_error = sum |TOS_pred - TOS_GT| / (N * 126)
    (reference joint_registration_strainmat_LMA.py:384-428)."""
    from cardiax.losses.metrics import tos_sector_error
    rng = np.random.default_rng(2)
    pred = rng.uniform(0, 60, (5, 126)).astype(np.float32)
    gt = rng.uniform(0, 60, (5, 126)).astype(np.float32)
    s, n = tos_sector_error(jnp.asarray(pred), jnp.asarray(gt))
    ref = np.abs(pred - gt).sum() / (5 * 126)
    assert np.isclose(float(s) / float(n), ref, rtol=1e-6)


def test_binary_auc_rank_based():
    from cardiax.losses.metrics import binary_auc
    import numpy as np
    # perfectly separable
    assert binary_auc(np.array([1, 2, 3, 10, 11]), np.array([0, 0, 0, 1, 1])) == 1.0
    # anti-separable
    assert binary_auc(np.array([10, 11, 1, 2]), np.array([0, 0, 1, 1])) == 0.0
    # one class absent -> 0.5
    assert binary_auc(np.array([1.0, 2.0]), np.array([0, 0])) == 0.5
    # ties split evenly
    assert binary_auc(np.array([1.0, 1.0]), np.array([0, 1])) == 0.5


def test_lma_metrics_nondegenerate_when_miscalibrated():
    """The round-1 vacuity: predicted TOS systematically below threshold 20
    gives recall 0, but the new threshold-free metrics stay informative."""
    import numpy as np
    from cardiax.train.schemes.joint_reg_strainmat_lma import (
        JointRegisterStrainmatLMAScheme)
    rng = np.random.default_rng(3)
    scheme = JointRegisterStrainmatLMAScheme({"LMA_threshold": 20}, {})
    preds = []
    for _ in range(6):
        tos = np.full(126, 3.0)
        tos[40:70] = 25.0                       # true late arc
        # prediction ranks sectors correctly but is scaled down 3x
        tos_pred = tos / 3.0 + rng.normal(0, 0.2, 126)
        preds.append({"TOS": tos, "TOS_pred": tos_pred})
    perf = scheme.performance(preds, "val")
    assert perf["final-val/LMA_recall"] == 0.0          # the vacuous metric
    assert perf["final-val/LMA_auc"] > 0.95             # ranking is near-perfect
    assert perf["final-val/LMA_f1_best"] > 0.9
    assert perf["final-val/LMA_threshold_best"] < 20.0  # sweep found ~6.7
