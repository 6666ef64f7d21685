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
