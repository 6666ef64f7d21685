"""Trainer registry: scheme string -> (Scheme adapter, shared TrainerEngine).

Capability parity with reference modules/trainer/__init__.py:7-22 — six
schemes keyed by ``config['training']['scheme']``.
"""

from __future__ import annotations

from typing import Any, Dict

from cardiax.train.engine import Scheme, TrainerEngine


def _lma(tc, fc):
    from cardiax.train.schemes.lma import LMAScheme
    return LMAScheme(tc, fc)


def _reg(tc, fc):
    from cardiax.train.schemes.reg import RegScheme
    return RegScheme(tc, fc)


def _strainmat_pred(tc, fc):
    from cardiax.train.schemes.strainmat_pred import StrainMatPredScheme
    return StrainMatPredScheme(tc, fc)


def _strainmat_lma(tc, fc):
    from cardiax.train.schemes.strainmat_lma import StrainMatLMAScheme
    return StrainMatLMAScheme(tc, fc)


def _joint_reg_strainmat_lma(tc, fc):
    from cardiax.train.schemes.joint_reg_strainmat_lma import JointRegisterStrainmatLMAScheme
    return JointRegisterStrainmatLMAScheme(tc, fc)


def _joint_reg_regression(tc, fc):
    from cardiax.train.schemes.joint_reg_regression import JointRegistrationRegressionScheme
    return JointRegistrationRegressionScheme(tc, fc)


_SCHEME_REGISTRY = {
    "LMA": _lma,
    "reg": _reg,
    "strainmat_pred": _strainmat_pred,
    "strainmat_LMA": _strainmat_lma,
    "joint_registration_strainmat_LMA": _joint_reg_strainmat_lma,
    "joint_registration_regression": _joint_reg_regression,
}


def build_trainer(trainer_config: Dict[str, Any], device=None,
                  full_config: Dict[str, Any] | None = None,
                  mesh=None) -> TrainerEngine:
    """``build_trainer(trainer_config, device, full_config)``
    (reference trainer/__init__.py:7). ``device`` is accepted for signature
    parity and ignored — placement is the mesh's job."""
    scheme_name = trainer_config.get("scheme", "LMA")
    if scheme_name not in _SCHEME_REGISTRY:
        raise KeyError(f"Unknown training scheme {scheme_name!r}; "
                       f"known: {sorted(_SCHEME_REGISTRY)}")
    scheme = _SCHEME_REGISTRY[scheme_name](trainer_config, full_config or {})
    return TrainerEngine(scheme, trainer_config, full_config or {}, mesh=mesh)


__all__ = ["build_trainer", "TrainerEngine", "Scheme"]
