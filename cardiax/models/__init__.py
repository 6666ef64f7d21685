"""Model factory: string-keyed registry over network configs.

Capability parity with the reference's ``from models import build_model``
(main.py:42-46) — the models package is MISSING from the published reference
(SURVEY.md section 0.2); architectures here are reconstructed from the
trainer-side contracts (SURVEY.md section 2.11) and re-designed TPU-first.

A model is a ``ModelBundle``: a flax module + (lazily initialized) params +
the config that built it. Bundles are pytree-friendly via ``.params``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

from cardiax.models.lma_net import NetDisplacement2LMA, NetStrainMat2LMA


@dataclasses.dataclass
class ModelBundle:
    """A network module plus its parameters and provenance config."""
    module: Any
    config: Dict[str, Any]
    params: Optional[Any] = None
    sigma: float = 0.03   # registration noise scale attribute (reference reg_trainer.py:230)

    def init(self, rng, *example_args, **kw):
        if self.params is None:
            self.params = self.module.init(rng, *example_args, **kw)
        return self.params

    def apply(self, params, *args, **kw):
        return self.module.apply(params, *args, **kw)


def _build_lma(cfg: Dict[str, Any]) -> ModelBundle:
    module = NetStrainMat2LMA(
        LMA_task=cfg.get("LMA_task", "TOS_regression"),
        num_conv_layers=int(cfg.get("num_conv_layers", 3)),
        inner_conv_channel_num=int(cfg.get("inner_conv_channel_num", 16)),
        input_channel_num=int(cfg.get("input_channel_num", 1)),
        n_frames=int(cfg.get("n_frames", 40)),
        n_sectors=int(cfg.get("n_sectors", 126)),
        n_classes=int(cfg.get("n_classes", 1)),
    )
    return ModelBundle(module=module, config=dict(cfg))


def _build_disp_lma(cfg: Dict[str, Any]) -> ModelBundle:
    module = NetDisplacement2LMA(
        LMA_task=cfg.get("LMA_task", "TOS_regression"),
        n_sectors=int(cfg.get("n_sectors", 126)),
        features=int(cfg.get("inner_conv_channel_num", 16)),
        num_conv_layers=int(cfg.get("num_conv_layers", 3)),
        time_axis_last=bool(cfg.get("time_axis_last", True)),
    )
    return ModelBundle(module=module, config=dict(cfg))


def _coerce_pack(v):
    """channel_pack config: False/0 off, True adaptive per-level g, int>1
    fixed g (pack once, no inter-level relayouts — see unet.MomentumUNet)."""
    if isinstance(v, bool):
        return v
    if not v:                       # None / 0 / "" -> off
        return False
    try:
        g = int(v)
    except (TypeError, ValueError):
        raise ValueError(
            f"channel_pack must be a bool or an int group count, got {v!r}")
    return g if g > 1 else False


def _build_registration(cfg: Dict[str, Any]) -> ModelBundle:
    from cardiax.models.registration import RegistrationNet
    module = RegistrationNet(
        features=int(cfg.get("features", 16)),
        n_levels=int(cfg.get("n_levels", 3)),
        alpha=float(cfg.get("alpha", 2.0)),
        gamma=float(cfg.get("gamma", 1.0)),
        fluid_power=int(cfg.get("fluid_power", 2)),
        n_integration_steps=int(cfg.get("n_integration_steps", 5)),
        shoot_downsample=int(cfg.get("shoot_downsample", 2)),
        reg_half_res=bool(cfg.get("reg_half_res", True)),
        final_warp_radius=int(cfg.get("final_warp_radius", 12)),
        exact_warp=bool(cfg.get("exact_warp", False)),
        channel_pack=_coerce_pack(cfg.get("channel_pack", False)),
    )
    return ModelBundle(module=module, config=dict(cfg),
                       sigma=float(cfg.get("sigma", 0.03)))


def _build_strainmat(cfg: Dict[str, Any]) -> ModelBundle:
    from cardiax.models.strain_net import NetDisplacement2StrainMat
    module = NetDisplacement2StrainMat(
        n_sectors=int(cfg.get("n_sectors", 126)),
        features=int(cfg.get("features", 16)),
        tmix=str(cfg.get("strain_tmix", "shiftflat")),
    )
    return ModelBundle(module=module, config=dict(cfg))


def _build_joint_register_strainmat(cfg: Dict[str, Any]) -> ModelBundle:
    from cardiax.models.joint_net import JointRegisterStrainMatNet
    module = JointRegisterStrainMatNet(
        strainmat_net_type=cfg.get("strainmat_net_type", "ResNet3D"),
        n_strain_matrix_frames=int(cfg.get("n_strain_matrix_frames", 40)),
        strainmat_smoothing_method=cfg.get("strainmat_smoothing_method", "SVD"),
        strainmat_smoothing_SVD_rank=int(cfg.get("strainmat_smoothing_SVD_rank", 5)),
        strainmat_smoothing_iters=int(cfg.get("strainmat_smoothing_iters", 4)),
        n_sectors=int(cfg.get("n_sectors", 126)),
        reg_features=int(cfg.get("reg_features", 16)),
        alpha=float(cfg.get("alpha", 2.0)),
        gamma=float(cfg.get("gamma", 1.0)),
        n_integration_steps=int(cfg.get("n_integration_steps", 5)),
        shoot_downsample=int(cfg.get("shoot_downsample", 2)),
        reg_half_res=bool(cfg.get("reg_half_res", True)),
        strain_downsample=int(cfg.get("strain_downsample", 2)),
        strain_tmix=str(cfg.get("strain_tmix", "shiftflat")),
        final_warp_radius=int(cfg.get("final_warp_radius", 12)),
        exact_warp=bool(cfg.get("exact_warp", False)),
        channel_pack=_coerce_pack(cfg.get("channel_pack", False)),
    )
    return ModelBundle(module=module, config=dict(cfg),
                       sigma=float(cfg.get("sigma", 0.03)))


_MODEL_REGISTRY: Dict[str, Callable[[Dict[str, Any]], ModelBundle]] = {
    "NetStrainMat2LMA": _build_lma,
    "NetDisplacement2LMA": _build_disp_lma,
    "RegistrationNet": _build_registration,
    "VoxelmorphLike": _build_registration,
    "NetDisplacement2StrainMat": _build_strainmat,
    "masks_to_strain_mat": _build_strainmat,
    "JointRegisterStrainMatNet": _build_joint_register_strainmat,
}


def build_model(model_config: Dict[str, Any]) -> ModelBundle:
    """``build_model(model_config)`` keyed on ``model_config['type']``
    (reference main.py:42-45)."""
    mtype = model_config["type"]
    if mtype not in _MODEL_REGISTRY:
        raise KeyError(f"Unknown model type {mtype!r}; known: {sorted(_MODEL_REGISTRY)}")
    return _MODEL_REGISTRY[mtype](model_config)
