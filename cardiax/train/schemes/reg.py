"""reg scheme: standalone pairwise diffeomorphic registration.

Capability parity with reference modules/trainer/reg_trainer.py:9-428: a
single registration model over (source_img, target_img) pairs with the
hardcoded LDDMM energy ``0.5*MSE(tar, Sdef)/sigma^2 + (v.m).sum()/numel``
(:220-232). Here the energy comes through the config-driven LossCalculator; if
the config declares no losses, the scheme injects the reference's default.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cardiax.train.engine import Scheme


class RegScheme(Scheme):
    name = "reg"

    def __init__(self, trainer_config, full_config):
        super().__init__(trainer_config, full_config)
        if not full_config.get("losses"):
            # reference RegTrainer hardcodes the LDDMM energy; mirror it as a
            # default config entry so the engine's LossCalculator picks it up
            full_config["losses"] = {
                "registration_reconstruction": {
                    "criterion": "registration_reconstruction",
                    "prediction": "various", "target": "registration_target",
                    "weight": 1.0,
                    "sigma": float(trainer_config.get("sigma", 0.03)),
                    "regularization_weight": float(
                        trainer_config.get("regularization_weight", 0.1)),
                    "enable": True,
                }
            }
        self.model_key = None  # resolved at init_params (single model, any name)

    def _key(self, params_or_modules) -> str:
        if self.model_key is None:
            keys = list(params_or_modules.keys())
            assert len(keys) >= 1
            self.model_key = keys[0]
        return self.model_key

    def init_params(self, modules, rng, batch):
        key = self._key(modules)
        src = jnp.asarray(batch["source_img"])
        tar = jnp.asarray(batch["target_img"])
        return {key: jax.jit(modules[key].init)(rng, src, tar)}

    def forward(self, modules, params, arrays, train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        key = self._key(params)
        src, tar = arrays["source_img"], arrays["target_img"]
        preds = modules[key].apply(params[key], src, tar, train=train)
        # expose X/Y components for DENSE displacement supervision (optional)
        preds["displacement_field_X"] = preds["displacement"][:, 1:2]
        preds["displacement_field_Y"] = preds["displacement"][:, 0:1]
        targets = {"registration_target": tar,
                   "source_img": src}
        for k in ("displacement_field_X", "displacement_field_Y",
                  "sample_mask", "TOS"):
            if k in arrays:
                targets[k] = arrays[k]
        return preds, targets

    def example_model_args(self, modules, params, arrays):
        key = self._key(params)
        return {key: (arrays["source_img"], arrays["target_img"])}

    def performance(self, preds, dataset_name):
        """Registration quality: mean squared reconstruction error."""
        perf = super().performance(preds, dataset_name)
        errs = []
        for p in preds:
            if "deformed_source_pred" in p and "target_img" in p:
                errs.append(float(np.mean(
                    (np.asarray(p["deformed_source_pred"])
                     - np.asarray(p["target_img"])) ** 2)))
        if errs:
            perf[f"final-{dataset_name}/reconstruction_mse"] = float(np.mean(errs))
        return perf
