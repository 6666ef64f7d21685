"""strainmat_pred scheme: displacement video -> strain matrix regression.

Capability parity with reference modules/trainer/strainmat_pred_trainer.py:45-359:
``model(displacement_field (B,2,H,W,T)) -> {'strainmat': (B,126,T)}`` with MSE
against the GT strain matrix (:272-296). Model key ``masks_to_strain_mat``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from cardiax.train.engine import Scheme


class StrainMatPredScheme(Scheme):
    name = "strainmat_pred"
    model_keys = ("masks_to_strain_mat",)

    def __init__(self, trainer_config, full_config):
        super().__init__(trainer_config, full_config)
        if not full_config.get("losses"):
            full_config["losses"] = {
                "strainmat_MSE": {"criterion": "MSELoss", "prediction": "strainmat",
                                  "target": "strainmat", "weight": 1.0, "enable": True}
            }
        self.model_key = None

    def _key(self, d) -> str:
        if self.model_key is None:
            self.model_key = ("masks_to_strain_mat" if "masks_to_strain_mat" in d
                              else list(d.keys())[0])
        return self.model_key

    def init_params(self, modules, rng, batch):
        key = self._key(modules)
        disp = jnp.asarray(batch["displacement_field"])
        import jax
        return {key: jax.jit(modules[key].init)(rng, disp)}

    def forward(self, modules, params, arrays, train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        key = self._key(params)
        preds = modules[key].apply(params[key], arrays["displacement_field"],
                                   train=train)
        targets = {"strainmat": arrays["strain_mat"]}
        for k in ("sample_mask", "TOS"):
            if k in arrays:
                targets[k] = arrays[k]
        return preds, targets

    def example_model_args(self, modules, params, arrays):
        return {self._key(params): (arrays["displacement_field"],)}

    def performance(self, preds, dataset_name):
        perf = super().performance(preds, dataset_name)
        errs = []
        for p in preds:
            if "strainmat_pred" in p and "strain_mat" in p:
                errs.append(float(np.mean(
                    (np.asarray(p["strainmat_pred"])
                     - np.asarray(p["strain_mat"])) ** 2)))
        if errs:
            perf[f"final-{dataset_name}/strainmat_mse"] = float(np.mean(errs))
        return perf
