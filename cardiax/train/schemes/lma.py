"""LMA scheme: strain matrix (or displacement video) -> TOS / LMA labels.

Capability parity with reference modules/trainer/LMA_trainer.py:55-835:
modality ``strain_mat`` feeds the (B,1,126,T) strain matrix to the LMA model;
modality ``displacement_field`` concatenates X/Y fields to (B,2,H,W,T)
(reference :184-196 — including the intended behavior of the val-path
copy-paste bug at :280, which we do NOT replicate). Tasks: TOS_regression /
LMA_slice_classification / LMA_sector_classification (:229-248).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cardiax.train.engine import Scheme

_TARGET_KEYS = ("TOS", "sector_LMA_labels", "slice_LMA_label", "strain_mat",
                "sample_mask")


class LMAScheme(Scheme):
    name = "LMA"
    model_keys = ("LMA",)

    def __init__(self, trainer_config, full_config):
        super().__init__(trainer_config, full_config)
        self.modality = trainer_config.get("LMA_modality", "strain_mat")
        self.task = trainer_config.get("LMA_task", "TOS_regression")

    def _input(self, arrays: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        if self.modality == "strain_mat":
            return arrays["strain_mat"]
        # displacement modality: cat X,Y channel-wise -> (B, 2, H, W, T)
        return jnp.concatenate([arrays["displacement_field_X"],
                                arrays["displacement_field_Y"]], axis=1)

    def init_params(self, modules, rng, batch):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, (np.ndarray, jax.Array))}
        x = self._input(arrays)
        # jit the init: eager init dispatches each op separately (minutes over
        # a tunneled TPU); jitted it is one compile + one execution
        return {"LMA": jax.jit(modules["LMA"].init)(rng, x)}

    def forward(self, modules, params, arrays, train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        x = self._input(arrays)
        preds = modules["LMA"].apply(params["LMA"], x, train=train)
        targets = {k: arrays[k] for k in _TARGET_KEYS if k in arrays}
        return preds, targets

    def example_model_args(self, modules, params, arrays):
        return {"LMA": (self._input(arrays),)}
