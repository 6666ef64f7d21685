"""strainmat_LMA scheme: displacement -> strain net -> LMA net, jointly trained.

Capability parity with reference modules/trainer/strainmat_LMA_trainer.py:46-430:
``strain_model(disp) -> {'strainmat'}`` then ``LMA_model(strainmat[:,None]) ->
{'TOS'}``, two optimizers, joint loss (:290-319). (The reference's test path
has an uninitialized-variable NameError at :367 — intended behavior
implemented instead, SURVEY.md section 0.4.)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cardiax.train.engine import Scheme


class StrainMatLMAScheme(Scheme):
    name = "strainmat_LMA"
    model_keys = ("strain", "LMA")

    def __init__(self, trainer_config, full_config):
        super().__init__(trainer_config, full_config)
        if not full_config.get("losses"):
            full_config["losses"] = {
                "strainmat_MSE": {"criterion": "MSELoss", "prediction": "strainmat",
                                  "target": "strainmat", "weight": 1.0, "enable": True},
                "TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                   "target": "TOS", "weight": 0.005, "enable": True},
            }

    def init_params(self, modules, rng, batch):
        import jax
        disp = jnp.asarray(batch["displacement_field"])

        def init_all(rng, disp):
            p_strain = modules["strain"].init(rng, disp)
            strain_out = modules["strain"].apply(p_strain, disp)["strainmat"]
            p_lma = modules["LMA"].init(rng, strain_out[:, None])
            return {"strain": p_strain, "LMA": p_lma}

        return jax.jit(init_all)(rng, disp)

    def forward(self, modules, params, arrays, train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        strain_out = modules["strain"].apply(params["strain"],
                                             arrays["displacement_field"],
                                             train=train)
        strainmat = strain_out["strainmat"]                    # (B, S, T)
        lma_out = modules["LMA"].apply(params["LMA"], strainmat[:, None],
                                       train=train)
        preds = {"strainmat": strainmat, **lma_out}
        targets = {"strainmat": arrays["strain_mat"]}
        for k in ("TOS", "sector_LMA_labels", "slice_LMA_label", "sample_mask"):
            if k in arrays:
                targets[k] = arrays[k]
        return preds, targets

    def example_model_args(self, modules, params, arrays):
        disp = arrays["displacement_field"]
        # abstract trace only (see joint_reg_strainmat_lma.example_model_args)
        sm = jax.eval_shape(modules["strain"].apply,
                            params["strain"], disp)["strainmat"]
        return {"strain": (disp,),
                "LMA": (jnp.zeros(sm.shape, sm.dtype)[:, None],)}
