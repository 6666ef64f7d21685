"""joint_registration_strainmat_LMA — the DEFAULT flagship scheme.

Capability parity with reference
modules/trainer/joint_registration_strainmat_LMA.py:47-452 (the hot loop,
SURVEY.md section 3.2):

  batch cine_myo_mask (B,1,T,H,W)
    -> Lagrangian pair split: src/tar (B,1,T-1,H,W)        (:304)
    -> JointRegisterStrainMatNet.forward_volume            (:307)
         {strain_matrix (B,1,S,Ts), deformed_source, velocity, momentum}
    -> LMA_model(strain_matrix) -> {TOS (B,S)}             (:308)
    -> losses: LDDMM energy + 1000*MSE(strainmat) + 0.005*MSE(TOS)  (:327)

plus TOS>threshold sector labels for LMA metrics (:310-311, threshold 20 per
configs/config.json:133). The whole chain is one jitted fwd-bwd program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cardiax.train.engine import Scheme


def _lagrangian_pairs(vol: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 1, T, H, W) -> src/tar (B, 1, T-1, H, W): frame 0 vs frames 1..T-1
    (jit-side twin of cardiax.data.split_vol_to_registration_pairs)."""
    b, c, t, h, w = vol.shape
    src = jnp.broadcast_to(vol[:, :, :1], (b, c, t - 1, h, w))
    tar = vol[:, :, 1:]
    return src, tar


class JointRegisterStrainmatLMAScheme(Scheme):
    name = "joint_registration_strainmat_LMA"
    model_keys = ("joint_register_strainmat", "LMA")

    def __init__(self, trainer_config, full_config):
        super().__init__(trainer_config, full_config)
        self.lma_threshold = float(trainer_config.get("LMA_threshold", 20))

    def init_params(self, modules, rng, batch):
        import jax
        vol = jnp.asarray(batch["cine_myo_mask"])

        def init_all(rng, vol):
            src, tar = _lagrangian_pairs(vol)
            p_joint = modules["joint_register_strainmat"].init(rng, src, tar)
            out = modules["joint_register_strainmat"].apply(p_joint, src, tar)
            p_lma = modules["LMA"].init(rng, out["strain_matrix"])
            return {"joint_register_strainmat": p_joint, "LMA": p_lma}

        return jax.jit(init_all)(rng, vol)

    def example_model_args(self, modules, params, arrays):
        vol = arrays["cine_myo_mask"]
        src, tar = _lagrangian_pairs(vol)
        # shapes only: jax.eval_shape traces abstractly — an un-jitted eager
        # forward here costs minutes over the tunneled TPU (CLAUDE.md) for
        # nothing (jax.export only needs example ARG shapes/dtypes)
        out_sd = jax.eval_shape(
            modules["joint_register_strainmat"].apply,
            params["joint_register_strainmat"], src, tar)
        sm = out_sd["strain_matrix"]
        return {"joint_register_strainmat": (src, tar),
                "LMA": (jnp.zeros(sm.shape, sm.dtype),)}

    def forward(self, modules, params, arrays, train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        vol = arrays["cine_myo_mask"]
        src, tar = _lagrangian_pairs(vol)
        out = modules["joint_register_strainmat"].apply(
            params["joint_register_strainmat"], src, tar, train=train)
        lma_out = modules["LMA"].apply(params["LMA"], out["strain_matrix"],
                                       train=train)
        preds = {
            "strainmat": out["strain_matrix"],       # registration_supervision
            "strain_matrix": out["strain_matrix"],
            "deformed_source": out["deformed_source"],
            "velocity": out["velocity"],
            "momentum": out["momentum"],
            "displacement": out["displacement"],     # (B, P, 2, H, W); also
            # feeds the engine's banded-warp saturation guard
            **lma_out,
        }
        targets = {
            "registration_target": tar,
            "strainmat": arrays["strain_matrix"],
        }
        for k in ("TOS", "sample_mask"):
            if k in arrays:
                targets[k] = arrays[k]
        return preds, targets

    def performance(self, preds, dataset_name):
        """sector_error + thresholded LMA sector accuracy (reference
        :310-311, 384-428: sector labels = TOS > LMA_threshold), plus
        threshold-free LMA_auc and a threshold-sweep best-F1 so the LMA
        metrics stay informative when the predicted TOS is miscalibrated
        against the fixed clinical threshold (VERDICT round 1, weak #5)."""
        from cardiax.losses.metrics import binary_auc, threshold_sweep_f1
        perf = super().performance(preds, dataset_name)
        tp = fp = fn = correct = total = 0
        scores, labels = [], []
        for p in preds:
            if "TOS_pred" not in p or "TOS" not in p:
                continue
            tos_pred = np.asarray(p["TOS_pred"])
            pred_lbl = tos_pred > self.lma_threshold
            true_lbl = np.asarray(p["TOS"]) > self.lma_threshold
            scores.append(tos_pred.reshape(-1))
            labels.append(true_lbl.reshape(-1))
            tp += int(np.sum(pred_lbl & true_lbl))
            fp += int(np.sum(pred_lbl & ~true_lbl))
            fn += int(np.sum(~pred_lbl & true_lbl))
            correct += int(np.sum(pred_lbl == true_lbl))
            total += pred_lbl.size
        if total:
            perf[f"final-{dataset_name}/LMA_accuracy"] = correct / total
            perf[f"final-{dataset_name}/LMA_precision"] = tp / (tp + fp) if tp + fp else 0.0
            perf[f"final-{dataset_name}/LMA_recall"] = tp / (tp + fn) if tp + fn else 0.0
            s = np.concatenate(scores)
            y = np.concatenate(labels)
            perf[f"final-{dataset_name}/LMA_auc"] = binary_auc(s, y)
            f1, thr = threshold_sweep_f1(s, y)
            perf[f"final-{dataset_name}/LMA_f1_best"] = f1
            perf[f"final-{dataset_name}/LMA_threshold_best"] = thr
        return perf
