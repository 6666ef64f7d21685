"""joint_registration_regression scheme: pairwise registration + displacement-
video LMA regression, slice-grouped batches.

Capability parity with reference
modules/trainer/joint_registration_regression_trainer.py:122-1154 (call stack
SURVEY.md section 3.4): per-pair ``registration_model(src, tar)``, optional
displacement masking by the src/tar myocardium-mask union (:278-282), regroup
pair displacements per slice into a motion video (the reference's
``merge_data_of_same_slice_from_batch`` :54-120), ``LMA_model(video)``, joint
loss with optional DENSE registration supervision (:141-146, 313).

TPU re-design of the ragged slice batches: the SliceBatcher pads the pair axis
to a static maximum and carries a ``pair_mask``, so "merge by slice_full_id"
becomes a reshape — no host-side regrouping, one compiled program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cardiax.data.loader import SliceBatcher
from cardiax.train.engine import Scheme


class JointRegistrationRegressionScheme(Scheme):
    name = "joint_registration_regression"
    model_keys = ("cine_registraion", "LMA")   # reference's key spelling

    def __init__(self, trainer_config, full_config):
        super().__init__(trainer_config, full_config)
        self.n_video_frames = int(trainer_config.get("LMA_n_frames", 48))
        self.mask_displacement = bool(trainer_config.get("mask_displacement", False))
        self.reg_key = None
        if not full_config.get("losses"):
            full_config["losses"] = {
                "registration_reconstruction": {
                    "criterion": "registration_reconstruction",
                    "prediction": "various", "target": "registration_target",
                    "weight": 1.0, "sigma": 0.03, "regularization_weight": 0.1,
                    "mask": "pair_sample_mask", "enable": True},
                "TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                   "target": "TOS", "weight": 0.005, "enable": True},
            }

    def _rkey(self, d) -> str:
        if self.reg_key is None:
            for cand in ("cine_registraion", "cine_registration", "registration"):
                if cand in d:
                    self.reg_key = cand
                    break
            else:
                self.reg_key = [k for k in d.keys() if k != "LMA"][0]
        return self.reg_key

    def make_loader(self, dataset, batch_size: int, shuffle: bool, seed: int = 0):
        max_pairs = min(self.n_video_frames,
                        max(len(dataset.get_slice(i)) for i in range(dataset.get_n_slices())))
        return SliceBatcher(dataset, slices_per_batch=batch_size,
                            max_pairs_per_slice=max_pairs, shuffle=shuffle, seed=seed)

    # ---- forward ------------------------------------------------------------ #
    def _flatten_pairs(self, x: jnp.ndarray) -> jnp.ndarray:
        s, p = x.shape[:2]
        return x.reshape((s * p,) + x.shape[2:])

    def init_params(self, modules, rng, batch):
        import jax
        rkey = self._rkey(modules)
        sp = batch["source_img"].shape[:2]
        src = self._flatten_pairs(jnp.asarray(batch["source_img"]))
        tar = self._flatten_pairs(jnp.asarray(batch["target_img"]))

        def init_all(rng, src, tar):
            p_reg = modules[rkey].init(rng, src, tar)
            out = modules[rkey].apply(p_reg, src, tar)
            video = self._make_video(out["displacement"], sp)
            p_lma = modules["LMA"].init(rng, video)
            return {rkey: p_reg, "LMA": p_lma}

        return jax.jit(init_all)(rng, src, tar)

    def _make_video(self, disp_flat: jnp.ndarray, sp: Tuple[int, int]) -> jnp.ndarray:
        """(S*P, 2, H, W) -> (S, 2, F, H, W) zero-padded to n_video_frames
        (the merge_data_of_same_slice_from_batch contract, frames axis 2)."""
        s, p = sp
        disp = disp_flat.reshape(s, p, 2, *disp_flat.shape[-2:])
        disp = jnp.moveaxis(disp, 1, 2)                       # (S, 2, P, H, W)
        f = self.n_video_frames
        if p < f:
            pad = jnp.zeros(disp.shape[:2] + (f - p,) + disp.shape[3:], disp.dtype)
            disp = jnp.concatenate([disp, pad], axis=2)
        else:
            disp = disp[:, :, :f]
        return disp

    def forward(self, modules, params, arrays, train: bool
                ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        rkey = self._rkey(params)
        s, p = arrays["source_img"].shape[:2]
        src = self._flatten_pairs(arrays["source_img"])
        tar = self._flatten_pairs(arrays["target_img"])
        reg_out = modules[rkey].apply(params[rkey], src, tar, train=train)

        disp = reg_out["displacement"]                         # (S*P, 2, H, W)
        if self.mask_displacement and "source_mask" in arrays:
            union = jnp.maximum(self._flatten_pairs(arrays["source_mask"]),
                                self._flatten_pairs(arrays["target_mask"]))
            disp = disp * union                                # (S*P,1,H,W) broadcast
        pair_mask = arrays["pair_mask"].reshape(s * p)
        disp = disp * pair_mask[:, None, None, None]           # zero padded pairs

        video = self._make_video(disp, (s, p))                 # (S, 2, F, H, W)
        lma_out = modules["LMA"].apply(params["LMA"], video, train=train)

        preds = {
            "deformed_source": reg_out["deformed_source"],
            "velocity": reg_out["velocity"],
            "momentum": reg_out["momentum"],
            "displacement_field_X": reg_out["displacement"][:, 1:2],
            "displacement_field_Y": reg_out["displacement"][:, 0:1],
            "pred_displacement_fields": video,
            **lma_out,
        }
        targets = {
            "registration_target": tar,
            # slice-level batch mask for label losses; pair-level mask for the
            # per-pair registration losses (selected via each conf's "mask")
            "sample_mask": arrays["sample_mask"],
            "pair_sample_mask": pair_mask,
        }
        # slice-level labels: dedup to one per slice (pairs repeat them)
        for k in ("TOS", "sector_LMA_labels", "slice_LMA_label"):
            if k in arrays:
                targets[k] = arrays[k][:, 0]                   # (S, ...)
        if "displacement_field_X" in arrays:                   # DENSE supervision
            targets["displacement_field_X"] = self._flatten_pairs(
                arrays["displacement_field_X"])
            targets["displacement_field_Y"] = self._flatten_pairs(
                arrays["displacement_field_Y"])
        return preds, targets

    def example_model_args(self, modules, params, arrays):
        rkey = self._rkey(params)
        s, p = arrays["source_img"].shape[:2]
        src = self._flatten_pairs(arrays["source_img"])
        tar = self._flatten_pairs(arrays["target_img"])
        # abstract trace only (see joint_reg_strainmat_lma.example_model_args)
        reg_sd = jax.eval_shape(modules[rkey].apply, params[rkey], src, tar)
        disp = jnp.zeros(reg_sd["displacement"].shape,
                         reg_sd["displacement"].dtype)
        video = self._make_video(disp, (s, p))
        return {rkey: (src, tar), "LMA": (video,)}
