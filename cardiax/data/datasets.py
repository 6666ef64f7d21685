"""Dataset views over split slice dicts — host-side numpy, static shapes.

Capability parity with reference modules/data/dataset/ (JointDataset,
LMADataset, StrainMatDataset, BasicRegistrationDataset + the build_datasets
registry, dataset/__init__.py:5-35). All `__getitem__` outputs are numpy
arrays with the reference's exact shapes/axes so trainer contracts line up:

  * JointDataset:        cine_myo_mask (1,T,H,W) f32, strain_matrix (1,126,Ts),
                         TOS (126,)                      (joint_dataset.py:71-78)
  * LMADataset:          displacement_field_X/Y (1,H,W,T), strain_mat (1,126,T),
                         TOS, slice/sector LMA labels     (LMA_dataset.py)
  * StrainMatDataset:    displacement_field (2,H,W,T), strain_mat (126,T)
                         WITHOUT channel dim              (strainmat_dataset.py:71-80)
  * BasicRegistrationDataset: source_img/target_img (1,H,W) [+ masks],
                         DENSE displacement GT, labels    (registration_dataset.py:24-58)

Every dataset exposes the slice-grouping API the SliceDataLoader needs:
``get_subject_ids / get_slice_full_ids / get_n_slices / get_slice(i)``.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Sequence

import numpy as np

from cardiax.data.frames import align_n_frames_to


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


class SliceGroupedDataset:
    """Shared base: length, metadata passthrough, and per-slice grouping."""

    def __init__(self, data: List[Dict[str, Any]], dataset_config: Dict[str, Any] | None = None,
                 full_config: Dict[str, Any] | None = None, dataset_name: str | None = None):
        self.data = [copy.copy(d) for d in data]
        self.dataset_config = dataset_config or {}
        self.full_config = full_config or {}
        self.dataset_name = dataset_name
        self.slice_full_ids = sorted({str(d.get("slice_full_id", i))
                                      for i, d in enumerate(self.data)})
        self._slice_to_indices: Dict[str, List[int]] = {}
        for i, d in enumerate(self.data):
            self._slice_to_indices.setdefault(str(d.get("slice_full_id", i)), []).append(i)

    def __len__(self) -> int:
        return len(self.data)

    def get_subject_ids(self) -> List[str]:
        return sorted({str(d["subject_id"]) for d in self.data})

    def get_slice_full_ids(self) -> List[str]:
        return list(self.slice_full_ids)

    def get_n_slices(self) -> int:
        return len(self.slice_full_ids)

    def get_slice(self, slice_idx: int) -> List[Dict[str, Any]]:
        sid = self.slice_full_ids[slice_idx]
        return [self[i] for i in self._slice_to_indices[sid]]

    def _passthrough_meta(self, raw: Dict[str, Any], datum: Dict[str, Any]) -> Dict[str, Any]:
        """Copy non-array metadata (ids, filenames, flags) into the item."""
        for k, v in raw.items():
            if k in datum:
                continue
            if isinstance(v, np.ndarray):
                continue
            if isinstance(v, bool):
                datum[k] = v
            elif isinstance(v, (int, np.integer)):
                datum[k] = np.asarray([v], dtype=np.int64)
            elif isinstance(v, (float, np.floating)):
                datum[k] = np.asarray([v], dtype=np.float32)
            else:
                datum[k] = v
        return datum

    def __getitem__(self, index: int) -> Dict[str, Any]:  # pragma: no cover
        raise NotImplementedError


class JointDataset(SliceGroupedDataset):
    """Masks + GT strain + TOS for the joint reg+strain+LMA scheme."""

    def __init__(self, data, augmentation=None, dataset_config=None, full_config=None,
                 dataset_name=None):
        super().__init__(data, dataset_config, full_config, dataset_name)
        cfg = self.dataset_config
        self.n_myo_frames = int(cfg.get("n_myo_frames_to_use_for_regression", 20))
        self.n_strainmat_frames = int(cfg.get("n_strainmat_frames_to_use_for_regression", 40))
        self.cine_myo_mask_key = cfg.get("cine_myo_mask_key", "cine_lv_myo_masks")
        self.strain_mat_key = cfg.get("strain_mat_key", "strain_matrix")
        self.TOS_key = cfg.get("TOS_key", "TOS")
        for d in self.data:
            d[self.cine_myo_mask_key] = align_n_frames_to(
                d[self.cine_myo_mask_key], self.n_myo_frames, -1)
            d[self.strain_mat_key] = align_n_frames_to(
                d[self.strain_mat_key], self.n_strainmat_frames, -1)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        raw = self.data[index]
        mask = _f32(raw[self.cine_myo_mask_key])          # (H, W, T)
        datum = {
            # (1, T, H, W): channel dim then frame axis moved to front
            "cine_myo_mask": np.moveaxis(mask[None, ...], -1, 1),
            "strain_matrix": _f32(raw[self.strain_mat_key])[None, ...],  # (1, 126, Ts)
            "TOS": _f32(raw[self.TOS_key]).ravel(),                       # (126,)
        }
        return self._passthrough_meta(raw, datum)


class LMADataset(SliceGroupedDataset):
    """Displacement-field (or strain) inputs for the standalone LMA scheme."""

    def __init__(self, data, augmentation=None, dataset_config=None, full_config=None,
                 dataset_name=None):
        super().__init__(data, dataset_config, full_config, dataset_name)
        self.n_frames = int(self.dataset_config.get("n_frames_to_use_for_regression", 48))
        for d in self.data:
            for k in ("displacement_field_X", "displacement_field_Y"):
                if k in d:
                    d[k] = align_n_frames_to(d[k], self.n_frames, -1)
            if "strain_matrix" in d:
                d["strain_matrix"] = align_n_frames_to(d["strain_matrix"], self.n_frames, -1)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        raw = self.data[index]
        datum: Dict[str, Any] = {}
        if "displacement_field_X" in raw:
            datum["displacement_field_X"] = _f32(raw["displacement_field_X"])[None, ...]
            datum["displacement_field_Y"] = _f32(raw["displacement_field_Y"])[None, ...]
        if "strain_matrix" in raw:
            datum["strain_mat"] = _f32(raw["strain_matrix"])[None, ...]   # (1, 126, T)
        datum["TOS"] = _f32(raw["TOS"]).ravel()
        thr = self.dataset_config.get("LMA_threshold", 25)
        datum["sector_LMA_labels"] = np.asarray(
            raw.get("sector_LMA_labels", (datum["TOS"] > thr).astype(np.int64)),
            dtype=np.int64)
        datum["slice_LMA_label"] = np.asarray(
            raw.get("slice_LMA_label", [int(datum["sector_LMA_labels"].any())]),
            dtype=np.int64).ravel()
        return self._passthrough_meta(raw, datum)


class StrainMatDataset(SliceGroupedDataset):
    """Displacement videos + GT strain matrices for strain-prediction schemes."""

    def __init__(self, data, augmentation=None, dataset_config=None, full_config=None,
                 dataset_name=None):
        super().__init__(data, dataset_config, full_config, dataset_name)
        self.n_frames = int(self.dataset_config.get("n_frames_to_use_for_regression", 48))
        for d in self.data:
            for k in ("displacement_field_X", "displacement_field_Y"):
                if k in d:
                    d[k] = align_n_frames_to(d[k], self.n_frames, -1)
            if "strain_matrix" in d:
                d["strain_matrix"] = align_n_frames_to(d["strain_matrix"], self.n_frames, -1)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        raw = self.data[index]
        disp = np.concatenate([_f32(raw["displacement_field_X"])[None, ...],
                               _f32(raw["displacement_field_Y"])[None, ...]], axis=0)
        datum = {
            "displacement_field": disp,                         # (2, H, W, T)
            "strain_mat": _f32(raw["strain_matrix"]),           # (126, T) — no channel dim
            "TOS": _f32(raw["TOS"]).ravel(),
        }
        thr = self.dataset_config.get("LMA_threshold", 25)
        datum["sector_LMA_labels"] = np.asarray(
            raw.get("sector_LMA_labels", (datum["TOS"] > thr).astype(np.int64)),
            dtype=np.int64)
        datum["slice_LMA_label"] = np.asarray(
            raw.get("slice_LMA_label", [int(datum["sector_LMA_labels"].any())]),
            dtype=np.int64).ravel()
        return self._passthrough_meta(raw, datum)


class BasicRegistrationDataset(SliceGroupedDataset):
    """Pairwise (source, target) frames with DENSE displacement supervision."""

    def __getitem__(self, index: int) -> Dict[str, Any]:
        raw = self.data[index]
        datum = {
            "source_img": _f32(raw["source_image"])[None, ...],   # (1, H, W)
            "target_img": _f32(raw["target_image"])[None, ...],
        }
        if self.dataset_config.get("feed_masks", False):
            datum["source_mask"] = _f32(raw["source_mask"])[None, ...]
            datum["target_mask"] = _f32(raw["target_mask"])[None, ...]
        if "DENSE_displacement_field_X" in raw:
            datum["displacement_field_X"] = _f32(raw["DENSE_displacement_field_X"])[None, ...]
            datum["displacement_field_Y"] = _f32(raw["DENSE_displacement_field_Y"])[None, ...]
        if "TOS" in raw:
            datum["TOS"] = _f32(raw["TOS"]).ravel()
        if "strain_matrix" in raw:
            datum["strain_mat"] = _f32(raw["strain_matrix"])[None, ...]
        if "sector_LMA_labels" in raw:
            datum["sector_LMA_labels"] = np.asarray(raw["sector_LMA_labels"], dtype=np.int64)
        if "slice_LMA_label" in raw:
            datum["slice_LMA_label"] = np.asarray(raw["slice_LMA_label"], dtype=np.int64).ravel()
        return self._passthrough_meta(raw, datum)


_DATASET_REGISTRY = {
    "JointDataset": JointDataset,
    "LMADataset": LMADataset,
    "StrainMatDataset": StrainMatDataset,
    "BasicRegistrationDataset": BasicRegistrationDataset,
}


def build_datasets(datasets_config: Dict[str, Dict[str, Any]],
                   data_splits: Dict[str, Dict[str, Any]],
                   full_config: Dict[str, Any] | None = None) -> Dict[str, SliceGroupedDataset]:
    """String-keyed dataset registry (reference dataset/__init__.py:5-35).

    Each dataset config names its ``type`` and the split(s) it consumes
    (``data_split`` may list several; their slice dicts concatenate).
    """
    datasets: Dict[str, SliceGroupedDataset] = {}
    for name, cfg in datasets_config.items():
        cls = _DATASET_REGISTRY[cfg["type"]]
        split_names: Sequence[str] = cfg.get("data_split", [name])
        if isinstance(split_names, str):
            split_names = [split_names]
        data: List[Dict[str, Any]] = []
        for sn in split_names:
            data.extend(data_splits[sn]["data"])
        datasets[name] = cls(data, dataset_config=cfg, full_config=full_config or {},
                             dataset_name=name)
    return datasets
