"""Prediction/model export in the reference's file formats.

* ``save_predictions``: npy list-of-dicts (``val_pred.npy``/``test_pred.npy``,
  reference main.py:103-107) so downstream parity tooling and the 3D
  activation-map plotter consume either framework's outputs.
* ``save_trained_models``: config.json + performance.json + per-model params
  (reference joint_registration_regression_trainer.py:1086-1126; state_dicts
  become flax param pytrees serialized with ``flax.serialization``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List

import numpy as np
from flax import serialization


def save_predictions(preds: List[Dict[str, Any]], path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, np.array(preds, dtype=object), allow_pickle=True)


def save_trained_models(saving_dir: str | Path, models: Dict[str, Any],
                        full_config: Dict[str, Any],
                        performance: Dict[str, Any] | None = None) -> None:
    saving_dir = Path(saving_dir)
    saving_dir.mkdir(parents=True, exist_ok=True)
    with open(saving_dir / "config.json", "w") as f:
        json.dump(full_config, f, indent=4, default=str)
    if performance is not None:
        with open(saving_dir / "performance.json", "w") as f:
            json.dump({k: float(v) if hasattr(v, "__float__") else v
                       for k, v in performance.items()}, f, indent=4)
    for name, bundle in models.items():
        params = getattr(bundle, "params", bundle)
        if params is None:
            continue
        with open(saving_dir / f"model-{name}.msgpack", "wb") as f:
            f.write(serialization.to_bytes(params))


def load_model_params(path: str | Path, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
