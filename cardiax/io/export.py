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


KNOWN_SAVE_METHODS = ("state_dict", "jit", "onnx", "model_zip_state_dict",
                      "model_zip_state_dict_pt")


def validate_save_method(saving_conf: Dict[str, Any] | None) -> None:
    """Fail FAST on an unknown ``saving.save_model_method``/``method`` string:
    without this, a typo is only discovered when save_model raises at
    end-of-run — after the full training has completed (ADVICE r3)."""
    method = (saving_conf or {}).get("save_model_method") \
        or (saving_conf or {}).get("method")
    if method and method not in KNOWN_SAVE_METHODS:
        raise ValueError(
            f"saving.save_model_method={method!r} is not one of "
            f"{KNOWN_SAVE_METHODS} — aborting before training starts")


def save_predictions(preds: List[Dict[str, Any]], path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, np.array(preds, dtype=object), allow_pickle=True)


def save_trained_models(saving_dir: str | Path, models: Dict[str, Any],
                        full_config: Dict[str, Any],
                        performance: Dict[str, Any] | None = None,
                        example_args: Dict[str, tuple] | None = None) -> None:
    """Persist config + performance + per-model msgpack params; additionally,
    when ``saving.save_model_method`` (reference: ``saving.method``,
    joint_registration_regression_trainer.py:1016-1067) selects a compiled
    format ('jit'/'onnx'/'model_zip_state_dict'), run ``save_model`` per
    bundle. ``example_args[name]`` supplies the apply args the compiled
    formats need (from ``Scheme.example_model_args``)."""
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
    saving_conf = full_config.get("saving", {}) or {}
    method = saving_conf.get("save_model_method") or saving_conf.get("method")
    if method and method != "state_dict":    # state_dict == the msgpacks above
        import warnings
        for name, bundle in models.items():
            if getattr(bundle, "params", None) is None:
                continue
            args = (example_args or {}).get(name)
            if method in ("jit", "onnx") and args is None:
                warnings.warn(
                    f"save_model_method={method!r} needs example args for "
                    f"model {name!r} (Scheme.example_model_args returned "
                    f"none); wrote params-only msgpack instead")
                continue
            out = save_model(bundle, saving_dir / f"model-{name}",
                             method=method, example_args=args)
            print(f"exported model {name} ({method}) -> {out}")


def load_model_params(path: str | Path, template: Any) -> Any:
    with open(path, "rb") as f:
        raw = f.read()
    try:
        return serialization.from_bytes(template, raw)
    except (ValueError, KeyError) as e:
        # a raw tree-mismatch error here is indecipherable; name the one known
        # breaking change so old artifacts fail loudly and explainably
        raise ValueError(
            f"params in {path} do not match the current model's param tree. "
            f"If this artifact was written by round<=2 code: the UNet/strain-"
            f"head tree layout changed in round 3 (packed-conv refactor — "
            f"Conv_0/GroupNorm_0/Dense_0 -> block/conv/scale/mix_kernel) and "
            f"old msgpack exports cannot be restored. Original error: {e}"
        ) from e


def save_model(bundle: Any, path_stem: str | Path, method: str = "state_dict",
               example_args: tuple | None = None) -> Path:
    """Multi-format single-model export (reference ``save_model``'s four
    formats, joint_registration_regression_trainer.py:1016-1067, re-mapped to
    the JAX ecosystem):

      * ``state_dict``          -> flax msgpack params            (.msgpack)
      * ``jit``                 -> jax.export serialized StableHLO (.stablehlo)
                                   — the torch.jit-script analog: a
                                   self-contained compiled artifact;
      * ``onnx``                -> also StableHLO (ONNX export has no JAX
                                   path in this image; StableHLO is the
                                   portable-IR equivalent);
      * ``model_zip_state_dict``-> zip of the model's python source package
                                   + msgpack params               (.zip)
    """
    import zipfile
    path_stem = Path(path_stem)
    path_stem.parent.mkdir(parents=True, exist_ok=True)
    if method == "state_dict":
        out = path_stem.with_suffix(".msgpack")
        with open(out, "wb") as f:
            f.write(serialization.to_bytes(bundle.params))
        return out
    if method in ("jit", "onnx"):
        import jax
        from jax import export as jax_export
        assert example_args is not None, "jit export needs example_args"
        fn = lambda *a: bundle.module.apply(bundle.params, *a)
        exported = jax_export.export(jax.jit(fn))(*example_args)
        out = path_stem.with_suffix(".stablehlo")
        with open(out, "wb") as f:
            f.write(exported.serialize())
        return out
    if method in ("model_zip_state_dict", "model_zip_state_dict_pt"):
        import cardiax
        out = path_stem.with_suffix(".zip")
        pkg_dir = Path(cardiax.__file__).parent
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for py in sorted(pkg_dir.rglob("*.py")):
                z.write(py, Path("cardiax") / py.relative_to(pkg_dir))
            z.writestr("params.msgpack", serialization.to_bytes(bundle.params))
        return out
    raise ValueError(f"Unknown save method {method!r}")


def load_exported(path: str | Path):
    """Deserialize a ``save_model`` StableHLO artifact; the returned object's
    ``.call(*args)`` reproduces the exported ``module.apply`` (round-trip
    test-pinned in tests/test_export.py)."""
    from jax import export as jax_export
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
