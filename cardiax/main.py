"""Experiment entry point: ``python -m cardiax.main --config-file cfg.json ...``

Orchestration parity with reference main.py:1-107: parse args -> load/override
config -> load_data -> split_data -> build_datasets -> build_model per network
-> build_trainer -> train (unless inference_only) -> test on val + test ->
save val_pred.npy / test_pred.npy. Device setup is replaced by mesh setup
(all visible TPU chips; override with --mesh-shape).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np


def _load_params_into(trainer, networks, datasets, config, path) -> None:
    """Initialize a param template from one example batch, then overwrite it
    with persisted msgpack exports (shared by the warm-start and
    inference-only paths). ``path`` may be a directory of model-<name>.msgpack
    files or a single msgpack file."""
    from pathlib import Path as _P

    from cardiax.io.export import load_model_params
    pdir = _P(path)
    src_name = "train" if len(datasets.get("train", ())) else \
        next(n for n, d in datasets.items() if len(d))
    example = next(iter(trainer.scheme.make_loader(
        datasets[src_name], int(config["training"].get("batch_size", 10)),
        shuffle=False)))
    trainer.setup(networks, example, steps_per_epoch=1,
                  seed=int(config["training"].get("seed", 2434)))
    for name, bundle in networks.items():
        mp = pdir / f"model-{name}.msgpack" if pdir.is_dir() else pdir
        if mp.exists():
            loaded = load_model_params(mp, trainer.params[name])
            trainer.params[name] = loaded
            bundle.params = loaded
            print(f"loaded params for {name} from {mp}")


def run(config: Dict[str, Any]) -> Dict[str, Any]:
    import jax
    from cardiax.data import load_data
    from cardiax.data.datasets import build_datasets
    from cardiax.data.split import split_data
    from cardiax.io.export import (save_predictions, save_trained_models,
                                   validate_save_method)
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh
    from cardiax.train import build_trainer

    # 0. fail fast on config typos whose natural failure point is END of run
    validate_save_method(config.get("saving"))

    # 1. data
    all_data = load_data(config["data"], config)
    data_splits = split_data(all_data, config["data_split"])
    for split_name, split in data_splits.items():
        subjects = {d["subject_id"] for d in split["data"]}
        print(f"split {split_name}: {len(split['data'])} slices "
              f"from {len(subjects)} patients")

    # 2. datasets
    datasets = build_datasets(config["datasets"], data_splits, config)
    for name, ds in datasets.items():
        print(f"dataset {name}: {len(ds)}")

    # 3. models
    networks = {name: build_model(mc) for name, mc in config["networks"].items()}

    # 4. mesh + trainer
    par_cfg = config.get("parallel", {})
    mesh_shape = par_cfg.get("mesh_shape")
    if isinstance(mesh_shape, str):
        mesh_shape = tuple(int(x) for x in mesh_shape.split(",") if x)
    axis_names = par_cfg.get("axis_names")
    if isinstance(axis_names, str):
        axis_names = tuple(a for a in axis_names.split(",") if a)
    mesh = get_mesh(mesh_shape, axis_names)
    print(f"mesh: {mesh.shape} over {len(jax.devices())} devices "
          f"({jax.devices()[0].platform})")
    trainer = build_trainer(config["training"], None, config, mesh=mesh)

    # 5. train
    inference_only = config["training"].get("inference_only", False)
    saving = config.get("saving", {})
    tracker = None

    # optional warm start (reference --load-pretrained-model /
    # --pretrained-model-path, config.py:120-122): initialize then overwrite
    # params from a msgpack export before training
    pretrained = config["training"].get("load_pretrained_model", False)
    pre_path = config["training"].get("pretrained_model_path")
    if pretrained and str(pretrained).lower() not in ("false", "f") and pre_path:
        _load_params_into(trainer, networks, datasets, config, pre_path)

    if not inference_only:
        try:
            trained_models, tracker = trainer.train(
                models=networks, datasets=datasets,
                trainer_config=config["training"], full_config=config,
                use_wandb=config.get("others", {}).get("use_wandb", False))
        except KeyboardInterrupt:
            # save_KeyboardInterrupt: persist whatever was learned before the
            # interrupt (the reference declares this flag but never reads it —
            # configs/config.json:206, SURVEY.md 5.3)
            if saving.get("save_KeyboardInterrupt", True):
                from cardiax.io.export import save_trained_models
                sd = Path(saving.get("saving_dir", "./test_results"))
                if trainer.params is not None:
                    for name, bundle in networks.items():
                        bundle.params = trainer.params.get(name)
                save_trained_models(sd / "interrupted", networks, config)
                print(f"KeyboardInterrupt: models saved to {sd / 'interrupted'}")
            raise
        trained_models = {f"{k}_model": v for k, v in networks.items()}
    else:
        # inference-only: init a template then load persisted params over it
        # (the reference's load path is effectively absent — SURVEY.md 5.4);
        # skip the re-load when a warm start already populated the params
        if not (pretrained and pre_path):
            _load_params_into(trainer, networks, datasets, config,
                              saving.get("saving_dir", "./test_results"))
        trained_models = {f"{k}_model": v for k, v in networks.items()}

    # 6. inference
    results: Dict[str, Any] = {"models": trained_models}
    saving_dir = Path(saving.get("saving_dir", "./test_results"))
    extra_targets = tuple(config.get("others", {}).get("final_eval_datasets", ()))
    # reference --test flag: training.test=False skips final inference
    do_test = config["training"].get("test", True)
    targets = ("val", "test") + extra_targets \
        if do_test not in (False, "false", "False", "f") else ()
    for target in targets:
        if target not in datasets or len(datasets[target]) == 0:
            continue
        preds, perf, tracker = trainer.test(
            models=trained_models, datasets=datasets,
            trainer_config=config["training"], full_config=config,
            target_dataset=target, tracker=tracker)
        print(json.dumps(perf, indent=2, default=float))
        results[f"{target}_performance"] = perf
        if saving.get("save_prediction", True):
            fname = saving.get(f"{target}_save_filename", f"{target}_pred.npy")
            save_predictions(preds, saving_dir / fname)
            results[f"{target}_pred_path"] = str(saving_dir / fname)

    # 7. save models
    if saving.get("save_final_model", False):
        bundles = {k[:-6]: v for k, v in trained_models.items()
                   if k.endswith("_model")}
        perf_all = {k: v for t in ("val", "test")
                    for k, v in results.get(f"{t}_performance", {}).items()}
        # compiled-format export (saving.save_model_method jit/onnx) needs
        # per-model example apply args — derive them from one batch via the
        # scheme (reference save_model's dummy inputs,
        # joint_registration_regression_trainer.py:1040-1049)
        example_args = None
        method = saving.get("save_model_method") or saving.get("method")
        if method in ("jit", "onnx") and trainer.params is not None:
            import jax.numpy as jnp
            src_name = next((n for n in ("train", "val", "test")
                             if len(datasets.get(n, ())) > 0), None)
            if src_name is not None:
                ex = next(iter(trainer.scheme.make_loader(
                    datasets[src_name],
                    int(config["training"].get("batch_size", 10)),
                    shuffle=False)))
                arrays = {k: jnp.asarray(v) for k, v in ex.items()
                          if isinstance(v, np.ndarray)}
                example_args = trainer.scheme.example_model_args(
                    trainer.modules, trainer.params, arrays)
        save_trained_models(saving_dir, bundles, config, perf_all,
                            example_args=example_args)
    if tracker is not None:
        tracker.finish()
    return results


def main(argv=None):
    import os

    from cardiax.config import (get_args, load_config_from_json,
                                update_config_by_args,
                                update_config_by_undefined_args)
    if os.environ.get("CARDIAX_TPU_LOCK"):
        # cooperative single-process TPU guard (the axon tunnel does not
        # queue a second client — CLAUDE.md one-process trap); released on
        # process exit via the lock's pid-liveness staleness rule
        import atexit

        from cardiax.utils.tpulock import release, tpu_lock
        tpu_lock("cardiax.main", timeout=float(
            os.environ.get("CARDIAX_TPU_LOCK_TIMEOUT", "600"))).__enter__()
        atexit.register(release)
    args, undefined = get_args(argv)
    config = load_config_from_json(args.config_file)
    config = update_config_by_args(config, args)
    config = update_config_by_undefined_args(config, undefined)
    if config.get("others", {}).get("print_config", False):
        print(json.dumps(config, indent=2))
    seed = config.get("training", {}).get("seed", 2434)
    np.random.seed(seed)
    return run(config)


if __name__ == "__main__":
    main()
