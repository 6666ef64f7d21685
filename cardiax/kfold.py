"""K-fold cross-validation driver: the reference's SplitManager loop
(modules/data/data_split.py:193-325 + the fold{i}/ metric convention and
cross-fold averaging, modules/loss/__init__.py:5-55).

Usage:
    python -m cardiax.kfold --config-file cfg.json --folds-file folds.json
or programmatically: ``run_kfold(config, folds)`` where ``folds`` is a list of
subject-regex lists. Fold i: test = fold i, val = fold (i+1) % k, train = rest.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence

from cardiax.data import load_data
from cardiax.data.datasets import build_datasets
from cardiax.data.split import SplitManager, split_data
from cardiax.losses.metrics import get_average_performance_dict
from cardiax.models import build_model
from cardiax.train import build_trainer


def run_kfold(config: Dict[str, Any], folds: Sequence[Sequence[str]],
              mesh=None) -> Dict[str, Any]:
    all_data = load_data(config["data"], config)
    manager = SplitManager(folds, config.get("data_split"))
    fold_performances: List[Dict[str, float]] = []
    fold_results = []
    for fold_cfg in manager:
        prefix = fold_cfg["metric_prefix"]
        print(f"=== fold {fold_cfg['fold_idx']} ===")
        splits = split_data(all_data, fold_cfg)
        datasets = build_datasets(config["datasets"], splits, config)
        networks = {n: build_model(mc) for n, mc in config["networks"].items()}
        tcfg = dict(config["training"])
        tcfg["metric_prefix"] = prefix
        trainer = build_trainer(tcfg, None, config, mesh=mesh)
        trained, tracker = trainer.train(models=networks, datasets=datasets,
                                         trainer_config=tcfg, full_config=config)
        perf_all: Dict[str, float] = {}
        for target in ("val", "test"):
            if target in datasets and len(datasets[target]) == 0:
                # patterns match via re.match (anchored at the START of the
                # subject/slice id) — a mid-id token like "CT00" against ids
                # "SET00-CT00" needs a ".*CT00.*" wrapper
                import warnings
                warnings.warn(
                    f"fold {fold_cfg['fold_idx']}: the {target} split matched "
                    f"0 slices — fold patterns are start-anchored regexes "
                    f"(re.match); wrap mid-id tokens as '.*CT00.*'. "
                    f"Performance will be blank", RuntimeWarning)
            if target in datasets and len(datasets[target]) > 0:
                _, perf, tracker = trainer.test(
                    models=trained, datasets=datasets, trainer_config=tcfg,
                    full_config=config, target_dataset=target, tracker=tracker)
                perf_all.update({f"{prefix}{k}": v for k, v in perf.items()})
        fold_performances.append(perf_all)
        fold_results.append({"fold": fold_cfg["fold_idx"], "performance": perf_all})
        print(json.dumps(perf_all, indent=2, default=float))
    average = get_average_performance_dict(fold_performances)
    print(json.dumps(average, indent=2, default=float))
    return {"folds": fold_results, "average": average}


def main(argv=None):
    import argparse
    from cardiax.config import (load_config_from_json, update_config_by_args,
                                update_config_by_undefined_args, get_args)
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--folds-file", dest="folds_file", required=True)
    fold_args, rest = p.parse_known_args(argv)
    args, undefined = get_args(rest)
    config = load_config_from_json(args.config_file)
    config = update_config_by_args(config, args)
    config = update_config_by_undefined_args(config, undefined)
    with open(fold_args.folds_file) as f:
        folds = json.load(f)
    return run_kfold(config, folds)


if __name__ == "__main__":
    main()
