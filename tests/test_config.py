import json

from cardiax.config import (
    coerce_str,
    get_args,
    load_config_from_json,
    update_config_by_another_config,
    update_config_by_args,
    update_config_by_undefined_args,
)


def test_coerce():
    assert coerce_str("true") is True
    assert coerce_str("False") is False
    assert coerce_str("3") == 3 and isinstance(coerce_str("3"), int)
    assert coerce_str("3.5") == 3.5
    assert coerce_str("none") is None
    assert coerce_str("hello") == "hello"


def test_known_args_only_override_when_passed():
    cfg = {"training": {"epochs": 1000, "batch_size": 10,
                        "optimizers": {"a": {"learning_rate": 1e-4, "weight_decay": 1e-4}}}}
    args, undef = get_args(["--epochs", "5"])
    out = update_config_by_args(cfg, args)
    assert out["training"]["epochs"] == 5
    assert out["training"]["batch_size"] == 10  # untouched
    assert cfg["training"]["epochs"] == 1000     # input not mutated


def _base_cfg():
    return {
        "info": {"experiment_name": "orig"},
        "data": {"n_read": -1},
        "data_split": {"splits": {"train": {"balance_classes": True},
                                  "val": {}}},
        "training": {"epochs": 1000, "batch_size": 10,
                     "optimizers": {"a": {"type": "Adam", "learning_rate": 1e-4,
                                          "weight_decay": 1e-4},
                                    "b": {"type": "Adam", "learning_rate": 5e-4}}},
        "losses": {"first": {"weight": 1.0}, "second": {"weight": 2.0}},
        "saving": {"saving_dir": "x"},
        "others": {},
    }


def test_reference_flag_mapping_table():
    """Every reference CLI flag (modules/config/config.py:4-164) maps onto a
    config path; table-driven (flag tokens -> (path, expected value))."""
    table = [
        (["--exp-name", "exp9"], ("info", "experiment_name"), "exp9"),
        (["--use-exp-name"], ("info", "use_experiment_name"), True),
        (["--n-read", "7"], ("data", "n_read"), 7),
        (["--mask-out", "myo"], ("data", "mask_out"), "myo"),
        (["--crop-to-myocardium-size", "120,110"],
         ("data", "crop_to_myocardium_size"), [120, 110]),
        (["--resize-img-size", "224,224"], ("data", "resize_size"), [224, 224]),
        (["--pre-load-data", "true"], ("data", "pre_load_data"), True),
        (["--load-pretrained-model", "true"],
         ("training", "load_pretrained_model"), True),
        (["--pretrained-model-path", "/p"],
         ("training", "pretrained_model_path"), "/p"),
        (["--epochs", "5"], ("training", "epochs"), 5),
        (["--batch-size", "3"], ("training", "batch_size"), 3),
        (["--mixed-precision", "true"], ("training", "mixed_precision"), True),
        (["--early-stop-patience", "9"],
         ("training", "epochs_without_improvement_tolerance"), 9),
        (["--early-stop-metric", "val/total_loss"],
         ("training", "early_stop_metric"), "val/total_loss"),
        (["--test", "true"], ("training", "test"), True),
        (["--test-config-file", "t.json"], ("training", "test_config_file"), "t.json"),
        (["--saving_dir", "/out"], ("saving", "saving_dir"), "/out"),
        (["--use-wandb", "true"], ("others", "use_wandb"), True),
        (["--wandb-sweep", "true"], ("others", "wandb_sweep"), True),
        (["--wandb-sweep-file", "s.yaml"], ("others", "wandb_sweep_file"), "s.yaml"),
        (["--enable-wandb-upload", "false"], ("others", "enable_wandb_upload"), False),
        (["--print-config", "true"], ("others", "print_config"), True),
        (["--valid-period", "4"], ("others", "valid_period"), 4),
    ]
    for tokens, path, expected in table:
        args, undef = get_args(tokens)
        assert undef == [], f"{tokens} not recognized as known flags"
        out = update_config_by_args(_base_cfg(), args)
        node = out
        for seg in path:
            node = node[seg]
        assert node == expected, f"{tokens} -> {path}: {node} != {expected}"


def test_broadcast_flags_hit_every_optimizer_and_positional_losses():
    args, _ = get_args(["--learning-rate", "0.01", "--weight-decay", "0.5",
                        "--optimizer", "SGD", "--loss-1-weight", "9.0",
                        "--loss-2-weight", "8.0", "--no-repeat-data"])
    out = update_config_by_args(_base_cfg(), args)
    for opt in out["training"]["optimizers"].values():
        assert opt["learning_rate"] == 0.01
        assert opt["weight_decay"] == 0.5
        assert opt["type"] == "SGD"
    assert out["losses"]["first"]["weight"] == 9.0
    assert out["losses"]["second"]["weight"] == 8.0
    for split in out["data_split"]["splits"].values():
        assert split["balance_classes"] is False


def test_hierarchical_override_dsl():
    cfg = {"training": {"inference_only": False},
           "losses": {"TOS_regression": {"weight": 0.005}},
           "data": {"data_to_feed": [{"key": "a"}, {"key": "b"}]}}
    out = update_config_by_undefined_args(cfg, [
        "--training--inference_only=true",
        "--losses--TOS_regression--weight=0.1",
        "--data--data_to_feed--INDEX1--key=c",
        "--new--nested--leaf", "42",
    ])
    assert out["training"]["inference_only"] is True
    assert out["losses"]["TOS_regression"]["weight"] == 0.1
    assert out["data"]["data_to_feed"][1]["key"] == "c"
    assert out["new"]["nested"]["leaf"] == 42


def test_recursive_merge():
    cfg = {"a": {"b": 1, "c": 2}, "d": 3}
    out = update_config_by_another_config(cfg, {"a": {"c": 9}, "e": 4})
    assert out == {"a": {"b": 1, "c": 9}, "d": 3, "e": 4}


def test_load_config_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"info": {"experiment_name": "x"}}))
    assert load_config_from_json(p)["info"]["experiment_name"] == "x"


def test_all_shipped_config_presets_build():
    """Every configs/*.json parses and its networks section builds real
    modules (a broken preset — e.g. the batch-20 production config — should
    fail CI, not a user's first run)."""
    import glob
    import os
    from cardiax.config.config import load_config_from_json
    from cardiax.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.json")))
    assert len(paths) >= 8
    for path in paths:
        cfg = load_config_from_json(path)
        assert cfg.get("networks"), path
        for name, mc in cfg["networks"].items():
            bundle = build_model(mc)
            assert bundle.module is not None, (path, name)
