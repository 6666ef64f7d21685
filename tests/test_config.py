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
