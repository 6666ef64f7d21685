"""Config system: JSON file -> known-arg overrides -> hierarchical free-form overrides.

Capability parity with the reference config layer (reference:
modules/config/config.py:4-241): a single nested dict drives every registry
(data, splits, datasets, networks, trainer scheme, losses, saving), CLI flags
use ``argparse.SUPPRESS`` defaults so only explicitly-passed flags override the
file, and unknown args form a hierarchical override DSL ``--a--b--c=value``
(with ``INDEX<n>`` addressing list elements) so wandb-style sweeps can patch
any config leaf without code changes.
"""

from __future__ import annotations

import argparse
import copy
import json
from pathlib import Path
from typing import Any, Dict, List, Tuple


# --------------------------------------------------------------------------- #
# CLI                                                                          #
# --------------------------------------------------------------------------- #

def get_args(argv: List[str] | None = None) -> Tuple[argparse.Namespace, List[str]]:
    """Parse known flags; everything unrecognized is returned for the override DSL.

    All defaults are ``argparse.SUPPRESS``: a flag only lands in the namespace
    when the user passed it, so ``update_config_by_args`` never clobbers the
    JSON file with defaults (reference semantics, modules/config/config.py:4-67).
    """
    p = argparse.ArgumentParser(description="cardiax experiment runner", allow_abbrev=False)
    S = {"default": argparse.SUPPRESS}
    p.add_argument("--config-file", "--config_file", dest="config_file",
                   type=str, default="configs/joint.json")
    p.add_argument("--epochs", type=int, **S)
    p.add_argument("--batch-size", "--batch_size", dest="batch_size", type=int, **S)
    p.add_argument("--seed", type=int, **S)
    p.add_argument("--learning-rate", dest="learning_rate", type=float, **S)
    p.add_argument("--weight-decay", dest="weight_decay", type=float, **S)
    p.add_argument("--n-read", dest="n_read", type=int, **S)
    p.add_argument("--inference-only", dest="inference_only", type=str, **S)
    p.add_argument("--use-wandb", dest="use_wandb", type=str, **S)
    p.add_argument("--save-nothing", dest="save_nothing", type=str, **S)
    p.add_argument("--saving-dir", dest="saving_dir", type=str, **S)
    p.add_argument("--profile-dir", dest="profile_dir", type=str, **S)
    p.add_argument("--mesh-shape", dest="mesh_shape", type=str, **S)
    args, undefined = p.parse_known_args(argv)
    return args, undefined


def update_config_by_args(config: Dict[str, Any], args: argparse.Namespace) -> Dict[str, Any]:
    """Map explicitly-passed known flags onto config-dict paths
    (reference: modules/config/config.py:69-164)."""
    config = copy.deepcopy(config)
    a = vars(args)

    def has(k):
        return k in a

    if has("epochs"):
        config.setdefault("training", {})["epochs"] = a["epochs"]
    if has("batch_size"):
        config.setdefault("training", {})["batch_size"] = a["batch_size"]
    if has("seed"):
        config.setdefault("training", {})["seed"] = a["seed"]
    if has("n_read"):
        config.setdefault("data", {})["n_read"] = a["n_read"]
    if has("inference_only"):
        config.setdefault("training", {})["inference_only"] = coerce_str(a["inference_only"])
    if has("learning_rate"):
        for opt in config.get("training", {}).get("optimizers", {}).values():
            opt["learning_rate"] = a["learning_rate"]
    if has("weight_decay"):
        for opt in config.get("training", {}).get("optimizers", {}).values():
            opt["weight_decay"] = a["weight_decay"]
    if has("use_wandb"):
        config.setdefault("others", {})["use_wandb"] = coerce_str(a["use_wandb"])
    if has("saving_dir"):
        config.setdefault("saving", {})["saving_dir"] = a["saving_dir"]
    if has("profile_dir"):
        config.setdefault("others", {})["profile_dir"] = a["profile_dir"]
    if has("mesh_shape"):
        config.setdefault("parallel", {})["mesh_shape"] = a["mesh_shape"]
    if has("save_nothing") and coerce_str(a["save_nothing"]):
        # bundle toggle (reference: config.py:142-145)
        saving = config.setdefault("saving", {})
        saving["save_final_model"] = False
        saving["save_checkpoint"] = False
        saving["save_prediction"] = False
        config.setdefault("others", {})["use_wandb"] = False
    return config


# --------------------------------------------------------------------------- #
# Hierarchical override DSL                                                    #
# --------------------------------------------------------------------------- #

def coerce_str(s: Any) -> Any:
    """Auto type-coercion: int / float / bool / None, else str
    (reference: modules/config/config.py:173-193)."""
    if not isinstance(s, str):
        return s
    low = s.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    if low in ("none", "null"):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


_INDEX_PREFIX = "INDEX"


def update_config_by_undefined_args(config: Dict[str, Any], undefined_args: List[str]) -> Dict[str, Any]:
    """Apply ``--a--b--c=value`` overrides; ``INDEX<n>`` path segments address
    list elements (reference: modules/config/config.py:195-219).

    Accepts both ``--a--b=v`` single tokens and ``--a--b v`` token pairs.
    """
    config = copy.deepcopy(config)
    tokens: List[Tuple[str, str]] = []
    i = 0
    while i < len(undefined_args):
        tok = undefined_args[i]
        if not tok.startswith("--"):
            i += 1
            continue
        if "=" in tok:
            key, val = tok[2:].split("=", 1)
            tokens.append((key, val))
            i += 1
        elif i + 1 < len(undefined_args) and not undefined_args[i + 1].startswith("--"):
            tokens.append((tok[2:], undefined_args[i + 1]))
            i += 2
        else:
            tokens.append((tok[2:], "true"))
            i += 1

    for key, raw in tokens:
        path = key.split("--")
        node: Any = config
        for seg in path[:-1]:
            if seg.startswith(_INDEX_PREFIX):
                node = node[int(seg[len(_INDEX_PREFIX):])]
            else:
                if not isinstance(node, dict):
                    raise KeyError(f"override path {key!r}: {seg!r} is not a dict level")
                node = node.setdefault(seg, {})
        leaf = path[-1]
        val = coerce_str(raw)
        if leaf.startswith(_INDEX_PREFIX):
            node[int(leaf[len(_INDEX_PREFIX):])] = val
        else:
            node[leaf] = val
    return config


def update_config_by_another_config(config: Dict[str, Any], other: Dict[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge — sweep-parameter injection
    (reference: modules/config/config.py:223-234)."""
    config = copy.deepcopy(config)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = copy.deepcopy(v)

    merge(config, other)
    return config


def load_config_from_json(path: str | Path) -> Dict[str, Any]:
    """Load the experiment config (reference: modules/config/config.py:236-241)."""
    with open(path) as f:
        return json.load(f)
