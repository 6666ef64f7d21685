"""Golden pin of the flagship param-tree layout (VERDICT r3 #6).

The round-3 packed-conv refactor silently changed the UNet/strain-head param
paths, orphaning every earlier msgpack/orbax artifact. This test makes the
NEXT layout change fail CI loudly instead: the full flagship tree (paths +
shapes at the graft-entry shapes) is pinned against a checked-in golden.

If this test fails because of an INTENTIONAL layout change: regenerate the
golden (instructions below), bump the note in STATUS.md's breaking-changes
section, and make sure load_model_params/CheckpointManager.restore still
raise their explanatory tree-mismatch errors for old artifacts.

Regenerate:
    python - <<'EOF'
    ... (see tests/test_param_tree_golden.py::_current_paths)
    EOF
"""

import json
from pathlib import Path

import jax
import pytest

GOLDEN = Path(__file__).parent / "golden" / "flagship_param_tree.json"


def _current_paths():
    import __graft_entry__ as ge
    from cardiax.models import build_model
    from cardiax.train import build_trainer

    cfg = ge._flagship_config()
    batch = ge._synthetic_batch()
    networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    modules = {k: m.module for k, m in networks.items()}
    params = trainer.scheme.init_params(modules, jax.random.PRNGKey(0), batch)
    paths = []
    for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in p)
        paths.append(f"{key} {tuple(leaf.shape)}")
    return sorted(paths)


def test_flagship_param_tree_matches_golden():
    golden = json.loads(GOLDEN.read_text())
    current = _current_paths()
    added = sorted(set(current) - set(golden))
    removed = sorted(set(golden) - set(current))
    assert current == golden, (
        "flagship param-tree layout changed — this BREAKS every existing "
        "msgpack export and orbax checkpoint. If intentional, regenerate "
        f"tests/golden/flagship_param_tree.json and document the break.\n"
        f"added: {added[:10]}\nremoved: {removed[:10]}")


def test_old_artifact_fails_with_explanatory_error(tmp_path):
    """A params file whose tree doesn't match must raise the round<=2
    migration message, not a raw flax error (VERDICT r3 #6 second half)."""
    import numpy as np
    from flax import serialization

    from cardiax.io.export import load_model_params

    old_style = {"params": {"Conv_0": {"kernel": np.zeros((3, 3, 1, 4))}}}
    p = tmp_path / "model-old.msgpack"
    p.write_bytes(serialization.to_bytes(old_style))
    template = {"params": {"block": {"conv": {"kernel": np.zeros((3, 3, 1, 4))}}}}
    with pytest.raises(ValueError, match="round<=2|tree layout changed"):
        load_model_params(p, template)
