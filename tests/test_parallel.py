"""Distributed correctness: pjit data-parallel train step over 8 virtual
devices must match the single-device step bit-for-bit-ish (SURVEY.md section 4
item 4, section 2.13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cardiax.data.datasets import build_datasets
from cardiax.data.loader import Batcher
from cardiax.data.synthetic import make_dataset
from cardiax.models import build_model
from cardiax.parallel.mesh import batch_sharding, get_mesh, shard_batch
from cardiax.train import build_trainer

T = 10


def _setup(mesh):
    data = make_dataset(n_subjects=4, slices_per_subject=2, h=16, w=16,
                        n_frames=T, seed=13)
    for i, d in enumerate(data):
        d["slice_full_id"] = f"{d['subject_id']}-{i}"
        d["slice_idx"] = i
        d["augmented"] = False
    splits = {"train": {"data": data}}
    ds = build_datasets({"train": {"type": "LMADataset", "data_split": ["train"],
                                   "n_frames_to_use_for_regression": T}},
                        splits)["train"]
    cfg = {
        "networks": {"LMA": {"type": "NetStrainMat2LMA", "num_conv_layers": 1,
                             "inner_conv_channel_num": 4, "n_frames": T}},
        "training": {"scheme": "LMA", "LMA_modality": "strain_mat", "seed": 7,
                     "batch_size": 8, "epochs": 1,
                     "optimizers": {"LMA": {"type": "Adam", "learning_rate": 1e-3}}},
        "losses": {"TOS_regression": {"criterion": "MSELoss", "prediction": "TOS",
                                      "target": "TOS", "weight": 1.0}},
        "saving": {}, "others": {},
    }
    networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
    batch = next(iter(Batcher(ds, 8, shuffle=False)))
    trainer.setup(networks, batch, steps_per_epoch=1, seed=7)
    return trainer, batch


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_step_matches_single_device():
    mesh8 = get_mesh((8,))
    mesh1 = get_mesh((1,))

    t8, batch = _setup(mesh8)
    t1, _ = _setup(mesh1)

    a8 = {k: v for k, v in shard_batch(batch, mesh8).items()
          if isinstance(v, jax.Array)}
    a1 = {k: v for k, v in shard_batch(batch, mesh1).items()
          if isinstance(v, jax.Array)}
    # the batch really is split over 8 devices
    assert len(a8["strain_mat"].sharding.device_set) == 8
    assert len(a1["strain_mat"].sharding.device_set) == 1

    p8, o8, v8 = t8._train_step(t8.params, t8.opt_states, a8)
    p1, o1, v1 = t1._train_step(t1.params, t1.opt_states, a1)

    # identical loss values
    assert np.isclose(float(v8["total_loss"]), float(v1["total_loss"]),
                      rtol=1e-5)
    # parameters after one Adam step: identical except where the gradient is
    # ~0 — there the cross-device psum's different float summation order can
    # flip the sign of m_hat/sqrt(v_hat), producing a +-lr update flip. Allow
    # exactly that artifact (few elements, each bounded by 2*lr) and nothing
    # else.
    lr = 1e-3
    total = bad = 0
    for l8, l1 in zip(jax.tree_util.tree_leaves(p8),
                      jax.tree_util.tree_leaves(p1)):
        a, b = np.asarray(l8), np.asarray(l1)
        mism = ~np.isclose(a, b, rtol=2e-5, atol=2e-6)
        total += a.size
        bad += int(mism.sum())
        if mism.any():
            assert np.abs(a - b)[mism].max() <= 2 * lr + 1e-6
    assert bad / total < 0.01, f"{bad}/{total} params differ beyond sign flips"


def test_2d_mesh_step_matches_single_device():
    # (data, seq) mesh: the folded batch/pair axis shards over the full axis
    # product — validates the multi-axis sharding path end to end
    mesh42 = get_mesh((4, 2))
    mesh1 = get_mesh((1,))
    assert mesh42.axis_names == ("data", "seq")

    t42, batch = _setup(mesh42)
    t1, _ = _setup(mesh1)
    a42 = {k: v for k, v in shard_batch(batch, mesh42).items()
           if isinstance(v, jax.Array)}
    a1 = {k: v for k, v in shard_batch(batch, mesh1).items()
          if isinstance(v, jax.Array)}
    assert len(a42["strain_mat"].sharding.device_set) == 8

    _, _, v42 = t42._train_step(t42.params, t42.opt_states, a42)
    _, _, v1 = t1._train_step(t1.params, t1.opt_states, a1)
    assert np.isclose(float(v42["total_loss"]), float(v1["total_loss"]),
                      rtol=1e-5)


def test_eval_step_sharded_preds_match(tmp_path):
    mesh8 = get_mesh((8,))
    mesh1 = get_mesh((1,))
    t8, batch = _setup(mesh8)
    t1, _ = _setup(mesh1)
    # same init seed => identical params; compare eval outputs
    a8 = {k: v for k, v in shard_batch(batch, mesh8).items()
          if isinstance(v, jax.Array)}
    a1 = {k: v for k, v in shard_batch(batch, mesh1).items()
          if isinstance(v, jax.Array)}
    _, pred8 = t8._eval_step(t8.params, a8)
    _, pred1 = t1._eval_step(t1.params, a1)
    np.testing.assert_allclose(np.asarray(pred8["TOS"]),
                               np.asarray(pred1["TOS"]), rtol=1e-5, atol=1e-6)


def test_shard_global_batch_single_process_semantics():
    """Multi-host assembly path (parallel/distributed.py) on the 8-virtual-
    device CPU backend: with process_count()==1 the host-local batch IS the
    global batch; the result must be sharded over all 8 devices and
    numerically identical to a plain device_put."""
    from cardiax.parallel.distributed import (host_shard_bounds,
                                              shard_global_batch)
    mesh = get_mesh((8,))
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "ids": ["a"] * 8}
    out = shard_global_batch(batch, mesh)
    assert len(out["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert out["ids"] == batch["ids"]
    # the same array feeds a jitted psum-style reduction correctly
    total = jax.jit(lambda a: a.sum())(out["x"])
    assert float(total) == float(batch["x"].sum())
    assert host_shard_bounds(10) == (0, 10)


def test_shard_global_batch_misuse_error():
    from cardiax.parallel.distributed import shard_global_batch
    mesh = get_mesh((8,))
    with pytest.raises(ValueError, match="cannot tile the mesh 'data' axis"):
        shard_global_batch({"x": np.zeros((3, 2), np.float32)}, mesh)
