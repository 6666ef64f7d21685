"""Prefetching loader + multi-host helpers (single-process semantics)."""

import jax
import numpy as np
import pytest

from cardiax.data.datasets import build_datasets
from cardiax.data.loader import Batcher
from cardiax.data.prefetch import PrefetchBatcher
from cardiax.data.synthetic import make_dataset
from cardiax.parallel.distributed import (
    host_shard_bounds,
    initialize_distributed,
    shard_global_batch,
)
from cardiax.parallel.mesh import get_mesh


def _dataset():
    data = make_dataset(n_subjects=4, slices_per_subject=2, h=16, w=16,
                        n_frames=8, seed=17)
    for i, d in enumerate(data):
        d["slice_full_id"] = f"{d['subject_id']}-{i}"
        d["slice_idx"] = i
        d["augmented"] = False
    return build_datasets(
        {"train": {"type": "LMADataset", "data_split": ["train"],
                   "n_frames_to_use_for_regression": 8}},
        {"train": {"data": data}})["train"]


def test_prefetch_yields_sharded_device_batches():
    ds = _dataset()
    mesh = get_mesh((8,))
    loader = Batcher(ds, batch_size=8, shuffle=False)
    pf = PrefetchBatcher(loader, mesh, depth=2)
    assert len(pf) == len(loader)
    batches = list(pf)
    assert len(batches) == len(loader)
    b = batches[0]
    assert isinstance(b["strain_mat"], jax.Array)
    assert len(b["strain_mat"].sharding.device_set) == 8
    # content identical to the synchronous loader
    ref = next(iter(loader))
    np.testing.assert_allclose(np.asarray(b["strain_mat"]), ref["strain_mat"])


def test_prefetch_propagates_worker_errors():
    class Boom:
        def __len__(self):
            return 1

        def __iter__(self):
            raise RuntimeError("loader exploded")

    with pytest.raises(RuntimeError, match="loader exploded"):
        list(PrefetchBatcher(Boom(), get_mesh((1,))))


def test_distributed_helpers_single_process():
    assert initialize_distributed() is False    # no-op single process
    start, end = host_shard_bounds(10)
    assert (start, end) == (0, 10)
    mesh = get_mesh((8,))
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1), "meta": "m"}
    out = shard_global_batch(batch, mesh)
    assert isinstance(out["x"], jax.Array)
    assert len(out["x"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])
    assert out["meta"] == "m"
