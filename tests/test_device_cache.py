"""DeviceBatcher (device-resident dataset cache) equivalence with the host
Batcher: identical shuffle stream, identical final-batch padding and masks,
and an identical training trajectory when the engine swaps it in
(training.device_data_cache). Motivation in STATUS.md round 3: per-step
host->device batch transfer dominates real wall time on tunneled platforms."""

import copy
import json

import numpy as np
import pytest

from cardiax.data.loader import Batcher, DeviceBatcher


class _ToyDataset:
    def __init__(self, n=13, h=8):
        rng = np.random.default_rng(3)
        self.items = [{"x": rng.normal(size=(h, h)).astype(np.float32),
                       "y": rng.normal(size=(4,)).astype(np.float32),
                       "slice_full_id": f"s{i}"} for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return dict(self.items[i])


@pytest.mark.parametrize("shuffle", [False, True])
def test_device_batcher_matches_batcher(shuffle):
    ds = _ToyDataset(n=13)
    host = Batcher(ds, 5, shuffle=shuffle, seed=11)
    dev = DeviceBatcher(ds, 5, shuffle=shuffle, seed=11)
    for epoch in range(3):   # streams must stay aligned across epochs
        hbs, dbs = list(host), list(dev)
        assert len(hbs) == len(dbs) == 3
        for hb, db in zip(hbs, dbs):
            np.testing.assert_array_equal(np.asarray(db["x"]), hb["x"])
            np.testing.assert_array_equal(np.asarray(db["y"]), hb["y"])
            np.testing.assert_array_equal(np.asarray(db["sample_mask"]),
                                          hb["sample_mask"])
            assert db["slice_full_id"] == hb["slice_full_id"]


def test_device_batcher_epoch_handover_continues_stream():
    ds = _ToyDataset(n=10)
    host = Batcher(ds, 4, shuffle=True, seed=7)
    _ = list(host)                       # consume epoch 0 on the host
    ref = Batcher(ds, 4, shuffle=True, seed=7)
    _ = list(ref)
    # handover = same seed + the host's epoch counter (engine's swap rule)
    dev = DeviceBatcher(ds, 4, shuffle=True, seed=host.seed,
                        epoch=host._epoch)
    for hb, db in zip(ref, dev):         # epoch 1 must match
        np.testing.assert_array_equal(np.asarray(db["x"]), hb["x"])


def test_epoch_indexed_shuffle_resumes_mid_stream():
    """set_epoch(k) replays exactly the uninterrupted run's epoch-k order —
    the property exact resume needs (VERDICT r3 #3)."""
    ds = _ToyDataset(n=11)
    full = Batcher(ds, 4, shuffle=True, seed=5)
    epochs = [list(full) for _ in range(4)]
    resumed = Batcher(ds, 4, shuffle=True, seed=5)
    resumed.set_epoch(2)
    for want, got in zip(epochs[2], list(resumed)):
        np.testing.assert_array_equal(got["x"], want["x"])
    for want, got in zip(epochs[3], list(resumed)):  # stream continues
        np.testing.assert_array_equal(got["x"], want["x"])
    # different epochs shuffle differently (it's still a real shuffle)
    assert not all(np.array_equal(a["x"], b["x"])
                   for a, b in zip(epochs[0], epochs[1]))


def test_device_batcher_sharded_on_mesh():
    import jax
    from cardiax.parallel.mesh import get_mesh
    mesh = get_mesh()
    ds = _ToyDataset(n=16)
    dev = DeviceBatcher(ds, 8, shuffle=False, mesh=mesh)  # 8 % n_dev == 0
    b = next(iter(dev))
    assert isinstance(b["x"], jax.Array)
    assert b["x"].shape == (8, 8, 8)
    assert float(np.asarray(b["sample_mask"]).sum()) == 8.0
    assert dev.nbytes() > 0


def test_engine_training_identical_with_and_without_cache(tmp_path):
    """The full joint scheme trains to bit-identical metrics with the cache
    forced on vs off (same seed): the swap is exactly transparent."""
    from cardiax.data.synthetic import make_dataset, save_npy
    from cardiax.main import run

    save_npy(str(tmp_path / "s.npy"),
             make_dataset(n_subjects=3, slices_per_subject=2, h=32, w=32,
                          n_frames=10, seed=5))
    cfg = json.load(open("configs/joint.json"))
    cfg["data"]["npy_filename"] = str(tmp_path / "s.npy")
    cfg["training"]["epochs"] = 2
    cfg["training"]["batch_size"] = 4
    # isolate the CACHE swap: with epoch_fuse 'auto' (the shipping default)
    # only the cache-on arm would fuse, adding reorder drift that is the
    # fuse's, not the cache's (pinned separately in tests/test_epoch_fuse.py)
    cfg["training"]["epoch_fuse"] = False
    cfg["saving"] = {"save_final_model": False, "save_checkpoint": False,
                     "save_prediction": False,
                     "saving_dir": str(tmp_path / "out")}
    cfg["others"] = {"use_wandb": False}

    results = {}
    for mode in ("false", "true"):
        c = copy.deepcopy(cfg)
        c["training"]["device_data_cache"] = mode
        c["saving"]["saving_dir"] = str(tmp_path / f"out_{mode}")
        results[mode] = run(c)
    # compare the tracked per-epoch metrics written to metrics.jsonl
    logs = {}
    for mode in ("false", "true"):
        lines = [json.loads(l) for l in
                 open(tmp_path / f"out_{mode}" / "metrics.jsonl")]
        logs[mode] = [l for l in lines if any("train/" in k for k in l)]
    assert len(logs["false"]) == len(logs["true"]) >= 2
    for a, b in zip(logs["false"], logs["true"]):
        assert set(a) == set(b)
        for k in a:
            if isinstance(a[k], float):
                assert a[k] == pytest.approx(b[k], rel=1e-6, abs=1e-7), k
