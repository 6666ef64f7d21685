import numpy as np
import pytest

from cardiax.data import (
    align_n_frames_to,
    get_data_from_slice,
    load_data,
    split_vol_to_registration_pairs,
)
from cardiax.data.augmentation import (
    augment_all_data,
    rotate,
    rotate_by_sectors,
    rotate_sector_ladder,
    translate,
    translate_ladder,
)
from cardiax.data.datasets import build_datasets
from cardiax.data.loader import Batcher, SliceBatcher
from cardiax.data.split import SplitManager, split_data
from cardiax.data.synthetic import (
    add_displacement_fields,
    make_dataset,
    make_registration_pairs,
    save_npy,
)

H, W, T, NSEC = 32, 32, 12, 126


@pytest.fixture(scope="module")
def npy_path(tmp_path_factory):
    data = make_dataset(n_subjects=4, slices_per_subject=2, h=H, w=W, n_frames=T, seed=0)
    p = tmp_path_factory.mktemp("data") / "slices.npy"
    save_npy(str(p), data)
    return str(p)


def _data_config(npy_path, **kw):
    cfg = {
        "format": "npy",
        "npy_filename": npy_path,
        "n_read": -1,
        "data_to_feed": [{"key": "cine_lv_myo_masks"}, {"key": "strain_matrix"}, {"key": "TOS"}],
        "augment_translate_times_y": 0,
        "augment_translate_times_x": 0,
        "augment_rotate_times": 0,
        "augment_rotate_interval": 10,
    }
    cfg.update(kw)
    return cfg


def test_align_n_frames():
    x = np.arange(2 * 3 * 5).reshape(2, 3, 5).astype(np.float32)
    cropped = align_n_frames_to(x, 3, -1)
    assert cropped.shape == (2, 3, 3)
    padded = align_n_frames_to(x, 8, -1)
    assert padded.shape == (2, 3, 8)
    # edge padding repeats the last frame
    np.testing.assert_array_equal(padded[..., 5], x[..., 4])


def test_load_data_returns_slices(npy_path):
    data = load_data(_data_config(npy_path))
    assert len(data) == 8  # the reference's empty-return bug is fixed
    d = data[0]
    assert d["cine_lv_myo_masks"].shape == (H, W, T)
    assert d["strain_matrix"].shape == (NSEC, T)
    assert d["TOS"].shape == (NSEC,)
    assert d["slice_full_id"].startswith(d["subject_id"])
    assert d["augmented"] is False


def test_load_data_n_read(npy_path):
    assert len(load_data(_data_config(npy_path, n_read=3))) == 3


def test_get_data_from_slice_nested_structs():
    datum = {
        "TOSAnalysis": {"TOSfullRes_Jerry": np.arange(NSEC, dtype=np.float32)},
        "StrainInfo": {"CCmid": np.zeros((NSEC, T), np.float32)},
    }
    out = get_data_from_slice(datum, [{"key": "TOS"}, {"key": "strain_matrix"},
                                      {"key": "LMA_sector_labels", "LMA_threshold": 25}])
    assert out["TOS"].shape == (NSEC,)
    assert out["strain_matrix"].shape == (NSEC, T)
    assert out["LMA_sector_labels"].sum() == NSEC - 26  # values 26..125 exceed 25


def test_augmentation_rotation_rolls_sectors():
    data = make_dataset(n_subjects=1, slices_per_subject=1, h=H, w=W, n_frames=T, seed=1)
    d = data[0]
    n_roll = 3
    ang = 360.0 / NSEC * n_roll
    rot = rotate(d, ang, NSEC)
    np.testing.assert_allclose(rot["strain_matrix"], np.roll(d["strain_matrix"], n_roll, axis=0))
    np.testing.assert_allclose(rot["TOS"], np.roll(d["TOS"], n_roll, axis=0))
    assert rot["cine_lv_myo_masks"].shape == d["cine_lv_myo_masks"].shape
    # mask mass approximately preserved under rotation
    assert abs(rot["cine_lv_myo_masks"].sum() - d["cine_lv_myo_masks"].sum()) \
        < 0.1 * d["cine_lv_myo_masks"].sum()


def test_augmentation_translate_rolls_pixels():
    data = make_dataset(n_subjects=1, slices_per_subject=1, h=H, w=W, n_frames=T, seed=2)
    d = data[0]
    tr = translate(d, 2, -3)
    np.testing.assert_array_equal(tr["cine_lv_myo_masks"],
                                  np.roll(d["cine_lv_myo_masks"], (2, -3), axis=(0, 1)))
    np.testing.assert_array_equal(tr["strain_matrix"], d["strain_matrix"])


def test_translate_ladder_reference_parity():
    """Golden values of the reference's asymmetric shift ladder
    (modules/data/augmentation/__init__.py:29-54)."""
    assert translate_ladder(0) == [0]
    assert translate_ladder(1) == [5]
    assert translate_ladder(2) == [5, -5]
    assert translate_ladder(3) == [3, 6, -3]
    assert translate_ladder(4) == [3, 6, -3, -6]
    assert translate_ladder(5) == [2, 5, 7, -2, -5]


def test_rotate_sector_ladder_reference_parity():
    """Golden values incl. the interval == -1 branch
    (modules/data/augmentation/__init__.py:55-59)."""
    assert rotate_sector_ladder(2, 10) == [10, 20]
    assert rotate_sector_ladder(3, 5) == [5, 10, 15]
    assert rotate_sector_ladder(1, -1) == [63]          # linspace(1,126,3)[1:-1]
    assert rotate_sector_ladder(3, -1) == [32, 63, 94]  # linspace(1,126,5)[1:-1]
    # arange(1, 20) caps the ladder at 19 rungs regardless of times
    assert rotate_sector_ladder(25, 10) == [10 * k for k in range(1, 20)]
    assert rotate_sector_ladder(0, 10) == []


def test_rotate_by_sectors_reference_pairing():
    """Image rotates by -n*360/126 deg while strain/TOS roll by +n sectors
    (reference affine.py:56, 74-81)."""
    data = make_dataset(n_subjects=1, slices_per_subject=1, h=H, w=W,
                        n_frames=T, seed=5)
    d = data[0]
    n = 4
    rot = rotate_by_sectors(d, n, NSEC)
    np.testing.assert_allclose(rot["strain_matrix"],
                               np.roll(d["strain_matrix"], n, axis=0))
    np.testing.assert_allclose(rot["TOS"], np.roll(d["TOS"], n, axis=0))
    # the image really rotated (mass preserved, content moved)
    assert abs(rot["cine_lv_myo_masks"].sum() - d["cine_lv_myo_masks"].sum()) \
        < 0.1 * d["cine_lv_myo_masks"].sum()


def test_augment_grid_is_full_product():
    """ty=2, tx=1, rotate 2x10 -> [5,-5] x [5] x [10,20] = 4 variants."""
    data = make_dataset(n_subjects=1, slices_per_subject=1, h=H, w=W,
                        n_frames=T, seed=6)
    aug = augment_all_data(data, {"augment_translate_times_y": 2,
                                  "augment_translate_times_x": 1,
                                  "augment_rotate_times": 2,
                                  "augment_rotate_interval": 10})
    assert len(aug) == 4
    assert all(a["augmented"] for a in aug)


def test_augment_translate_only_still_produces_data():
    """Conscious deviation from the reference, whose empty rotation loop
    silently drops translate-only augmentation entirely."""
    data = make_dataset(n_subjects=1, slices_per_subject=1, h=H, w=W,
                        n_frames=T, seed=7)
    aug = augment_all_data(data, {"augment_translate_times_y": 2})
    assert len(aug) == 2   # shifts [5, -5]
    np.testing.assert_array_equal(
        aug[0]["cine_lv_myo_masks"],
        np.roll(data[0]["cine_lv_myo_masks"], (5, 0), axis=(0, 1)))


def test_augment_all_data_counts():
    data = make_dataset(n_subjects=1, slices_per_subject=1, h=H, w=W, n_frames=T, seed=3)
    aug = augment_all_data(data, {"augment_rotate_times": 2, "augment_rotate_interval": 5})
    assert len(aug) == 2
    assert all(a["augmented"] for a in aug)


def test_split_by_pattern(npy_path):
    data = load_data(_data_config(npy_path))
    splits = split_data(data, {
        "method": "by_pattern",
        "splits": {
            "train": {"patterns": [".*"], "exclude_patterns": [".*CT00.*", ".*CT01.*"]},
            "val": {"patterns": [".*CT00.*"]},
            "test": {"patterns": [".*CT01.*"]},
        },
    })
    assert len(splits["train"]["data"]) == 4
    assert len(splits["val"]["data"]) == 2
    assert len(splits["test"]["data"]) == 2
    names = {d["subject_id"] for d in splits["train"]["data"]}
    assert not any("CT00" in n or "CT01" in n for n in names)


def test_split_by_ratio(npy_path):
    data = load_data(_data_config(npy_path))
    splits = split_data(data, {
        "method": "by_ratio", "shuffle": True, "seed": 0,
        "splits": {"train": {"ratio": 0.5}, "val": {"ratio": 0.25}, "test": {"ratio": "rest"}},
    })
    assert len(splits["train"]["data"]) == 4
    assert len(splits["val"]["data"]) == 2
    assert len(splits["test"]["data"]) == 2


def test_keep_augmented_filter(npy_path):
    data = load_data(_data_config(npy_path, augment_rotate_times=1))
    assert len(data) == 16
    splits = split_data(data, {
        "method": "by_pattern",
        "splits": {"train": {"patterns": [".*"], "keep_augmented": True},
                   "val": {"patterns": [".*"], "keep_augmented": False}},
    })
    assert len(splits["train"]["data"]) == 16
    assert len(splits["val"]["data"]) == 8


def test_split_manager_kfold(npy_path):
    data = load_data(_data_config(npy_path))
    folds = [[".*CT00.*"], [".*CT01.*"], [".*CT02.*"], [".*CT03.*"]]
    sm = SplitManager(folds)
    assert len(sm) == 4
    cfg0 = sm[0]
    splits = split_data(data, cfg0)
    test_subj = {d["subject_id"] for d in splits["test"]["data"]}
    val_subj = {d["subject_id"] for d in splits["val"]["data"]}
    train_subj = {d["subject_id"] for d in splits["train"]["data"]}
    assert test_subj == {"SET00-CT00"}
    assert val_subj == {"SET01-CT01"}
    assert not (train_subj & (test_subj | val_subj))
    assert cfg0["metric_prefix"] == "fold0/"


def test_split_vol_to_registration_pairs():
    vol = np.random.default_rng(0).normal(size=(2, 1, 5, 8, 8)).astype(np.float32)
    src, tar = split_vol_to_registration_pairs(vol, "Lagrangian", output_dim=3)
    assert src.shape == tar.shape == (2, 1, 4, 8, 8)
    np.testing.assert_array_equal(src[:, :, 2], vol[:, :, 0])
    np.testing.assert_array_equal(tar[:, :, 2], vol[:, :, 3])
    src_e, tar_e = split_vol_to_registration_pairs(vol, "Eulerian", output_dim=2)
    assert src_e.shape == (8, 1, 8, 8)
    np.testing.assert_array_equal(src_e[1], vol[0, :, 1])


def test_joint_dataset_shapes(npy_path):
    data = load_data(_data_config(npy_path))
    splits = split_data(data, {"method": "by_pattern",
                               "splits": {"train": {"patterns": [".*"]}}})
    datasets = build_datasets({
        "train": {"type": "JointDataset", "data_split": ["train"],
                  "cine_myo_mask_key": "cine_lv_myo_masks",
                  "n_myo_frames_to_use_for_regression": 10,
                  "n_strainmat_frames_to_use_for_regression": 20},
    }, splits)
    ds = datasets["train"]
    assert len(ds) == 8
    item = ds[0]
    assert item["cine_myo_mask"].shape == (1, 10, H, W)
    assert item["strain_matrix"].shape == (1, NSEC, 20)
    assert item["TOS"].shape == (NSEC,)
    assert item["cine_myo_mask"].dtype == np.float32
    assert ds.get_n_slices() == 8
    assert len(ds.get_slice(0)) == 1


def test_registration_dataset_and_slice_batcher():
    data = make_dataset(n_subjects=2, slices_per_subject=1, h=H, w=W, n_frames=6, seed=4)
    data = add_displacement_fields(data)
    pairs = make_registration_pairs(data)
    splits = {"train": {"data": pairs}}
    datasets = build_datasets({
        "train": {"type": "BasicRegistrationDataset", "data_split": ["train"],
                  "feed_masks": True}}, splits)
    ds = datasets["train"]
    item = ds[0]
    assert item["source_img"].shape == (1, H, W)
    assert item["displacement_field_X"].shape == (1, H, W)
    assert ds.get_n_slices() == 2

    sb = SliceBatcher(ds, slices_per_batch=2, max_pairs_per_slice=5)
    batch = next(iter(sb))
    assert batch["source_img"].shape == (2, 5, 1, H, W)
    assert batch["pair_mask"].shape == (2, 5)
    assert batch["pair_mask"].sum() == 10  # 5 real pairs per slice


def test_batcher_pads_final_batch(npy_path):
    data = load_data(_data_config(npy_path))
    splits = split_data(data, {"method": "by_pattern",
                               "splits": {"train": {"patterns": [".*"]}}})
    datasets = build_datasets({
        "train": {"type": "JointDataset", "data_split": ["train"],
                  "n_myo_frames_to_use_for_regression": 10,
                  "n_strainmat_frames_to_use_for_regression": 20}}, splits)
    batches = list(Batcher(datasets["train"], batch_size=3, shuffle=True, seed=0))
    assert len(batches) == 3
    for b in batches:
        assert b["cine_myo_mask"].shape == (3, 1, 10, H, W)  # static shape incl. final
    assert batches[-1]["sample_mask"].tolist() == [1.0, 1.0, 0.0]
