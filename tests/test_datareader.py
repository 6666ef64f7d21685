"""Tests for the clinical DataReader ingest subsystem (SURVEY.md 2.7 parity)."""

import numpy as np
import pytest

from cardiax.data.datareader import (
    DENSEDataReader,
    append_additional_data_from_npy,
    load_DENSE_slices_from_npy_file,
    load_cine_pairs_from_npy_file,
    try_merge_displacements,
)

H = W = 20
T = 6
NSEC = 126


def _clinical_slice(pid="PAT01", cine_idx=0, t=T, with_interp=False):
    rng = np.random.default_rng(hash(pid) % 2**31)
    masks = (rng.random((H, W, t)) > 0.6).astype(np.float32)
    masks[:, :, :] += 0.1  # never empty
    disp = rng.normal(size=(2, H, W, t)).astype(np.float32)
    disp[0, 0, 0, 0] = np.nan  # reader must scrub NaNs
    d = {
        "patient_id": pid,
        "cine_slice_idx": cine_idx,
        "cine_slice_location": float(cine_idx * 8.0),
        "DENSE_slice_mat_filename": f"/x/{pid}.mat",
        "DENSE_slice_location": float(cine_idx * 8.0),
        "cine_lv_myo_masks_merged": masks,
        "DENSE_displacement_field_merged": disp,
        "TOSAnalysis": {"TOSfullRes_Jerry": rng.uniform(10, 60, NSEC)},
        "StrainInfo": {"CCmid": rng.normal(size=(NSEC, t)).astype(np.float32) * 0.1,
                       "CCmidSVD": rng.normal(size=(NSEC, t)).astype(np.float32) * 0.05},
    }
    if with_interp:
        ind = np.zeros(t)
        ind[1::2] = 1  # every other frame interpolated
        d["cine_lv_myo_masks_merged_is_interpolated_labels"] = ind
    return d


def _save(tmp_path, data, name="clin.npy"):
    p = tmp_path / name
    np.save(p, np.array(data, dtype=object), allow_pickle=True)
    return str(p)


def test_dense_slices_loading(tmp_path):
    p = _save(tmp_path, [_clinical_slice("PAT01"), _clinical_slice("PAT02", 1)])
    out = load_DENSE_slices_from_npy_file(p, {"loading": {"use_interpolated_data": True}})
    assert len(out) == 2
    d = out[0]
    assert d["subject_id"] == "PAT01"
    assert d["strain_matrix"].shape == (NSEC, 50)      # zero-padded to 50
    assert np.all(d["strain_matrix"][:, T:] == 0)
    assert not np.isnan(d["DENSE_displacement_field_X"]).any()
    # CCmidSVD preferred over CCmid
    assert np.allclose(d["strain_matrix"][:, :T],
                       np.load(p, allow_pickle=True).tolist()[0]["StrainInfo"]["CCmidSVD"])
    assert d["sector_LMA_labels"].sum() == (d["TOS"] > 25).sum()


def test_dense_slices_interp_frame_removal(tmp_path):
    p = _save(tmp_path, [_clinical_slice("PAT03", with_interp=True)])
    out = load_DENSE_slices_from_npy_file(
        p, {"loading": {"use_interpolated_data": False,
                        "cine_DENSE_must_same_n_frame": False}})
    d = out[0]
    # 3 of 6 frames kept (even indices)
    assert d["DENSE_displacement_field_X"].shape[-1] == 3


def test_cine_pairs_wraparound_and_masks(tmp_path):
    p = _save(tmp_path, [_clinical_slice("PAT04")])
    out = load_cine_pairs_from_npy_file(
        p, {"loading": {"use_interpolated_data": True, "feed_masks": True,
                        "interpolated_cine_mask_dilation": 3}})
    assert len(out) == T   # one pair per frame incl. wraparound
    last = out[-1]
    assert last["source_time_idx"] == T - 1 and last["target_time_idx"] == 0
    assert last["source_mask"].sum() >= last["source_image"].astype(bool).sum() * 0.9
    assert last["strain_matrix"].shape == (NSEC, 50)


def test_merge_displacements():
    d = {"DENSE_displacement_field_X": np.ones((4, 4)),
         "DENSE_displacement_field_Y": np.zeros((4, 4)),
         "other": 1}
    out = try_merge_displacements(d)
    assert "DENSE_displacement_field" in out
    assert out["DENSE_displacement_field"].shape == (2, 4, 4)
    assert "DENSE_displacement_field_X" not in out


def test_append_additional_data(tmp_path):
    slices = [_clinical_slice("PAT05")]
    extra = [{"patient_id": "PAT05", "cine_slice_idx": 0,
              "cine_slice_location": 0.0, "registration_output": np.ones(3)}]
    p = _save(tmp_path, extra, "extra.npy")
    out = append_additional_data_from_npy(slices, p)
    assert "registration_output" in out[0]


def test_reader_dispatch_and_resize(tmp_path):
    p = _save(tmp_path, [_clinical_slice("PAT06")])
    reader = DENSEDataReader()
    out = reader.load_record_from_npy(
        p, {"loading": {"loading_method": "DENSE_slices",
                        "use_interpolated_data": True,
                        "resize": True, "resize_size": 32}})
    assert out[0]["LV_masks"].shape[:2] == (32, 32)
    with pytest.raises(KeyError):
        reader.load_record_from_npy(p, {"loading": {"loading_method": "nope"}})


def test_preprocessing_chain_crop_resize_maskout(tmp_path):
    """maskout -> crop_to_myocardium -> resize preprocessing (reference
    config.py:93-118 inserts), driven purely by data-config keys."""
    data = [_clinical_slice("PAT07")]
    p = _save(tmp_path, data, "prep.npy")
    cfg = {"loading": {"loading_method": "DENSE_slices",
                       "crop_to_myocardium_size": [12, 14],
                       "resize": True, "resize_size": [16, 16]}}
    out = DENSEDataReader().load_record_from_npy(p, cfg)
    assert out, "reader returned no slices"
    # crop happened before resize: final shape is the resize target
    assert out[0]["LV_masks"].shape[:2] == (16, 16)
    assert out[0]["DENSE_displacement_field_X"].shape[:2] == (16, 16)


def test_resize_accepts_rectangular_size(tmp_path):
    data = [_clinical_slice("PAT08")]
    p = _save(tmp_path, data, "rect.npy")
    cfg = {"loading": {"loading_method": "DENSE_slices",
                       "resize": True, "resize_size": [24, 16]}}
    out = DENSEDataReader().load_record_from_npy(p, cfg)
    assert out[0]["LV_masks"].shape[:2] == (24, 16)


def test_maskout_zeroes_image_background(tmp_path):
    from cardiax.data.datareader import _mask_out_images
    mask = np.zeros((8, 8), np.float32)
    mask[2:5, 2:5] = 1.0
    img = np.ones((8, 8), np.float32)
    data = [{"source_mask": mask, "source_image": img.copy(),
             "target_image": img.copy()}]
    out = _mask_out_images(data)
    assert out[0]["source_image"].sum() == 9
    assert out[0]["source_mask"].sum() == 9  # the mask itself untouched


def test_interpolated_alignment_mismatch_warns_and_skips(tmp_path, capsys):
    """DENSE/cine shape-alignment check (reference DENSE_cine_IO.py:114-120)."""
    d = _clinical_slice("PAT09")
    d["DENSE_displacement_field_merged"] = \
        d["DENSE_displacement_field_merged"][:, :, :, :T - 1]  # misaligned
    p = _save(tmp_path, [d], "misalign.npy")
    pairs = load_cine_pairs_from_npy_file(
        p, {"loading": {"use_interpolated_data": True}})
    assert pairs == []
    assert "does not match" in capsys.readouterr().out


def test_rectangular_resize_scales_displacements_per_axis(tmp_path):
    """X (column) displacements scale by the column zoom, Y by the row zoom."""
    from cardiax.data.datareader import _resize_slice_images
    h, w = 32, 32
    data = [{"LV_masks": np.ones((h, w), np.float32),
             "DENSE_displacement_field_X": np.full((h, w), 4.0, np.float32),
             "DENSE_displacement_field_Y": np.full((h, w), 4.0, np.float32)}]
    out = _resize_slice_images(data, (24, 16))        # row zoom .75, col zoom .5
    # interior only: ndimage.zoom zero-extrapolates the trailing edge
    np.testing.assert_allclose(
        out[0]["DENSE_displacement_field_X"][1:-1, 1:-1], 2.0, rtol=1e-5)
    np.testing.assert_allclose(
        out[0]["DENSE_displacement_field_Y"][1:-1, 1:-1], 3.0, rtol=1e-5)
