"""Tests for the DENSE geometry utilities (sector mesh, intersections)."""

import numpy as np

from cardiax.utils.dense import (
    N_SECTORS,
    cart2pol,
    face_centers,
    getStrainMatFull,
    intersections,
    pol2cart,
    rectfv2rectfv,
    spl2patchSA,
)


def _circle(cx, cy, r, n=100):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])


def _datamat(cx=0.0, cy=0.0, r_epi=10.0, r_endo=6.0):
    return {
        "ROIInfo": {"RestingContour": [_circle(cx, cy, r_epi), _circle(cx, cy, r_endo)]},
        "AnalysisInfo": {"PositionA": np.array([cx, cy]),
                         "PositionB": np.array([cx + r_epi, cy]),
                         "Clockwise": True},
    }


def test_polar_roundtrip():
    th, r = cart2pol(3.0, 4.0)
    x, y = pol2cart(th, r)
    assert np.isclose(x, 3.0) and np.isclose(y, 4.0)


def test_intersections_cross():
    x, y = intersections([0, 2], [0, 2], [0, 2], [2, 0])
    assert len(x) == 1
    assert np.isclose(x[0], 1.0) and np.isclose(y[0], 1.0)


def test_intersections_with_nan_breaks():
    # two disjoint vertical lines crossing one horizontal line
    x1 = [0.5, 0.5, np.nan, 1.5, 1.5]
    y1 = [-1, 1, np.nan, -1, 1]
    x, y = intersections(x1, y1, [0, 2], [0, 0])
    assert len(x) == 2
    np.testing.assert_allclose(sorted(x), [0.5, 1.5])


def test_spl2patchSA_mesh_structure():
    fv = spl2patchSA(_datamat())
    assert fv["vertices"].shape == (N_SECTORS * 6, 2)
    assert fv["faces"].shape == (N_SECTORS * 5, 4)
    assert fv["sectorid"].min() == 1 and fv["sectorid"].max() == 18
    assert fv["layerid"].min() == 1 and fv["layerid"].max() == 5
    assert np.sum(fv["layerid"] == 3) == N_SECTORS
    # all face centers must lie within the annulus
    centers = face_centers(fv)
    r = np.hypot(centers[:, 0], centers[:, 1])
    assert (r > 5.9).all() and (r < 10.1).all()
    # mid-layer radius near the annulus middle
    mid_r = r[fv["layerid"] == 3]
    np.testing.assert_allclose(mid_r.mean(), 8.0, atol=0.3)


def test_rectfv2rectfv_constant_field():
    fv1 = spl2patchSA(_datamat())
    fv2 = spl2patchSA(_datamat(r_epi=9.5, r_endo=6.5))
    vals = np.full(fv1["faces"].shape[0], 3.3)
    out = rectfv2rectfv(fv1, vals, fv2)
    np.testing.assert_allclose(out, 3.3, atol=1e-6)


def test_getStrainMatFull_radial_gradient():
    dm = _datamat()
    fv_src = spl2patchSA(dm)
    centers = face_centers(fv_src)
    t = 4
    # per-face value = radius, constant over frames -> mid layer ~ 8.0
    dm["StrainInfo"] = {
        "Faces": fv_src["faces"], "Vertices": fv_src["vertices"],
        "CC": np.repeat(np.hypot(centers[:, 0], centers[:, 1])[:, None], t, axis=1),
    }
    out = getStrainMatFull(dm, fv=spl2patchSA(dm))
    assert out.shape == (N_SECTORS, t)
    np.testing.assert_allclose(out.mean(), 8.0, atol=0.3)
