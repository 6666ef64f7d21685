"""Visualization layer tests: STL I/O, activation-map assembly, figure export."""

import numpy as np
import pytest

from cardiax.plot.activation_map import (
    align_vertices_with_mesh,
    build_3D_activation_map_multiple,
    build_3D_activation_map_single,
    generate_3D_activation_map,
    plot_3D_activation_map,
    save_colored_obj,
    stl_read,
    stl_write,
)
from cardiax.plot.colors import map_values_to_rgb
from cardiax.plot.strainmat import (
    visualize_pred_registration,
    visualize_strainmat_with_TOS,
)


def _ellipsoid_mesh(n_theta=16, n_z=8, rx=20.0, ry=20.0, rz=30.0):
    """Crude closed ellipsoid triangulation as a stand-in heart STL."""
    tris = []
    zs = np.linspace(-rz, rz, n_z)
    for zi in range(n_z - 1):
        r0 = np.sqrt(max(1e-6, 1 - (zs[zi] / rz) ** 2))
        r1 = np.sqrt(max(1e-6, 1 - (zs[zi + 1] / rz) ** 2))
        for ti in range(n_theta):
            t0 = 2 * np.pi * ti / n_theta
            t1 = 2 * np.pi * (ti + 1) / n_theta
            p00 = [rx * r0 * np.cos(t0), ry * r0 * np.sin(t0), zs[zi]]
            p01 = [rx * r0 * np.cos(t1), ry * r0 * np.sin(t1), zs[zi]]
            p10 = [rx * r1 * np.cos(t0), ry * r1 * np.sin(t0), zs[zi + 1]]
            p11 = [rx * r1 * np.cos(t1), ry * r1 * np.sin(t1), zs[zi + 1]]
            tris.append([p00, p01, p10])
            tris.append([p01, p11, p10])
    return np.asarray(tris, np.float32)


def test_stl_roundtrip(tmp_path):
    tri = _ellipsoid_mesh(8, 4)
    p = tmp_path / "mesh.stl"
    stl_write(p, tri)
    back = stl_read(p)
    np.testing.assert_allclose(back, tri, atol=1e-5)


def test_map_values_to_rgb_range():
    rgb = map_values_to_rgb(np.array([17.0, 50.0, 100.0]), vmin=17, vmax=100)
    assert rgb.shape == (3, 3)
    assert (rgb >= 0).all() and (rgb <= 1).all()
    # low TOS -> green-ish, high TOS -> red-ish
    assert rgb[0, 1] > rgb[0, 0]
    assert rgb[2, 0] > rgb[2, 1]


def test_align_vertices_inside_mesh():
    mesh = _ellipsoid_mesh()
    pts = np.random.default_rng(0).normal(size=(50, 3)) * 100  # way outside
    aligned = align_vertices_with_mesh(pts, mesh.reshape(-1, 3))
    mesh_xy = mesh.reshape(-1, 3)[:, :2]
    assert np.abs(aligned[:, :2]).max() <= np.abs(mesh_xy).max() + 1e-6
    assert aligned[:, 2].min() >= mesh.reshape(-1, 3)[:, 2].min() - 1e-6


def test_build_and_plot_activation_map(tmp_path):
    mesh = _ellipsoid_mesh()
    n_sec = 126
    th = np.linspace(-np.pi, np.pi, n_sec, endpoint=False)
    ring = np.column_stack([8 * np.cos(th), 8 * np.sin(th)])
    slice_points = [ring, ring * 0.9, ring * 0.8]
    slice_tos = [np.full(n_sec, 20.0), np.full(n_sec, 40.0), np.full(n_sec, 80.0)]
    locs = [0.0, 8.0, 16.0]
    fd = build_3D_activation_map_single(slice_points, slice_tos, locs, mesh)
    assert fd["face_colors"].shape == (mesh.shape[0], 3)
    assert np.isfinite(fd["face_colors"]).all()
    paths = plot_3D_activation_map(fd, tmp_path, "test")
    assert len(paths) == 3
    import os
    assert all(os.path.getsize(p) > 1000 for p in paths)

    obj = tmp_path / "heart.obj"
    verts = np.unique(mesh.reshape(-1, 3), axis=0)
    # trivial faces over first triangles for export smoke test
    faces = np.arange(9).reshape(3, 3)
    save_colored_obj(obj, verts, faces, fd["face_colors"][:3])
    assert obj.exists() and obj.with_suffix(".mtl").exists()


def test_build_multiple_groups_by_subject():
    mesh = _ellipsoid_mesh()
    preds = []
    for sid in ("A", "A", "B"):
        preds.append({"subject_id": sid, "augmented": False,
                      "TOS_pred": np.random.default_rng(0).uniform(17, 60, 126)})
    preds.append({"subject_id": "A", "augmented": True,
                  "TOS_pred": np.zeros(126)})  # filtered out
    maps = build_3D_activation_map_multiple(preds, mesh)
    assert set(maps) == {"A", "B"}


def test_generate_interp_map():
    out = generate_3D_activation_map(
        [np.full(126, 20.0), np.full(126, 60.0)], [0.0, 10.0], n_z=10)
    assert out["tos"].shape == (10, 126)
    assert out["tos"].min() >= 17.0
    assert np.isclose(out["tos"][0].mean(), 20.0)
    assert np.isclose(out["tos"][-1].mean(), 60.0)


def test_strainmat_figure(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    sm = np.random.default_rng(0).normal(size=(126, 40)) * 0.1
    tos = np.random.default_rng(1).uniform(17, 60, 126)
    fig, _ = visualize_strainmat_with_TOS(sm, tos_gt=tos, tos_pred=tos + 5)
    p = tmp_path / "sm.png"
    fig.savefig(p)
    assert p.stat().st_size > 1000

    src = np.random.default_rng(2).random((4, 1, 16, 16))
    fig2 = visualize_pred_registration(src, src, src, n_cols=4)
    p2 = tmp_path / "reg.png"
    fig2.savefig(p2)
    assert p2.stat().st_size > 1000


def _fake_patient_slices(n_slices=4, n_sectors=126, tos_base=20.0):
    """Patient slice stack with spl2patchSA meshes + synthetic TOS rows."""
    from cardiax.utils.dense import spl2patchSA
    th = np.linspace(-np.pi, np.pi, 40, endpoint=False)
    data = []
    for i in range(n_slices):
        r_out, r_in = 12.0 - i, 6.0 - 0.5 * i
        epi = np.column_stack([r_out * np.cos(th) + 64, r_out * np.sin(th) + 64])
        endo = np.column_stack([r_in * np.cos(th) + 64, r_in * np.sin(th) + 64])
        fv = spl2patchSA({
            "ROIInfo": {"RestingContour": [epi, endo]},
            "AnalysisInfo": {"PositionA": np.array([64.0, 64.0]),
                             "PositionB": np.array([64.0, 50.0]),
                             "Clockwise": True},
        })
        tos = tos_base + 5.0 * np.cos(np.linspace(0, 2 * np.pi, n_sectors))
        data.append({"AnalysisFv": fv, "TOSInterploated": tos[None],
                     "SequenceInfo": float(10 * i)})
    return data


def test_tos_3d_plot_interp():
    from cardiax.plot.tos_surface import tos_3d_plot_interp
    data = _fake_patient_slices()
    out = tos_3d_plot_interp(data, n_interp=25, title="patient")
    assert out["x"].shape == (25, 126) and out["tos"].shape == (25, 126)
    assert out["has_tos"]
    # nearest-TOS interpolation only re-uses existing rows
    for row in out["tos"]:
        assert any(np.allclose(row, d["TOSInterploated"][0]) for d in data)
    # align_centers pins every interpolated ring on the patient centroid
    assert np.ptp(out["x"].mean(axis=1)) < 1e-6
    # z ordering survives shuffled slice input
    shuffled = [data[2], data[0], data[3], data[1]]
    out2 = tos_3d_plot_interp(shuffled, n_interp=25)
    np.testing.assert_allclose(out2["z"], out["z"])
    import matplotlib.pyplot as plt
    plt.close("all")


def test_tos_3d_plot_no_tos_colors_by_z():
    from cardiax.plot.tos_surface import tos_3d_plot_interp
    data = _fake_patient_slices(n_slices=2)
    for d in data:
        d.pop("TOSInterploated")
    out = tos_3d_plot_interp(data, n_interp=10)
    assert not out["has_tos"]
    import matplotlib.pyplot as plt
    plt.close("all")


def test_text3d_adds_patch():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from cardiax.plot.tos_surface import text3d
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    before = len(ax.patches)
    text3d(ax, (1.0, 2.0, 3.0), "S1", size=1.0)
    assert len(ax.patches) == before + 1
    plt.close(fig)
