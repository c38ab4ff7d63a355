"""IO tests: PLY/OBJ round trips (native + fallback), calibration JSON,
stage checkpoints + BA resume (SURVEY.md section 7 checkpoint/resume)."""

import numpy as np
import pytest

from slr.io import (
    write_ply, read_ply, write_obj, save_calibration, load_calibration,
    save_stage, load_stage, save_ba_state, load_ba_state,
)
from slr.geom.camera import make_camera


def _cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts, col, nrm


def test_ply_roundtrip_native(tmp_path):
    pts, col, nrm = _cloud()
    p = tmp_path / "c.ply"
    n = write_ply(p, pts, colors=col, normals=nrm)
    assert n == 500
    pts2, col2, nrm2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_array_equal(col2, col)
    np.testing.assert_allclose(nrm2, nrm, atol=1e-6)


def test_ply_roundtrip_fallback(tmp_path, monkeypatch):
    import slr.io.ply as plymod
    monkeypatch.setattr(plymod, "load_native", lambda: None)
    pts, col, nrm = _cloud(seed=1)
    p = tmp_path / "c.ply"
    write_ply(p, pts, colors=col, normals=nrm)
    pts2, col2, nrm2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_array_equal(col2, col)


def test_ply_native_and_fallback_binary_identical(tmp_path, monkeypatch):
    pts, col, nrm = _cloud(seed=2)
    p1 = tmp_path / "native.ply"
    write_ply(p1, pts, colors=col, normals=nrm)
    import slr.io.ply as plymod
    monkeypatch.setattr(plymod, "load_native", lambda: None)
    p2 = tmp_path / "fallback.ply"
    write_ply(p2, pts, colors=col, normals=nrm)
    assert p1.read_bytes() == p2.read_bytes()


def test_ply_mask_and_grid_shape(tmp_path):
    pts = np.zeros((4, 5, 3), np.float32)
    mask = np.zeros((4, 5), bool)
    mask[1, 2] = mask[3, 4] = True
    n = write_ply(tmp_path / "m.ply", pts, mask=mask)
    assert n == 2


def test_obj_export(tmp_path):
    pts, col, _ = _cloud(10)
    n = write_obj(tmp_path / "c.obj", pts, colors=col)
    lines = (tmp_path / "c.obj").read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 10


def test_calibration_roundtrip(tmp_path):
    cam = make_camera(1100.0, 1050.0, 639.5, 511.5,
                      dist=[-0.1, 0.02, 1e-3, -1e-3, 0.0])
    R = np.eye(3, dtype=np.float32)
    proj = make_camera(900.0, 900.0, 511.5, 383.5, R=R, t=[-100.0, 0, 20.0])
    p = tmp_path / "calib.json"
    save_calibration(p, cam, proj, {"rms": 0.02})
    c2, p2, meta = load_calibration(p)
    assert float(c2.fx) == 1100.0
    np.testing.assert_allclose(np.asarray(p2.t), [-100.0, 0, 20.0])
    assert meta["rms"] == 0.02


def test_stage_and_ba_checkpoint(tmp_path):
    save_stage(tmp_path / "s.npz", a=np.arange(5), b=np.ones((2, 2)))
    d = load_stage(tmp_path / "s.npz")
    np.testing.assert_array_equal(d["a"], np.arange(5))

    R = np.stack([np.eye(3)] * 3)
    t = np.zeros((3, 3))
    X = np.ones((10, 3))
    save_ba_state(tmp_path / "ba.npz", R, t, X, iteration=4, cost=1.5)
    R2, t2, X2, it, cost = load_ba_state(tmp_path / "ba.npz")
    assert it == 4 and cost == 1.5
    np.testing.assert_array_equal(R2, R)


# ---------------------------------------------------------------------------
# OpenCV cv::FileStorage YAML interop (reference persistence format)
# ---------------------------------------------------------------------------

def test_opencv_yaml_roundtrip_ours(tmp_path):
    from slr.io import write_opencv_yaml, read_opencv_yaml

    K = np.array([[1100.0, 0, 640.0], [0, 1090.0, 512.0], [0, 0, 1.0]])
    d = np.array([[0.1, -0.05, 0.001, 0.002, 0.0]])
    p = tmp_path / "c.yml"
    write_opencv_yaml(p, {"camera_matrix": K, "dist": d,
                          "image_width": 1280, "rms": 0.217,
                          "note": "hello"})
    got = read_opencv_yaml(p)
    np.testing.assert_allclose(got["camera_matrix"], K)
    np.testing.assert_allclose(got["dist"], d)
    assert got["image_width"] == 1280
    assert abs(got["rms"] - 0.217) < 1e-12
    assert got["note"] == "hello"


def test_opencv_yaml_cv2_parity(tmp_path):
    """cv2 reads what we write; we read what cv2 writes."""
    cv2 = pytest.importorskip("cv2")
    from slr.io import write_opencv_yaml, read_opencv_yaml

    K = np.array([[1234.5, 0, 639.5], [0, 1230.25, 511.5], [0, 0, 1.0]])
    ours = tmp_path / "ours.yml"
    write_opencv_yaml(ours, {"camera_matrix": K, "n_views": 12})
    fs = cv2.FileStorage(str(ours), cv2.FILE_STORAGE_READ)
    np.testing.assert_allclose(fs.getNode("camera_matrix").mat(), K)
    assert int(fs.getNode("n_views").real()) == 12
    fs.release()

    theirs = tmp_path / "cv2.yml"
    fs = cv2.FileStorage(str(theirs), cv2.FILE_STORAGE_WRITE)
    fs.write("camera_matrix", K)
    fs.write("distortion_coefficients", np.array([[0.1, -0.2, 0.0, 0.0, 0.3]]))
    fs.write("image_width", 1280)
    fs.release()
    got = read_opencv_yaml(theirs)
    np.testing.assert_allclose(got["camera_matrix"], K)
    np.testing.assert_allclose(got["distortion_coefficients"],
                               [[0.1, -0.2, 0.0, 0.0, 0.3]])
    assert got["image_width"] == 1280


def test_opencv_calibration_adapter(tmp_path):
    from slr.io import save_calibration_opencv, load_calibration_opencv
    from slr.geom.se3 import so3_exp

    Rc = np.asarray(so3_exp(np.array([0.02, -0.01, 0.03], np.float32)))
    cam = make_camera(1100, 1090, 640, 512,
                      dist=np.array([0.1, -0.05, 0.001, 0.002, 0.01]),
                      R=Rc, t=np.array([1.0, 2.0, 3.0]))
    Rp = np.asarray(so3_exp(np.array([-0.05, 0.2, 0.0], np.float32)))
    proj = make_camera(1500, 1500, 512, 384, R=Rp,
                       t=np.array([-100.0, 5.0, 20.0]))
    p = tmp_path / "stereo.yml"
    save_calibration_opencv(p, cam, proj, {"rms": 0.3})
    c2, p2, meta = load_calibration_opencv(p)
    np.testing.assert_allclose(float(c2.fx), 1100.0)
    np.testing.assert_allclose(np.asarray(c2.dist),
                               [0.1, -0.05, 0.001, 0.002, 0.01], atol=1e-6)
    # world poses of both devices survive the relative-pose encoding
    np.testing.assert_allclose(np.asarray(c2.R), Rc, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.R), Rp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.t), [-100.0, 5.0, 20.0],
                               atol=1e-4)
    assert abs(meta["rms"] - 0.3) < 1e-9


# ---------------------------------------------------------------------------
# Scan image folders (reference capture layout)
# ---------------------------------------------------------------------------

def test_pgm_roundtrip_16bit(tmp_path):
    from slr.io import read_pgm, write_pgm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (33, 47)).astype(np.uint16)
    write_pgm(tmp_path / "a.pgm", img)
    back = read_pgm(tmp_path / "a.pgm")
    np.testing.assert_array_equal(np.asarray(back, np.uint16), img)


def test_scan_folder_roundtrip(tmp_path):
    from slr.io import load_scan_folder, save_scan_folder

    rng = np.random.default_rng(4)
    frames = rng.uniform(0, 1, (6, 24, 32)).astype(np.float32)
    save_scan_folder(tmp_path / "scan0", frames, fmt="pgm")
    back = load_scan_folder(tmp_path / "scan0")
    assert back.shape == (6, 24, 32) and back.dtype == np.float32
    np.testing.assert_allclose(back, frames, atol=1.0 / 65535)


def test_scan_folder_png_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from slr.io import load_scan_folder, save_scan_folder

    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 1, (3, 16, 20)).astype(np.float32)
    save_scan_folder(tmp_path / "scan1", frames, fmt="png")
    back = load_scan_folder(tmp_path / "scan1")
    np.testing.assert_allclose(back, frames, atol=1.0 / 65535)


def test_scan_folder_rejects_mixed_shapes(tmp_path):
    from slr.io import write_pgm

    d = tmp_path / "bad"
    d.mkdir()
    write_pgm(d / "frame_000.pgm", np.zeros((8, 8), np.uint8))
    write_pgm(d / "frame_001.pgm", np.zeros((8, 9), np.uint8))
    from slr.io import load_scan_folder
    with pytest.raises(ValueError):
        load_scan_folder(d)


# ---------------------------------------------------------------------------
# Viewer replacement (headless splat renderer)
# ---------------------------------------------------------------------------

def test_viewer_splat_occlusion_and_output(tmp_path):
    from slr.pipeline.viewer import render_cloud_image, render_turntable

    # two parallel planes of points; the nearer one must win the z-buffer
    g = np.linspace(-1, 1, 40)
    xx, yy = np.meshgrid(g, g)
    near = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3)
    far = np.stack([xx, yy, np.ones_like(xx)], -1).reshape(-1, 3)
    pts = np.concatenate([near, far]).astype(np.float32)
    col = np.concatenate([
        np.tile([1.0, 0.0, 0.0], (near.shape[0], 1)),
        np.tile([0.0, 0.0, 1.0], (far.shape[0], 1)),
    ]).astype(np.float32)
    img = render_cloud_image(pts, col, azimuth=0.0, size=128, splat=2)
    assert img.shape == (128, 128, 3)
    filled = (img.sum(-1) > 0)
    assert filled.mean() > 0.05  # cloud actually rendered
    # the near (red) plane dominates: red energy >> blue energy
    assert img[..., 0].sum() > 5.0 * img[..., 2].sum()

    outs = render_turntable(pts, col, tmp_path / "tt", frames=2, size=64)
    assert len(outs) == 2
    import os
    assert all(os.path.exists(o) for o in outs)
