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
