"""Unit tests for slr.geom: SE(3) algebra, camera model, triangulation.

Oracles: closed-form identities, scipy, and hand-computed intersections
(SURVEY.md section 6 "unit tests per component vs closed form").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr.geom import (
    se3_exp, se3_log, se3_compose, se3_inverse, se3_apply, so3_exp, so3_log,
    make_camera, project, pixel_to_ray, distort, undistort_iterative,
    triangulate_midpoint, triangulate_plane, triangulate_rays, triangulate_dlt,
)
from slr.geom.triangulate import triangulate_rays  # noqa: F401


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.uniform(-1.5, 1.5, (64, 3)), jnp.float32)
    R = so3_exp(phi)
    # orthonormality
    eye = jnp.eye(3)
    err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye))
    assert err < 1e-5
    phi2 = so3_log(R)
    assert jnp.max(jnp.abs(phi - phi2)) < 1e-4


def test_so3_small_angle():
    phi = jnp.array([[1e-9, -1e-9, 1e-9]], jnp.float32)
    R = so3_exp(phi)
    assert jnp.max(jnp.abs(R - jnp.eye(3))) < 1e-6
    assert not jnp.any(jnp.isnan(so3_log(R)))


def test_se3_exp_log_roundtrip_and_compose():
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.uniform(-1.0, 1.0, (32, 6)), jnp.float32)
    R, t = se3_exp(xi)
    xi2 = se3_log(R, t)
    assert jnp.max(jnp.abs(xi - xi2)) < 1e-4

    Ri, ti = se3_inverse(R, t)
    Rc, tc = se3_compose(R, t, Ri, ti)
    assert jnp.max(jnp.abs(Rc - jnp.eye(3))) < 1e-5
    assert jnp.max(jnp.abs(tc)) < 1e-5


def test_se3_apply_matches_matmul():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.uniform(-1, 1, (6,)), jnp.float32)
    R, t = se3_exp(xi)
    pts = jnp.asarray(rng.uniform(-10, 10, (17, 3)), jnp.float32)
    out = se3_apply(R, t, pts)
    ref = (np.asarray(R) @ np.asarray(pts).T).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_distort_undistort_roundtrip():
    dist = jnp.array([-0.2, 0.05, 0.001, -0.0005, 0.01], jnp.float32)
    rng = np.random.default_rng(3)
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, (1000,)), jnp.float32)
    yn = jnp.asarray(rng.uniform(-0.3, 0.3, (1000,)), jnp.float32)
    xd, yd = distort(xn, yn, dist)
    xu, yu = undistort_iterative(xd, yd, dist)
    assert float(jnp.max(jnp.abs(xu - xn))) < 1e-5
    assert float(jnp.max(jnp.abs(yu - yn))) < 1e-5


def test_distort_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    dist = np.array([-0.25, 0.08, 0.002, -0.001, 0.015], np.float32)
    K = np.array([[1000.0, 0, 640], [0, 1000.0, 480], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-0.3, 0.3, (50, 2)).astype(np.float32)
    obj = np.concatenate([pts, np.ones((50, 1), np.float32)], axis=1)
    ref, _ = cv2.projectPoints(
        obj.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, dist
    )
    ref = ref.reshape(-1, 2)
    cam = make_camera(1000.0, 1000.0, 640.0, 480.0, dist=dist)
    uv, _ = project(cam, jnp.asarray(obj))
    np.testing.assert_allclose(np.asarray(uv), ref, atol=1e-3)


def test_project_ray_roundtrip():
    cam = make_camera(
        1100.0, 1050.0, 639.5, 511.5,
        dist=[-0.15, 0.03, 0.001, 0.0005, 0.0],
    )
    rng = np.random.default_rng(5)
    pts = np.stack(
        [
            rng.uniform(-100, 100, 500),
            rng.uniform(-80, 80, 500),
            rng.uniform(300, 800, 500),
        ],
        axis=1,
    ).astype(np.float32)
    uv, z = project(cam, jnp.asarray(pts))
    o, d = pixel_to_ray(cam, uv[..., 0], uv[..., 1])
    # point must lie on its ray: distance from pts to ray ~ 0
    rel = jnp.asarray(pts) - o
    along = jnp.sum(rel * d, axis=-1, keepdims=True) * d
    perp = jnp.linalg.norm(rel - along, axis=-1)
    assert float(jnp.max(perp)) < 5e-2  # mm-scale scene, sub-0.05 units


def test_triangulate_midpoint_exact():
    # Two rays meeting exactly at (1, 2, 3)
    p = jnp.array([1.0, 2.0, 3.0])
    o1 = jnp.zeros(3)
    o2 = jnp.array([5.0, 0.0, 0.0])
    d1 = p / jnp.linalg.norm(p)
    d2 = (p - o2) / jnp.linalg.norm(p - o2)
    x, gap = triangulate_midpoint(o1, d1, o2, d2)
    np.testing.assert_allclose(np.asarray(x), np.asarray(p), atol=1e-5)
    assert float(gap) < 1e-6


def test_triangulate_plane_and_rays_and_dlt_on_rig():
    from slr.synth.render import default_rig

    cam, proj = default_rig()
    rng = np.random.default_rng(6)
    pts = np.stack(
        [
            rng.uniform(-60, 60, 400),
            rng.uniform(-50, 50, 400),
            rng.uniform(420, 600, 400),
        ],
        axis=1,
    ).astype(np.float32)
    pts = jnp.asarray(pts)
    uv_c, _ = project(cam, pts)
    uv_p, _ = project(proj, pts)

    # plane method (column-only)
    X, depth = triangulate_plane(cam, proj, uv_c[:, 0], uv_c[:, 1], uv_p[:, 0])
    err = jnp.linalg.norm(X - pts, axis=-1)
    assert float(jnp.max(err)) < 1e-2

    # midpoint with both coords
    X2, gap = triangulate_rays(cam, proj, uv_c[:, 0], uv_c[:, 1], uv_p[:, 0], uv_p[:, 1])
    assert float(jnp.max(jnp.linalg.norm(X2 - pts, axis=-1))) < 1e-2

    # DLT, column-only and full
    X3 = triangulate_dlt(cam, proj, uv_c[:, 0], uv_c[:, 1], uv_p[:, 0])
    assert float(jnp.max(jnp.linalg.norm(X3 - pts, axis=-1))) < 5e-2
    X4 = triangulate_dlt(cam, proj, uv_c[:, 0], uv_c[:, 1], uv_p[:, 0], uv_p[:, 1])
    assert float(jnp.max(jnp.linalg.norm(X4 - pts, axis=-1))) < 5e-2
