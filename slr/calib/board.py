"""Calibration-board fixtures: object points + synthetic detected corners.

Stands in for the reference's chessboard detection
(cv::findChessboardCorners + subpix, SURVEY.md component 9): in this
zero-camera environment "detection" is the synthetic projection of known
board poses through a known camera, optionally with detection noise — the
same role the corner detector plays for the solver downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from slr.geom.camera import Camera, project
from slr.geom.se3 import so3_exp


def board_object_points(cols: int, rows: int, square: float):
    """(cols*rows, 3) planar board points, z=0, row-major like cv2."""
    j, i = np.meshgrid(np.arange(cols), np.arange(rows))
    pts = np.stack([j.ravel() * square, i.ravel() * square,
                    np.zeros(cols * rows)], axis=1)
    return jnp.asarray(pts, jnp.float32)


def synth_board_views(
    cam: Camera,
    cols: int,
    rows: int,
    square: float,
    n_views: int,
    seed: int = 0,
    noise_px: float = 0.0,
    z_range=(400.0, 700.0),
):
    """Random board poses fully visible-ish in front of the camera.

    Returns (obj (N,3), img (V,N,2), rvecs (V,3), tvecs (V,3)).
    Poses: modest tilts (<30 deg) so homographies stay well-conditioned,
    board center pushed near the optical axis.
    """
    obj = board_object_points(cols, rows, square)
    rng = np.random.default_rng(seed)
    center = np.array([(cols - 1) * square / 2, (rows - 1) * square / 2, 0.0])

    rvecs, tvecs, img = [], [], []
    key = jax.random.PRNGKey(seed)
    for v in range(n_views):
        rv = rng.uniform(-0.45, 0.45, 3)
        rv[2] = rng.uniform(-0.8, 0.8)  # in-plane rotation can be bigger
        z = rng.uniform(*z_range)
        R = so3_exp(jnp.asarray(rv, jnp.float32))
        # place board center at a point near the axis at depth z
        lateral = rng.uniform(-40.0, 40.0, 2)
        target = jnp.asarray([lateral[0], lateral[1], z], jnp.float32)
        t = target - R @ jnp.asarray(center, jnp.float32)
        uv, depth = project(cam, (R @ obj.T).T + t)
        if noise_px > 0:
            key, sub = jax.random.split(key)
            uv = uv + noise_px * jax.random.normal(sub, uv.shape)
        rvecs.append(jnp.asarray(rv, jnp.float32))
        tvecs.append(t)
        img.append(uv)
    return obj, jnp.stack(img), jnp.stack(rvecs), jnp.stack(tvecs)
