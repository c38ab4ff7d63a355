"""Calibration-board scene: chessboard albedo + plane depth from a pose.

The image-based calibration fixture (VERDICT r1 missing #2): instead of
synthetically projecting known corner coordinates, the rig now *renders*
the physical calibration procedure — a chessboard at a known pose under
white light (for the corner detector) and under the full pattern stack
(for the decode -> projector-corner path). Ground-truth corner positions
ride along so detector accuracy is measurable, and cv2 acts as the
detection parity oracle in tests.

Board frame: inner corner (i, j) sits at (j*square, i*square, 0), matching
``slr.calib.board.board_object_points`` (and cv2's ordering). The squares
extend one square beyond the inner-corner grid on every side, then a white
margin of ``margin`` squares, then dark background.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slr.config import PatternConfig
from slr.geom.camera import Camera, pixel_to_ray, project
from slr.synth.render import RenderedScan, render_scan


class BoardView(NamedTuple):
    white_image: jnp.ndarray    # (H, W) white-lit capture for corner detect
    scan: RenderedScan          # pattern stack rendered on the board
    corners_cam_true: jnp.ndarray   # (cols*rows, 2) GT image corners
    corners_proj_true: jnp.ndarray  # (cols*rows, 2) GT projector coords
    depth: jnp.ndarray          # (H, W) scene depth


def _board_plane_depth_albedo(cam: Camera, h: int, w: int, R_b, t_b,
                              cols: int, rows: int, square: float,
                              margin: float = 0.7,
                              background_depth: float = 1500.0,
                              background_albedo: float = 0.15,
                              dark: float = 0.12, light: float = 0.95):
    """Ray-cast the board plane; chessboard albedo in board coordinates."""
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    o, d = pixel_to_ray(cam, u, v)
    # plane through t_b with normal n = R_b e_z (board frame z=0)
    n = R_b[:, 2]
    denom = jnp.einsum("j,...j->...", n, d)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    lam = jnp.einsum("j,j->", n, t_b) - jnp.einsum("j,...j->...", n, o)
    lam = lam / denom
    pts = o + lam[..., None] * d
    # board coordinates
    pb = jnp.einsum("ji,...j->...i", R_b, pts - t_b)
    xb, yb = pb[..., 0], pb[..., 1]

    lo_x, hi_x = -square, cols * square
    lo_y, hi_y = -square, rows * square
    m = margin * square
    on_squares = ((xb >= lo_x) & (xb <= hi_x) & (yb >= lo_y) & (yb <= hi_y))
    on_board = ((xb >= lo_x - m) & (xb <= hi_x + m)
                & (yb >= lo_y - m) & (yb <= hi_y + m))

    ij = (jnp.floor(xb / square) + jnp.floor(yb / square)).astype(jnp.int32)
    checker = jnp.where((ij % 2) == 0, light, dark)
    albedo = jnp.where(on_squares, checker,
                       jnp.where(on_board, light, background_albedo))

    dz = jnp.einsum("j,...j->...", cam.R[2], d)
    depth_board = lam * dz     # camera-z depth of the plane hit
    hit = (lam > 0) & on_board
    depth = jnp.where(hit, depth_board, background_depth)
    return depth.astype(jnp.float32), albedo.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "cols", "rows", "square",
                                   "cam_h", "cam_w", "noise_std"))
def render_board_view(
    cam: Camera,
    proj: Camera,
    cfg: PatternConfig,
    R_b, t_b,                   # board -> world pose
    cols: int, rows: int, square: float,
    cam_h: int, cam_w: int,
    noise_std: float = 0.0,
    key=None,
) -> BoardView:
    """Render one calibration view: white-lit image + full pattern scan.

    The white image is the stack's all-white frame (frame 0), i.e. the
    same exposure the scan controller would grab first — the corner
    detector runs on it, the decoder on the rest.
    """
    from slr.calib.board import board_object_points

    depth, albedo = _board_plane_depth_albedo(
        cam, cam_h, cam_w, R_b, t_b, cols, rows, square)
    scan = render_scan(cam, proj, depth, cfg, albedo=albedo,
                       noise_std=noise_std, key=key)

    obj = board_object_points(cols, rows, square)
    pts_world = (R_b @ obj.T).T + t_b
    uv_c, _ = project(cam, pts_world)
    uv_p, _ = project(proj, pts_world)
    return BoardView(white_image=scan.frames[0], scan=scan,
                     corners_cam_true=uv_c, corners_proj_true=uv_p,
                     depth=depth)


def board_poses(n_views: int, cols: int, rows: int, square: float,
                seed: int = 0, z_range=(420.0, 650.0)):
    """Random well-conditioned board poses (board -> world), numpy host
    side; mirrors slr.calib.board.synth_board_views pose sampling."""
    import numpy as np
    from slr.geom.se3 import so3_exp

    rng = np.random.default_rng(seed)
    center = np.array([(cols - 1) * square / 2, (rows - 1) * square / 2, 0.0],
                      np.float32)
    poses = []
    for _ in range(n_views):
        rv = rng.uniform(-0.35, 0.35, 3)
        rv[2] = rng.uniform(-0.6, 0.6)
        z = rng.uniform(*z_range)
        lateral = rng.uniform(-30.0, 30.0, 2)
        R = so3_exp(jnp.asarray(rv, jnp.float32))
        target = jnp.asarray([lateral[0], lateral[1], z], jnp.float32)
        t = target - R @ jnp.asarray(center)
        poses.append((R, t))
    return poses
