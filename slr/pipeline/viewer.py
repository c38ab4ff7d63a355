"""Point-cloud preview rendering — the build's replacement for the
reference's Qt/OpenGL cloud-viewer widget (SURVEY.md component 19 / L6).

Headless and device-native: points are projected and z-buffered on the
accelerator with scatter-min (one fused jit, no Python per-point loop),
then written as PNG (cv2 if importable) or binary PPM (always).  A
turntable sequence provides the "rotate the model" interaction of the
GUI viewer as a sequence of stills.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("size", "splat"))
def splat_points(points, colors, view_R, view_t, size: int = 640,
                 splat: int = 1, fov: float = 0.9):
    """Z-buffered splat of an (N,3) cloud into a (size,size,3) float image.

    view_R/view_t map world -> view coordinates (camera looks down +z).
    ``splat`` grows each point into a (2*splat+1)^2 pixel block so sparse
    clouds stay visible.  Returns (img, depth) with background = 0 / +inf.
    """
    pts = points @ view_R.T + view_t
    z = pts[:, 2]
    valid = z > 1e-3
    f = 0.5 * size / jnp.tan(0.5 * fov)
    zs = jnp.where(valid, z, 1.0)
    u = f * pts[:, 0] / zs + 0.5 * size
    v = f * pts[:, 1] / zs + 0.5 * size

    big = jnp.float32(3.4e38)
    depth = jnp.full((size * size,), big, jnp.float32)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)

    offs = list(range(-splat, splat + 1))
    idxs, zvals, oks = [], [], []
    for du in offs:
        for dv in offs:
            uu, vv = ui + du, vi + dv
            ok = valid & (uu >= 0) & (uu < size) & (vv >= 0) & (vv < size)
            idx = jnp.where(ok, vv * size + uu, 0)
            idxs.append(idx)
            zvals.append(jnp.where(ok, z, big))
            oks.append(ok)
    idx_all = jnp.concatenate(idxs)
    z_all = jnp.concatenate(zvals)
    depth = depth.at[idx_all].min(z_all)

    # winner-takes-pixel color: a point colors every pixel whose z-buffer
    # entry it (nearly) owns; ties blend harmlessly via max
    img = jnp.zeros((size * size, 3), jnp.float32)
    col = colors.astype(jnp.float32)
    if col.ndim == 1:
        col = jnp.repeat(col[:, None], 3, axis=1)
    col_all = jnp.tile(col, (len(offs) ** 2, 1))
    win = (z_all <= depth[idx_all] * (1.0 + 1e-4)) & (z_all < big)
    img = img.at[idx_all].max(jnp.where(win[:, None], col_all, 0.0))

    # depth-cued shading so monochrome clouds still read as 3-D
    d = depth.reshape(size, size)
    have = d < big
    dmin = jnp.min(jnp.where(have, d, big))
    dmax = jnp.max(jnp.where(have, d, -big))
    shade = 1.0 - 0.5 * jnp.clip((d - dmin) / (dmax - dmin + 1e-6), 0, 1)
    img = img.reshape(size, size, 3) * jnp.where(have, shade, 0.0)[..., None]
    return img, d


def _look_at_cloud(points: np.ndarray, azimuth: float, elevation: float = 0.35):
    """View pose orbiting the cloud's bounding sphere."""
    ctr = points.mean(0)
    rad = float(np.linalg.norm(points - ctr, axis=1).max()) + 1e-6
    ca, sa = np.cos(azimuth), np.sin(azimuth)
    ce, se = np.cos(elevation), np.sin(elevation)
    # camera position on the orbit sphere
    eye = ctr + 2.6 * rad * np.array([sa * ce, -se, -ca * ce])
    fwd = ctr - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right) + 1e-9
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd]).astype(np.float32)  # world->view
    t = (-R @ eye).astype(np.float32)
    return R, t


def write_image(path, img01: np.ndarray) -> str:
    """Write an (H,W,3) float [0,1] image as PNG (cv2) or PPM fallback."""
    path = Path(path)
    u8 = (np.clip(np.asarray(img01), 0, 1) * 255 + 0.5).astype(np.uint8)
    try:
        import cv2
        path = path.with_suffix(".png")
        cv2.imwrite(str(path), u8[..., ::-1])  # RGB -> BGR
    except ImportError:
        path = path.with_suffix(".ppm")
        with open(path, "wb") as f:
            f.write(f"P6\n{u8.shape[1]} {u8.shape[0]}\n255\n".encode())
            f.write(u8.tobytes())
    return str(path)


def render_cloud_image(points, colors=None, azimuth: float = 0.6,
                       size: int = 640, splat: int = 1) -> np.ndarray:
    pts = np.asarray(points, np.float32)
    if colors is None:
        col = np.full((pts.shape[0], 3), 0.85, np.float32)
    else:
        col = np.asarray(colors, np.float32)
        if col.dtype != np.float32 or col.max() > 1.5:
            col = col.astype(np.float32) / 255.0
        if col.ndim == 1:
            col = np.repeat(col[:, None], 3, 1)
    R, t = _look_at_cloud(pts, azimuth)
    img, _ = splat_points(jnp.asarray(pts), jnp.asarray(col),
                          jnp.asarray(R), jnp.asarray(t),
                          size=size, splat=splat)
    return np.asarray(img)


def render_turntable(points, colors=None, out_prefix=None, frames: int = 1,
                     size: int = 640, splat: int = 1) -> list:
    """Render ``frames`` orbit views; returns the written file paths."""
    out_prefix = out_prefix or "preview"
    outs = []
    for i in range(max(1, frames)):
        az = 0.6 + 2.0 * np.pi * i / max(1, frames)
        img = render_cloud_image(points, colors, azimuth=az, size=size,
                                 splat=splat)
        outs.append(write_image(f"{out_prefix}_{i:02d}", img))
    return outs
