"""Normalized-DLT homography estimation (board plane -> image).

Step one of Zhang calibration (SURVEY.md 4.4): per view, the 3x3 H mapping
board coordinates (X, Y, 1) to image pixels. Hartley normalization + the
smallest eigenvector of A^T A (9x9 eigh — cheap, batched with vmap).
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize_points(pts):
    """Similarity transform moving centroid to 0, mean distance to sqrt(2)."""
    mean = jnp.mean(pts, axis=0)
    centered = pts - mean
    scale = jnp.sqrt(2.0) / (jnp.mean(jnp.linalg.norm(centered, axis=1)) + 1e-12)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        pts.dtype,
    )
    return centered * scale, T


def homography_dlt(obj_xy, img_uv):
    """obj_xy (N,2) board-plane coords, img_uv (N,2) pixels -> H (3,3).

    H is normalized so H[2,2] == 1. vmap over views for the batched solve.
    """
    src, Ts = _normalize_points(obj_xy.astype(jnp.float32))
    dst, Td = _normalize_points(img_uv.astype(jnp.float32))
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # rows: [-x,-y,-1, 0,0,0, ux,uy,u] and [0,0,0, -x,-y,-1, vx,vy,v]
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, V = jnp.linalg.eigh(A.T @ A)
    h = V[:, 0]  # eigenvector of smallest eigenvalue
    Hn = h.reshape(3, 3)
    H = jnp.linalg.solve(Td, Hn @ Ts)
    return H / H[2, 2]
