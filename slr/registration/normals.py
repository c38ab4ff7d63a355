"""Surface normals for structured-light scans.

Scans come as (H, W, 3) organized point grids (one point per camera
pixel), so normals are central differences + cross product — no
neighbourhood search needed, fully vectorized (the reference computes
normals the same way conceptually, per-pixel over the cloud image).
Normals are oriented toward the camera (viewing direction -z).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_normals(points, mask=None):
    """points (H,W,3) organized cloud -> unit normals (H,W,3).

    Central differences with edge replication; invalid neighbours (mask
    False) fall back to the pixel itself, degrading gracefully to forward/
    backward differences at mask borders.
    """
    if mask is None:
        mask = jnp.ones(points.shape[:2], bool)
    m3 = mask[..., None]

    def shift(a, dy, dx, fill):
        out = jnp.roll(a, (dy, dx), axis=(0, 1))
        if dy == 1:
            out = out.at[0].set(fill[0])
        elif dy == -1:
            out = out.at[-1].set(fill[-1])
        if dx == 1:
            out = out.at[:, 0].set(fill[:, 0])
        elif dx == -1:
            out = out.at[:, -1].set(fill[:, -1])
        return out

    def masked_shift(dy, dx):
        p = shift(points, dy, dx, points)
        valid = shift(mask, dy, dx, mask)[..., None] if mask is not None else True
        return jnp.where(valid, p, points), valid

    px1, vx1 = masked_shift(0, -1)   # x+1 neighbour rolled into place
    px0, vx0 = masked_shift(0, 1)
    py1, vy1 = masked_shift(-1, 0)
    py0, vy0 = masked_shift(1, 0)

    dx = px1 - px0
    dy = py1 - py0
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm < 1e-12, 1.0, norm)
    # orient toward camera at origin: n . p < 0
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    degenerate = (norm[..., 0] < 1e-12) | ~mask
    n = jnp.where(degenerate[..., None], jnp.array([0.0, 0.0, -1.0]), n)
    return n
