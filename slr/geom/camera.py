"""Pinhole + Brown-Conrady distortion camera/projector model.

The build's equivalent of the reference's shared ``VirtualCamera``-style ray
model (SURVEY.md component 21): one model serves both the camera and the
projector (the projector is an "inverse camera" for calibration, SURVEY.md
section 4.4). Matches the OpenCV convention (k1,k2,p1,p2,k3) so cv2 can act
as the parity oracle in tests.

A camera is a pytree ``Camera(fx, fy, cx, cy, dist, R, t)`` where ``(R, t)``
maps *world* points into *camera* coordinates: ``x_cam = R @ X + t``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,) k1 k2 p1 p2 k3
    R: jnp.ndarray     # (3,3) world->cam rotation
    t: jnp.ndarray     # (3,)  world->cam translation

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    @property
    def center(self):
        """Camera center in world coordinates: -R^T t."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.t)


def make_camera(fx, fy, cx, cy, dist=None, R=None, t=None) -> Camera:
    f32 = jnp.float32
    dist = jnp.zeros(5, f32) if dist is None else jnp.asarray(dist, f32)
    dist = jnp.pad(dist, (0, 5 - dist.shape[0])) if dist.shape[0] < 5 else dist[:5]
    R = jnp.eye(3, dtype=f32) if R is None else jnp.asarray(R, f32)
    t = jnp.zeros(3, f32) if t is None else jnp.asarray(t, f32)
    return Camera(f32(fx), f32(fy), f32(cx), f32(cy), dist, R, t)


def distort(xn, yn, dist):
    """Apply Brown-Conrady distortion to normalized coords. Broadcasts."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xy = xn * yn
    xd = xn * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xy
    return xd, yd


def undistort_iterative(xd, yd, dist, iters: int = 8):
    """Invert the distortion by fixed-point iteration (cv2-style).

    Fixed iteration count keeps it jit/scan friendly; 8 iterations reaches
    < 1e-6 normalized error for typical |k| < 0.5 lens models (asserted in
    tests/test_geom.py).
    """
    def body(i, xy):
        xn, yn = xy
        xdd, ydd = distort(xn, yn, dist)
        return (xn + (xd - xdd), yn + (yd - ydd))

    xn, yn = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return xn, yn


def project(cam: Camera, pts_world):
    """World points (...,3) -> pixel coords (...,2) and camera-frame depth."""
    pc = jnp.einsum("ij,...j->...i", cam.R, pts_world) + cam.t
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn, yn = pc[..., 0] / zs, pc[..., 1] / zs
    xd, yd = distort(xn, yn, cam.dist)
    u = cam.fx * xd + cam.cx
    v = cam.fy * yd + cam.cy
    return jnp.stack([u, v], axis=-1), z


def pixel_to_ray(cam: Camera, u, v, undistort_iters: int = 8):
    """Pixel coords -> unit ray direction in *world* frame + origin.

    Returns (origin (3,), dirs (...,3)). Undistorts first, then rotates the
    normalized ray into the world frame.
    """
    xd = (u - cam.cx) / cam.fx
    yd = (v - cam.cy) / cam.fy
    xn, yn = undistort_iterative(xd, yd, cam.dist, undistort_iters)
    d_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    d_world = jnp.einsum("ji,...j->...i", cam.R, d_cam)  # R^T d
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    return cam.center, d_world
