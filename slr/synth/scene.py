"""Synthetic scene generators: camera-frame depth maps + albedo textures.

A scene is simply a per-camera-pixel depth map z(u, v) (depth along the
camera z axis). This makes the forward render exact (no ray marching) while
still exercising every pipeline stage with non-trivial geometry.
"""

from __future__ import annotations

import jax.numpy as jnp

from slr.geom.camera import Camera, pixel_to_ray


def _pixel_grid(h: int, w: int):
    v, u = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return u, v


def plane_depth(cam: Camera, h: int, w: int, point, normal):
    """Depth map of the plane through ``point`` with ``normal`` (world frame).

    Assumes the camera is at the world origin looking down +z (the standard
    scan frame). Depth = z-component of the ray-plane intersection.
    """
    u, v = _pixel_grid(h, w)
    o, d = pixel_to_ray(cam, u, v)
    point = jnp.asarray(point, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    denom = jnp.einsum("...i,i->...", d, normal)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    lam = jnp.einsum("i,i->", point - o if o.ndim == 1 else point, normal) / denom
    pts = o + lam[..., None] * d
    return pts[..., 2]


def sphere_depth(cam: Camera, h: int, w: int, center, radius, background=None):
    """Depth of a sphere; pixels missing the sphere fall back to background
    (a constant depth or another depth map). Camera at origin."""
    u, v = _pixel_grid(h, w)
    o, d = pixel_to_ray(cam, u, v)
    c = jnp.asarray(center, jnp.float32)
    oc = o - c
    b = jnp.einsum("...i,i->...", d, oc)
    cc = jnp.einsum("i,i->", oc, oc) - radius * radius
    disc = b * b - cc
    hit = disc > 0
    lam = -b - jnp.sqrt(jnp.where(hit, disc, 0.0))
    pts = o + lam[..., None] * d
    z = pts[..., 2]
    if background is None:
        background = c[2] + 4.0 * radius
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), z.shape)
    return jnp.where(hit & (lam > 0), z, bg)


def bumps_depth(h: int, w: int, base: float = 500.0, amp: float = 30.0,
                freq: float = 3.0):
    """Smooth Gaussian-bump height field as a direct depth map."""
    v, u = jnp.meshgrid(
        jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij"
    )
    z = base + amp * (
        jnp.sin(2 * jnp.pi * freq * u) * jnp.cos(2 * jnp.pi * freq * v)
        + 0.5 * jnp.exp(-(((u - 0.5) ** 2 + (v - 0.5) ** 2) / 0.02))
    )
    return z.astype(jnp.float32)


def checker_albedo(h: int, w: int, cells: int = 8, lo: float = 0.4,
                   hi: float = 1.0):
    """Checkerboard albedo to exercise texture-dependent modulation."""
    v, u = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    c = ((u * cells // w) + (v * cells // h)) % 2
    return jnp.where(c == 0, lo, hi).astype(jnp.float32)
