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


def _cam_depth(cam: Camera, pts):
    """World points -> depth along the camera z axis (works for any
    extrinsics; reduces to pts[..., 2] for the origin camera)."""
    return jnp.einsum("j,...j->...", cam.R[2], pts) + cam.t[2]


def plane_depth(cam: Camera, h: int, w: int, point, normal):
    """Depth map of the plane through ``point`` with ``normal`` (world
    frame), as seen by ``cam`` (any extrinsics)."""
    u, v = _pixel_grid(h, w)
    o, d = pixel_to_ray(cam, u, v)
    point = jnp.asarray(point, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    denom = jnp.einsum("...i,i->...", d, normal)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    lam = jnp.einsum("...i,i->...", point - o, normal) / denom
    pts = o + lam[..., None] * d
    return _cam_depth(cam, pts)


def sphere_depth(cam: Camera, h: int, w: int, center, radius, background=None):
    """Depth of a sphere seen by ``cam`` (any extrinsics); pixels missing
    the sphere fall back to background (a constant camera-frame depth)."""
    u, v = _pixel_grid(h, w)
    o, d = pixel_to_ray(cam, u, v)
    c = jnp.asarray(center, jnp.float32)
    oc = o - c
    b = jnp.einsum("...i,i->...", d, oc)
    cc = jnp.einsum("...i,...i->...", oc, oc) - radius * radius
    disc = b * b - cc
    hit = disc > 0
    lam = -b - jnp.sqrt(jnp.where(hit, disc, 0.0))
    pts = o + lam[..., None] * d
    z = _cam_depth(cam, pts)
    if background is None:
        background = float(c[2]) + 4.0 * radius
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), z.shape)
    return jnp.where(hit & (lam > 0), z, bg)


def spheres_scene(cam: Camera, h: int, w: int, plane_point=(0, 0, 560.0),
                  plane_normal=(0.15, 0.1, -1.0), spheres=None):
    """Asymmetric closed-form world scene: tilted plane + several spheres
    (min depth). Re-renderable from any rig pose, which makes it the
    multi-scan registration fixture — NOTE a single sphere + plane is
    rotationally symmetric about the plane normal through its centre, so
    any pose along that orbit fits equally well; several unequal spheres
    break every symmetry."""
    if spheres is None:
        spheres = (
            ((20.0, 5.0, 540.0), 140.0),
            ((-60.0, -40.0, 520.0), 60.0),
            ((70.0, 50.0, 530.0), 45.0),
        )
    depth = plane_depth(cam, h, w, plane_point, plane_normal)
    for center, radius in spheres:
        depth = jnp.minimum(
            depth, sphere_depth(cam, h, w, center, radius, background=1e6)
        )
    return depth


def rocks_scene(cam: Camera, h: int, w: int, n: int = 18, seed: int = 0,
                plane_point=(0, 0, 580.0), plane_normal=(0.12, 0.08, -1.0)):
    """World-anchored "rock field": n unequal spheres scattered over a
    tilted plane (closed form, re-renderable from any rig pose).

    Unlike ``spheres_scene`` (dominated by one big sphere + plane, whose
    patches are locally self-similar), the spread of rock radii makes
    local curvature — and therefore FPFH descriptors — discriminative,
    so this is the fixture for feature-based coarse registration under
    large motion (SURVEY.md 4.6 component 14)."""
    import numpy as _np

    rng = _np.random.default_rng(seed)
    xs = rng.uniform(-120, 120, n)
    ys = rng.uniform(-80, 80, n)
    rs = rng.uniform(14.0, 42.0, n)
    # embed each rock half-way into the plane region around z ~ 545
    zs = 565.0 - 0.35 * rs + rng.uniform(-12, 12, n)
    depth = plane_depth(cam, h, w, plane_point, plane_normal)
    for x, y, z, r in zip(xs, ys, zs, rs):
        depth = jnp.minimum(
            depth,
            sphere_depth(cam, h, w, (float(x), float(y), float(z)), float(r),
                         background=1e6),
        )
    return depth


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
