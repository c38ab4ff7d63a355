"""TSDF fusion + marching-tetrahedra extraction tests.

Ground truth is analytic: a sphere integrated from rendered scans must
yield a zero-crossing surface within ~a voxel of the true radius, and
multi-view integration must tighten (not smear) the estimate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.geom.camera import make_camera
from slr.pipeline.reconstruct import ScanCloud, reconstruct_dense
from slr.pipeline.tsdf import (
    extract_mesh, fuse_tsdf, make_volume, tsdf_integrate, write_tsdf_mesh_obj,
)
from slr.synth.render import default_rig, move_rig, render_scan
from slr.synth.scene import sphere_depth

CAM_W, CAM_H = 320, 256
CENTER = np.array([0.0, 0.0, 500.0], np.float32)
RADIUS = 60.0


def _cloud_from_depth(cam, depth, valid):
    """Organized cloud straight from an analytic depth map (no codec)."""
    H, W = depth.shape
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = (u - cam.cx) / cam.fx * depth
    y = (v - cam.cy) / cam.fy * depth
    pts = jnp.stack([x, y, depth], axis=-1)
    return ScanCloud(points=pts, mask=valid, colors=jnp.ones((H, W)),
                     quality=jnp.ones((H, W)), x_p=jnp.zeros((H, W)))


def _sphere_cloud(cam):
    depth = sphere_depth(cam, CAM_H, CAM_W, CENTER, RADIUS, background=1e6)
    valid = depth < 1e5
    depth = jnp.where(valid, depth, 600.0)
    return _cloud_from_depth(cam, depth, valid)


def test_tsdf_single_view_surface():
    cam = make_camera(fx=300.0, fy=300.0, cx=CAM_W / 2, cy=CAM_H / 2)
    cloud = _sphere_cloud(cam)
    vol = make_volume(CENTER - 80.0, size_vox=(80, 80, 80), voxel=2.0)
    vol = tsdf_integrate(vol, cloud, cam, jnp.eye(3), jnp.zeros(3))
    verts, faces = extract_mesh(vol)
    assert verts.shape[0] > 100
    r = np.linalg.norm(verts - CENTER, axis=-1)
    # only the camera-facing hemisphere is observed; every extracted
    # vertex must sit on the sphere within ~a voxel
    assert np.abs(r - RADIUS).max() < 2.5, np.abs(r - RADIUS).max()
    assert np.abs(r - RADIUS).mean() < 0.8


def test_tsdf_multi_view_coverage_grows():
    """A second view from the side must add surface the first cannot see."""
    cam = make_camera(fx=300.0, fy=300.0, cx=CAM_W / 2, cy=CAM_H / 2)
    cloud1 = _sphere_cloud(cam)

    # camera orbited 90 deg about the sphere's vertical axis
    th = np.pi / 2
    R_m = jnp.asarray(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        jnp.float32,
    )
    t_m = jnp.asarray(CENTER - R_m @ CENTER, jnp.float32)
    # the moved camera sees the scene through the same intrinsics; its
    # cloud is produced in its own frame: transform the analytic sphere
    # into that frame
    c2 = jnp.einsum("ji,j->i", R_m, jnp.asarray(CENTER) - t_m)
    depth2 = sphere_depth(cam, CAM_H, CAM_W, c2, RADIUS, background=1e6)
    valid2 = depth2 < 1e5
    cloud2 = _cloud_from_depth(cam, jnp.where(valid2, depth2, 600.0), valid2)

    vol1 = make_volume(CENTER - 80.0, size_vox=(80, 80, 80), voxel=2.0)
    vol1 = tsdf_integrate(vol1, cloud1, cam, jnp.eye(3), jnp.zeros(3))
    v1, _ = extract_mesh(vol1)

    vol2 = tsdf_integrate(vol1, cloud2, cam, R_m, t_m)
    v2, _ = extract_mesh(vol2)
    assert v2.shape[0] > 1.4 * v1.shape[0]
    r = np.linalg.norm(v2 - CENTER, axis=-1)
    assert np.abs(r - RADIUS).mean() < 0.8
    assert np.abs(r - RADIUS).max() < 3.0


def test_mesh_winding_consistent():
    """Every extracted face must wind so its normal points OUTWARD (toward
    positive tsdf). Guards the marching-tets table: a single flipped case
    (1 of 14 crossing configs) passes every distance-based test but breaks
    computed normals / backface culling downstream."""
    vol = make_volume(CENTER - 80.0, size_vox=(80, 80, 80), voxel=2.0)
    centers = (
        vol.origin
        + vol.voxel * jnp.stack(jnp.meshgrid(
            jnp.arange(80.0), jnp.arange(80.0), jnp.arange(80.0),
            indexing="ij")[::-1], axis=-1)
    )  # (D,H,W,3) world, axes (z,y,x) -> stack (x,y,z)
    d = jnp.linalg.norm(centers - jnp.asarray(CENTER), axis=-1)
    tsdf = jnp.clip((d - RADIUS) / vol.trunc, -1.0, 1.0)
    vol = vol._replace(tsdf=tsdf, weight=jnp.ones_like(tsdf))
    verts, faces = extract_mesh(vol)
    tris = verts.reshape(-1, 3, 3)
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    outward = tris.mean(axis=1) - CENTER
    dots = np.sum(n * outward, axis=-1)
    # normalize away degenerate slivers (zero-area crossings at tet faces)
    area2 = np.linalg.norm(n, axis=-1)
    good = area2 > 1e-9 * area2.max()
    frac = float(np.mean(dots[good] > 0))
    assert frac == 1.0, f"{(1 - frac) * 100:.2f}% of faces wound inward"


def test_fuse_tsdf_empty_anchor_raises():
    import pytest

    cam = make_camera(fx=300.0, fy=300.0, cx=CAM_W / 2, cy=CAM_H / 2)
    cloud = _sphere_cloud(cam)
    cloud = cloud._replace(mask=jnp.zeros_like(cloud.mask))
    with pytest.raises(ValueError, match="no valid points"):
        fuse_tsdf([cloud], cam, [jnp.eye(3)], [jnp.zeros(3)])


def test_fuse_tsdf_autogrow_fits_scene():
    """A scene wider than size_vox*voxel must grow the voxel (with a
    warning), not silently crop the model at the volume boundary."""
    import warnings

    cam = make_camera(fx=300.0, fy=300.0, cx=CAM_W / 2, cy=CAM_H / 2)
    cloud = _sphere_cloud(cam)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        vol = fuse_tsdf([cloud], cam, [jnp.eye(3)], [jnp.zeros(3)],
                        size_vox=(32, 32, 32), voxel=2.0)
        assert any("growing voxel" in str(w.message) for w in rec)
    # the whole sphere must fit: every valid point inside the volume box
    p = np.asarray(cloud.points)[np.asarray(cloud.mask)]
    lo = np.asarray(vol.origin)
    hi = lo + 32 * float(vol.voxel)
    assert (p >= lo - 1e-3).all() and (p <= hi + 1e-3).all()


def test_tsdf_from_rendered_scans(tmp_path):
    """End-to-end: rendered pattern stacks -> fused kernel clouds -> TSDF
    with the TRUE rig poses -> mesh on the analytic sphere."""
    cam, proj = default_rig(cam_w=CAM_W, cam_h=CAM_H, proj_w=256, proj_h=192,
                            baseline=150.0, toe_in_deg=14.0)
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=6,
                        phase_steps=4)
    dec, rec = DecodeConfig(), ReconstructConfig()

    poses = []
    clouds = []
    for ang in (0.0, 0.35):
        ca, sa = np.cos(ang), np.sin(ang)
        R_m = jnp.asarray([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], jnp.float32)
        t_m = jnp.asarray(CENTER - R_m @ CENTER, jnp.float32)
        cam_m, proj_m = move_rig(cam, proj, R_m, t_m)
        depth = sphere_depth(cam_m, CAM_H, CAM_W, CENTER, RADIUS,
                             background=620.0)
        scan = render_scan(cam_m, proj_m, depth, cfg, noise_std=0.003,
                           key=jax.random.PRNGKey(int(ang * 100)))
        cloud = reconstruct_dense(scan.frames, cam, proj, cfg, dec, rec)
        clouds.append(cloud)
        poses.append((R_m, t_m))

    Rs = [p[0] for p in poses]
    ts = [p[1] for p in poses]
    # anchor frame is scan 0's rig frame: compose anchor <- scan s
    R0, t0 = Rs[0], ts[0]
    Rs_rel = [jnp.einsum("ji,jk->ik", R0, R) for R in Rs]
    ts_rel = [jnp.einsum("ji,j->i", R0, t - t0) for R, t in zip(Rs, ts)]

    vol = fuse_tsdf(clouds, cam, Rs_rel, ts_rel, size_vox=(96, 96, 96),
                    voxel=2.0, origin=CENTER - 96.0)
    out = tmp_path / "fused.obj"
    nv, nf = write_tsdf_mesh_obj(out, vol)
    assert nv > 300 and nf == nv // 3
    verts, _ = extract_mesh(vol)
    # scan 0's rig frame: sphere centre at R0^T (C - t0)
    c0 = np.asarray(jnp.einsum("ji,j->i", R0, jnp.asarray(CENTER) - t0))
    r = np.linalg.norm(verts - c0, axis=-1)
    on_sphere = r > 0.6 * RADIUS  # exclude any background-plane facets
    frac = float(np.mean(np.abs(r[on_sphere] - RADIUS) < 3.0))
    assert frac > 0.95, frac
