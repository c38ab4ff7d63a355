"""Distributed tests on the simulated 8-device CPU mesh (SURVEY.md sec. 6).

Covers: halo exchange correctness, pixel-tile sharded reconstruction vs
the unsharded path, and distributed Schur BA vs the single-device oracle
and vs ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack
from slr.dist import (
    make_mesh, halo_exchange_rows, sharded_reconstruct,
    distributed_bundle_adjust, bundle_adjust_reference,
)
from slr.geom.se3 import so3_exp
from slr.geom.triangulate import triangulate_plane
from slr.synth import bumps_depth
from slr.synth.render import default_rig, render_scan


def test_mesh_shapes():
    mesh = make_mesh(pixel_tiles=4, map_blocks=2)
    assert mesh.shape == {"map_block": 2, "pixel_tile": 4}
    mesh = make_mesh()
    assert mesh.shape["pixel_tile"] == len(jax.devices())


def test_halo_exchange_rows():
    mesh = make_mesh(pixel_tiles=4, map_blocks=2)
    H, W = 16, 8  # 4 rows per tile
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)

    def f(x_l):
        return halo_exchange_rows(x_l, "pixel_tile", 1)

    out = jax.shard_map(
        f, mesh=mesh, in_specs=P("pixel_tile"), out_specs=P("pixel_tile"),
    )(x)
    # each tile's haloed block is 6 rows; reassembled shape (24, W)
    out = np.asarray(out).reshape(4, 6, W)
    ref = np.asarray(x).reshape(4, 4, W)
    for tile in range(4):
        np.testing.assert_array_equal(out[tile, 1:5], ref[tile])
        if tile > 0:
            np.testing.assert_array_equal(out[tile, 0], ref[tile - 1, -1])
        else:
            np.testing.assert_array_equal(out[tile, 0], 0)
        if tile < 3:
            np.testing.assert_array_equal(out[tile, 5], ref[tile + 1, 0])
        else:
            np.testing.assert_array_equal(out[tile, 5], 0)


def test_sharded_reconstruct_matches_unsharded():
    """The sharded path runs the PRODUCTION fused kernel per shard
    (VERDICT r1 missing #5): it must match the unsharded kernel exactly,
    and stay consistent with the pure-JAX reference decode."""
    from slr.kernels import fused_decode_triangulate

    CAM_W, CAM_H = 256, 128
    cam, proj = default_rig(cam_w=CAM_W, cam_h=CAM_H, proj_w=256, proj_h=192,
                            baseline=150.0, toe_in_deg=14.0)
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=6,
                        phase_steps=4)
    dec = DecodeConfig()
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=20.0)
    scan = render_scan(cam, proj, depth, cfg)

    mesh = make_mesh(pixel_tiles=8, map_blocks=1)
    pts_s, mask_s, xp_s, _ = sharded_reconstruct(
        scan.frames, cam, proj, cfg, dec, mesh
    )

    # exact vs the single-chip fused kernel (same code, sharded)
    ker = fused_decode_triangulate(scan.frames, cam, proj, cfg, dec)
    np.testing.assert_array_equal(np.asarray(mask_s),
                                  np.asarray(ker.mask > 0.5))
    pts_k = np.moveaxis(np.asarray(ker.points), 0, -1)
    np.testing.assert_allclose(np.asarray(pts_s) *
                               np.asarray(mask_s)[..., None],
                               pts_k, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xp_s), np.asarray(ker.x_p),
                               atol=1e-5)

    # consistent with the pure-JAX reference path (kernel tolerance)
    ref = decode_stack(scan.frames, cfg, dec)
    v, u = jnp.meshgrid(jnp.arange(CAM_H, dtype=jnp.float32),
                        jnp.arange(CAM_W, dtype=jnp.float32), indexing="ij")
    pts_r, _ = triangulate_plane(cam, proj, u, v, ref.x_p)
    both = np.asarray(ref.mask) & np.asarray(mask_s)
    assert (np.asarray(ref.mask) ^ np.asarray(mask_s)).mean() < 0.01
    perr = np.abs(np.asarray(pts_s) - np.asarray(pts_r))[both]
    assert perr.max() < 5e-2, perr.max()


@pytest.mark.slow
def test_sharded_reconstruct_spatial_iters():
    """spatial_iters > 0 engages the halo-exchange repair on top of the
    fused kernel decode; on a clean scan it must not perturb the result."""
    CAM_W, CAM_H = 256, 128
    cam, proj = default_rig(cam_w=CAM_W, cam_h=CAM_H, proj_w=256, proj_h=192,
                            baseline=150.0, toe_in_deg=14.0)
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=6,
                        phase_steps=4)
    dec = DecodeConfig()
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=20.0)
    scan = render_scan(cam, proj, depth, cfg)
    mesh = make_mesh(pixel_tiles=8, map_blocks=1)
    pts0, mask0, xp0, _ = sharded_reconstruct(
        scan.frames, cam, proj, cfg, dec, mesh, spatial_iters=0
    )
    pts4, mask4, xp4, _ = sharded_reconstruct(
        scan.frames, cam, proj, cfg, dec, mesh, spatial_iters=4
    )
    np.testing.assert_array_equal(np.asarray(mask0), np.asarray(mask4))
    m = np.asarray(mask0)
    assert np.abs(np.asarray(xp4) - np.asarray(xp0))[m].max() < 1e-4
    # repaired path re-triangulates: parity on valid pixels
    perr = np.abs(np.asarray(pts4) - np.asarray(pts0))[m]
    assert perr.max() < 5e-2, perr.max()


def _make_ba_problem(S=4, L=64, K=3, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    R_true, t_true = [jnp.eye(3)], [jnp.zeros(3)]
    for s in range(1, S):
        R_true.append(so3_exp(jnp.asarray(rng.uniform(-0.3, 0.3, 3), jnp.float32)))
        t_true.append(jnp.asarray(rng.uniform(-50, 50, 3), jnp.float32))
    R_true, t_true = jnp.stack(R_true), jnp.stack(t_true)
    X_true = jnp.asarray(rng.uniform(-100, 100, (L, 3)), jnp.float32)
    obs_s = jnp.asarray(rng.integers(0, S, (L, K)), jnp.int32)
    # local measurement p = R^T (X - t) + noise
    Rs = R_true[obs_s]
    ts = t_true[obs_s]
    p = jnp.einsum("lkij,lki->lkj", Rs, X_true[:, None, :] - ts)
    p = p + jnp.asarray(rng.normal(0, noise, p.shape), jnp.float32)
    obs_w = jnp.ones((L, K), jnp.float32)
    # perturbed initialization
    R0 = jnp.stack([
        R_true[s] @ so3_exp(jnp.asarray(rng.normal(0, 0.02, 3), jnp.float32))
        for s in range(S)
    ])
    t0 = t_true + jnp.asarray(rng.normal(0, 1.0, (S, 3)), jnp.float32)
    X0 = X_true + jnp.asarray(rng.normal(0, 1.0, (L, 3)), jnp.float32)
    # keep pose 0 at truth (gauge anchor)
    R0 = R0.at[0].set(jnp.eye(3))
    t0 = t0.at[0].set(jnp.zeros(3))
    return (R_true, t_true, X_true), (R0, t0, X0), (obs_s, p, obs_w)


def test_reference_ba_converges():
    (Rt, tt, Xt), (R0, t0, X0), (obs_s, p, w) = _make_ba_problem(noise=0.0)
    res = bundle_adjust_reference(R0, t0, X0, obs_s, p, w, iters=10)
    assert float(res.rms) < 1e-4, float(res.rms)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(tt), atol=0.05)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(Rt), atol=1e-3)


def test_distributed_ba_matches_reference():
    (Rt, tt, Xt), (R0, t0, X0), (obs_s, p, w) = _make_ba_problem(noise=0.01)
    mesh = make_mesh(pixel_tiles=1, map_blocks=8)
    ref = bundle_adjust_reference(R0, t0, X0, obs_s, p, w, iters=8)
    dist = distributed_bundle_adjust(R0, t0, X0, obs_s, p, w, mesh, iters=8)
    # identical math, different reduction order: tight but not bitwise
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(ref.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dist.R), np.asarray(ref.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist.X), np.asarray(ref.X), atol=1e-3)
    np.testing.assert_allclose(float(dist.rms), float(ref.rms), rtol=1e-3)
    # and both near truth
    np.testing.assert_allclose(np.asarray(dist.t), np.asarray(tt), atol=0.2)


def test_distributed_ba_on_2d_mesh():
    """BA on the map_block axis of a 2x4 mesh (both axes populated)."""
    (Rt, tt, Xt), (R0, t0, X0), (obs_s, p, w) = _make_ba_problem(
        S=3, L=32, noise=0.0, seed=1
    )
    mesh = make_mesh(pixel_tiles=4, map_blocks=2)
    res = distributed_bundle_adjust(R0, t0, X0, obs_s, p, w, mesh, iters=8)
    assert float(res.rms) < 1e-4
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(tt), atol=0.05)


def test_sharded_unwrap_matches_unsharded():
    """Halo-exchange unwrap == unsharded fixed-iteration unwrap when
    repairs do not chain across a tile border within one sweep."""
    from slr.codec.unwrap import spatial_quality_unwrap
    from slr.dist import sharded_unwrap

    rng = np.random.default_rng(2)
    H, W = 64, 128
    Phi = jnp.asarray(
        np.linspace(0, 40, W)[None, :] + 0.05 * rng.normal(size=(H, W)),
        jnp.float32,
    )
    bad = np.zeros((H, W), bool)
    bad[rng.integers(1, H - 1, 50), rng.integers(1, W - 1, 50)] = True
    Phi_n = jnp.where(jnp.asarray(bad), Phi + 2 * jnp.pi * 2, Phi)
    q = jnp.asarray(np.where(bad, 0.05, 1.0), jnp.float32)
    mask = jnp.ones((H, W), bool)

    ref = spatial_quality_unwrap(Phi_n, q, mask, iters=6)
    mesh = make_mesh(pixel_tiles=8, map_blocks=1)
    out = sharded_unwrap(Phi_n, q, mask, mesh, iters=6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("ee", [1, 3, 8])
def test_sharded_unwrap_halo_fusion_exact(ee):
    """Fused halo exchanges (h sweeps per exchange, VERDICT r4 next #4)
    must be EXACT vs the unsharded reference for any exchange_every —
    the stale front in an h-wide halo never reaches the tile interior
    within h sweeps."""
    from slr.codec.unwrap import spatial_quality_unwrap
    from slr.dist import sharded_unwrap

    rng = np.random.default_rng(5)
    H, W = 64, 128
    Phi = jnp.asarray(
        np.linspace(0, 40, W)[None, :] + 0.05 * rng.normal(size=(H, W)),
        jnp.float32,
    )
    bad = np.zeros((H, W), bool)
    bad[rng.integers(1, H - 1, 60), rng.integers(1, W - 1, 60)] = True
    Phi_n = jnp.where(jnp.asarray(bad), Phi + 2 * jnp.pi * 2, Phi)
    q = jnp.asarray(np.where(bad, 0.05, 1.0), jnp.float32)
    mask = jnp.ones((H, W), bool)

    ref = spatial_quality_unwrap(Phi_n, q, mask, iters=8)
    mesh = make_mesh(pixel_tiles=4, map_blocks=2)
    out = sharded_unwrap(Phi_n, q, mask, mesh, iters=8, exchange_every=ee)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
