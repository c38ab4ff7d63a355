"""Pixel-tile-sharded reconstruction pipeline (shard_map over the mesh).

SURVEY.md E4 distributed: frames enter sharded over rows (pixel_tile
axis); decode/unwrap/triangulate are embarrassingly parallel per row
except the spatial unwrap, whose tile coupling is handled by halo
exchange + masked propagation (the per-iteration exchange keeps the
result close to the unsharded fixed-iteration reference — exact when
repairs do not chain across a tile border within one call).

The per-shard decode runs the PRODUCTION fused Pallas kernel
(slr.kernels.fused_decode_triangulate) whenever the pattern config
supports it, so the scale-out path and the single-chip fast path are the
same code — the kernel takes the shard's global row offset so the camera
model sees global pixel coordinates. Configs the kernel does not cover
(no inverses / no phase) fall back to the pure-JAX decode_stack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slr.codec.patterns import decode_stack
from slr.codec.unwrap import propagation_step
from slr.config import DecodeConfig, PatternConfig
from slr.dist.halo import halo_exchange_rows
from slr.geom.camera import Camera
from slr.geom.triangulate import triangulate_plane
from slr.kernels.fused_scan import fused_decode_triangulate


def _halo_unwrap(Phi_l, q_l, m_l, iters: int, axis: str = "pixel_tile",
                 exchange_every: int = 4):
    """Quality-repair sweeps on a row shard, halo-FUSED (VERDICT r4 next
    #4): a halo of width h buys h propagation sweeps per exchange — the
    propagation stencil moves information one row per sweep, so after j
    sweeps only the outermost j halo rows are stale, and the stale front
    never reaches the tile interior within h sweeps. Result is EXACT vs
    per-iteration exchange (and vs unsharded, asserted in test_dist).
    The three arrays ride ONE ppermute payload (concatenated along W),
    so a (iters=8, h=4) call issues 4 collectives instead of 48 — the
    fix for pixel-tile latency sharding being launch-bound at N=8.
    Redundant border-row compute is the price: (1 + 2h/rows_per_shard)x,
    ~6% at 128-row shards. Shared by sharded_unwrap and
    sharded_reconstruct (single source)."""
    q_l = jnp.where(m_l, q_l, 0.0)
    m_f = m_l.astype(jnp.float32)
    W = Phi_l.shape[1]
    if exchange_every < 1:
        raise ValueError(f"exchange_every must be >= 1, got "
                         f"{exchange_every}")
    # the halo cannot exceed the shard height (a thinner shard just
    # exchanges more often — still exact)
    exchange_every = min(exchange_every, max(1, Phi_l.shape[0]))
    done = 0
    while done < iters:
        h = min(exchange_every, iters - done)
        done += h
        packed = jnp.concatenate([Phi_l, q_l, m_f], axis=1)  # (Hl, 3W)
        ph = halo_exchange_rows(packed, axis, h)
        Ph_h, q_h, m_hf = ph[:, :W], ph[:, W:2 * W], ph[:, 2 * W:]
        m_h = m_hf > 0.5
        Ph_h, q_h = jax.lax.fori_loop(
            0, h, lambda _, st: propagation_step(st[0], st[1], m_h),
            (Ph_h, q_h))
        Phi_l, q_l = Ph_h[h:-h], q_h[h:-h]
    return Phi_l


def sharded_unwrap(Phi, quality, mask, mesh: Mesh, iters: int = 8,
                   exchange_every: int = 4):
    """Quality-guided repair with the image row-sharded over pixel_tile.
    ``exchange_every`` = propagation sweeps per halo exchange (halo width
    grows to match; results are exact for any value)."""

    fn = jax.shard_map(
        partial(_halo_unwrap, iters=iters, exchange_every=exchange_every),
        mesh=mesh,
        in_specs=(P("pixel_tile"), P("pixel_tile"), P("pixel_tile")),
        out_specs=P("pixel_tile"),
        check_vma=False,
    )
    return fn(Phi, quality, mask)


def sharded_reconstruct(
    frames,                  # (F, H, W), H divisible by n_pixel_tiles
    cam: Camera,
    proj: Camera,
    cfg: PatternConfig,
    dec: DecodeConfig,
    mesh: Mesh,
    spatial_iters: int = 0,
):
    """Full decode -> unwrap -> triangulate with rows sharded on
    pixel_tile. Returns (points (H,W,3), mask, x_p, quality) with the
    same sharding. Row indices are offset per shard so the camera model
    sees global pixel coordinates.
    """
    H = frames.shape[1]
    n_tiles = mesh.shape["pixel_tile"]
    rows_per = H // n_tiles
    use_kernel = cfg.use_inverse and cfg.phase_steps > 0

    def local(frames_l):
        tile = jax.lax.axis_index("pixel_tile")
        row0 = (tile * rows_per).astype(jnp.float32)
        if use_kernel:
            out = fused_decode_triangulate(
                frames_l, cam, proj, cfg, dec, row_offset=row0
            )
            x_p, mask, quality = out.x_p, out.mask > 0.5, out.quality
            pts = jnp.moveaxis(out.points, 0, -1)
        else:
            res = decode_stack(frames_l, cfg, dec)
            x_p, mask, quality = res.x_p, res.mask, res.quality
            pts = None
        if spatial_iters:
            Phi = x_p * (2.0 * jnp.pi / cfg.fringe_pitch)
            Phi = _halo_unwrap(Phi, quality, mask, spatial_iters)
            x_p = Phi * (cfg.fringe_pitch / (2.0 * jnp.pi))
            pts = None  # x_p changed: re-triangulate below
        if pts is None:
            h_l, w = x_p.shape
            v = jax.lax.broadcasted_iota(jnp.float32, (h_l, w), 0) + row0
            u = jax.lax.broadcasted_iota(jnp.float32, (h_l, w), 1)
            pts, _ = triangulate_plane(cam, proj, u, v, x_p)
        return pts, mask, x_p, quality

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "pixel_tile", None),),
        out_specs=(P("pixel_tile"),) * 4,
        check_vma=False,
    )
    return fn(frames)
