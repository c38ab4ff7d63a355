"""Data-parallel batched reconstruction (the DP row of SURVEY.md 3.2).

A batch of scans (pattern-set stacks) is a pure map — no gradients, no
collectives — so DP is a NamedSharding on the leading batch axis over the
``map_block`` mesh axis; XLA runs each shard's fused pipeline locally with
zero communication. Combined with pixel_tile sharding inside each scan
this is the full 2-axis layout of the build.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.pipeline.reconstruct import reconstruct_dense, reconstruct_scan


def batched_reconstruct(
    frames_batch,             # (B, F, H, W), B divisible by map_blocks
    cam,
    proj,
    cfg: PatternConfig,
    dec: DecodeConfig = DecodeConfig(),
    rec: ReconstructConfig = ReconstructConfig(),
    mesh: Mesh | None = None,
    fused: bool = True,
):
    """vmap the single-scan pipeline over the batch; when a mesh is given
    the batch axis is sharded over map_block (scan-level data parallel).

    Returns a ScanCloud pytree with leading batch dim (B, ...).
    """
    f = reconstruct_dense if fused else reconstruct_scan

    def one(frames):
        return f(frames, cam, proj, cfg, dec, rec)

    fn = jax.jit(jax.vmap(one))
    if mesh is not None:
        sharding = NamedSharding(mesh, P("map_block"))
        frames_batch = jax.device_put(frames_batch, sharding)
        out_sharding = NamedSharding(mesh, P("map_block"))
        fn = jax.jit(jax.vmap(one), out_shardings=out_sharding)
    return fn(frames_batch)
