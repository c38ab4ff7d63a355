"""Voxel-grid utilities: downsampling / fusion merge (SURVEY.md comp. 17)
and the voxel-hash bucketing used as the ICP alternative to brute-force NN
(SURVEY.md section 9 "static voxel-grid hashing with bounded bucket
occupancy").

All fixed-shape: under jit the number of occupied voxels is data-dependent,
so results come back as a fixed-capacity buffer + validity mask; hosts
compact on export.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(points, valid, voxel_size: float, capacity: int,
                     attrs=None):
    """Average points (and optional attrs) falling in the same voxel.

    points (N,3), valid (N,) bool -> (out_pts (capacity,3),
    out_valid (capacity,), out_attrs). Voxels are assigned slots by a
    sort-by-id + segment boundary trick: stable, deterministic, exact when
    the number of occupied voxels <= capacity (extra voxels are dropped,
    counted in the last return value).
    """
    N = points.shape[0]
    v = jnp.floor(points / voxel_size).astype(jnp.int32)
    # order-preserving 1-D id (bounded coordinates assumed: +-2^9 voxels)
    vid = (
        (v[:, 0] & 0x3FF) | ((v[:, 1] & 0x3FF) << 10) | ((v[:, 2] & 0x3FF) << 20)
    )
    # invalid sentinel uses bit 30, above the 30 coordinate bits, so no
    # real voxel id (e.g. (-1,-1,-1) -> 0x3FFFFFFF) can collide with it
    vid = jnp.where(valid, vid, jnp.int32(0x40000000))
    order = jnp.argsort(vid)
    vid_s = vid[order]
    pts_s = points[order]
    val_s = valid[order]
    # segment starts where the id changes
    first = jnp.concatenate([jnp.array([True]), vid_s[1:] != vid_s[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1          # (N,) segment idx
    seg = jnp.where(val_s, seg, capacity)                   # overflow bucket
    seg_c = jnp.clip(seg, 0, capacity)

    def segsum(x):
        return jax.ops.segment_sum(x, seg_c, num_segments=capacity + 1)[:capacity]

    cnt = segsum(val_s.astype(jnp.float32))
    out_pts = segsum(pts_s * val_s[:, None].astype(jnp.float32))
    out_valid = cnt > 0
    out_pts = out_pts / jnp.where(cnt[:, None] > 0, cnt[:, None], 1.0)
    out_attrs = None
    if attrs is not None:
        a_s = attrs[order]
        out_attrs = segsum(a_s * val_s[:, None].astype(jnp.float32))
        out_attrs = out_attrs / jnp.where(cnt[:, None] > 0, cnt[:, None], 1.0)
    n_voxels = jnp.sum(first & val_s)
    return out_pts, out_valid, out_attrs, n_voxels
