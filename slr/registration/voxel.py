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


@partial(jax.jit, static_argnames=("bucket_cap",))
def build_voxel_hash(points, valid, voxel_size: float, bucket_cap: int = 8):
    """Static voxel-grid hash with bounded bucket occupancy.

    Returns (table (n_vox_capacity=N, bucket_cap) int32 point indices,
    -1 padded; vids_sorted; unique voxel ids as a sorted array for
    searchsorted lookup). All fixed shapes: the table has one row per
    *potential* voxel (= one per input point upper bound), rows addressed
    through searchsorted on the sorted unique ids.
    """
    N = points.shape[0]
    v = jnp.floor(points / voxel_size).astype(jnp.int32)
    vid = (
        (v[:, 0] & 0x3FF) | ((v[:, 1] & 0x3FF) << 10)
        | ((v[:, 2] & 0x3FF) << 20)
    )
    vid = jnp.where(valid, vid, jnp.int32(0x40000000))
    order = jnp.argsort(vid)
    vid_s = vid[order]
    # rank of each point within its voxel run
    first = jnp.concatenate([jnp.array([True]), vid_s[1:] != vid_s[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    run_start = jax.lax.cummax(jnp.where(first, jnp.arange(N), 0), axis=0)
    pos_in_run = jnp.arange(N) - run_start
    # scatter point indices into (N, bucket_cap) table rows addressed by seg
    table = jnp.full((N, bucket_cap), -1, jnp.int32)
    keep = pos_in_run < bucket_cap
    rows = jnp.where(keep, seg, N - 1)
    cols = jnp.clip(pos_in_run, 0, bucket_cap - 1)
    table = table.at[rows, cols].set(
        jnp.where(keep, order.astype(jnp.int32), -1), mode="drop"
    )
    # unique sorted ids per row (pad rows beyond n_unique with sentinel)
    row_ids = jnp.where(first, vid_s, jnp.int32(0x7FFFFFFF))
    row_ids = jnp.sort(row_ids)
    # rows were scattered by seg (0..n_unique-1) which matches the sorted
    # unique order, so row k of `table` corresponds to row_ids[k]
    return table, row_ids


@partial(jax.jit, static_argnames=("bucket_cap",))
def voxel_hash_nn(query, points, table, row_ids, voxel_size: float,
                  bucket_cap: int = 8):
    """Approximate-NN lookup in the 27-neighbourhood of each query's voxel.

    Exact whenever the true NN lies within one voxel (choose voxel_size
    >= max correspondence distance). Returns (idx (Q,), d2 (Q,)); idx -1
    when no candidate found. The TPU-native KD-tree replacement of
    SURVEY.md section 9 (bounded buckets, gather-only inner loop).
    """
    Q = query.shape[0]
    vq = jnp.floor(query / voxel_size).astype(jnp.int32)
    best_d2 = jnp.full((Q,), jnp.inf)
    best_i = jnp.full((Q,), -1, jnp.int32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                vv = vq + jnp.array([dx, dy, dz], jnp.int32)
                vid = (
                    (vv[:, 0] & 0x3FF) | ((vv[:, 1] & 0x3FF) << 10)
                    | ((vv[:, 2] & 0x3FF) << 20)
                )
                row = jnp.searchsorted(row_ids, vid)
                row = jnp.clip(row, 0, row_ids.shape[0] - 1)
                hit = row_ids[row] == vid
                cand = jnp.where(
                    hit[:, None], table[row], -1
                )                                    # (Q, bucket_cap)
                cpts = points[jnp.maximum(cand, 0)]  # (Q, cap, 3)
                d2 = jnp.sum((cpts - query[:, None, :]) ** 2, axis=-1)
                d2 = jnp.where(cand >= 0, d2, jnp.inf)
                j = jnp.argmin(d2, axis=1)
                dmin = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
                imin = jnp.take_along_axis(cand, j[:, None], 1)[:, 0]
                take = dmin < best_d2
                best_d2 = jnp.where(take, dmin, best_d2)
                best_i = jnp.where(take, imin, best_i)
    return best_i, best_d2


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
