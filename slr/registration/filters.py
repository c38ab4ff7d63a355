"""Point-cloud outlier filters — the scan-cleanup stage reference-class
scanners run between reconstruction and registration/fusion (SURVEY.md
component 13/17 neighborhood: "bounds filter", cloud cleanup before
merge).  The reference's per-point C++/PCL-style loops become fixed-shape
device kernels built on the voxel hash of slr/registration/voxel.py
(SURVEY.md §9: "NN search for ICP without KD-trees") — gather-only inner
loops, `lax.map` chunking to bound HBM, no dynamic shapes.

- `knn_mean_distance`: mean distance to the k nearest neighbors.
- `statistical_outlier_removal` (SOR): drop points whose mean k-NN
  distance exceeds mean + std_ratio * std of the cloud.
- `radius_outlier_removal` (ROR): drop points with fewer than
  `min_neighbors` inside `radius`.

Exactness: candidates come from the 27-voxel neighborhood, so results
are exact whenever the relevant neighbor distances are <= voxel_size
(asserted vs a scipy cKDTree oracle in tests/test_registration.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slr.registration.voxel import _INVALID_VID, _pack_vid, build_voxel_hash

_NBRS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)]


def _candidate_d2(q, qidx, points, table, row_ids, lo, voxel_size,
                  bucket_cap):
    """(Q,3) queries -> (Q, 27*cap) squared distances to voxel-hash
    candidates; self-matches and empty slots are +inf."""
    vq = jnp.floor(q / voxel_size).astype(jnp.int32)
    ones = jnp.ones((q.shape[0],), bool)
    outs = []
    for dx, dy, dz in _NBRS:
        vv = vq + jnp.array([dx, dy, dz], jnp.int32)
        vid = _pack_vid(vv, lo, ones)
        row = jnp.searchsorted(row_ids, vid)
        row = jnp.clip(row, 0, row_ids.shape[0] - 1)
        hit = (row_ids[row] == vid) & (vid != _INVALID_VID)
        cand = jnp.where(hit[:, None], table[row], -1)      # (Q, cap)
        cpts = points[jnp.maximum(cand, 0)]                 # (Q, cap, 3)
        d2 = jnp.sum((cpts - q[:, None, :]) ** 2, axis=-1)
        bad = (cand < 0) | (cand == qidx[:, None])
        outs.append(jnp.where(bad, jnp.inf, d2))
    return jnp.concatenate(outs, axis=1)


@partial(jax.jit, static_argnames=("k", "bucket_cap", "chunk"))
def knn_mean_distance(points, valid, voxel_size: float, k: int = 8,
                      bucket_cap: int = 16, chunk: int = 16384):
    """Mean distance from each point to its k nearest neighbors (within
    the 27-voxel neighborhood).  Invalid points and points with zero
    found neighbors return +inf.  Fixed shapes; chunked over queries."""
    N = points.shape[0]
    table, row_ids, lo = build_voxel_hash(points, valid, voxel_size, bucket_cap)
    pts_q = jnp.where(valid[:, None], points, 1e9)  # park invalid far away
    pad = (-N) % chunk
    q = jnp.pad(pts_q, ((0, pad), (0, 0)), constant_values=2e9)
    qi = jnp.pad(jnp.arange(N, dtype=jnp.int32), (0, pad),
                 constant_values=-2)

    def one_chunk(args):
        qc, qic = args
        d2 = _candidate_d2(qc, qic, points, table, row_ids, lo, voxel_size,
                           bucket_cap)
        kk = min(k, d2.shape[1])
        neg_top, _ = jax.lax.top_k(-d2, kk)       # k smallest d2
        dk2 = -neg_top
        fin = jnp.isfinite(dk2)
        cnt = jnp.sum(fin, axis=1)
        s = jnp.sum(jnp.sqrt(jnp.where(fin, dk2, 0.0)), axis=1)
        return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.inf)

    md = jax.lax.map(one_chunk, (q.reshape(-1, chunk, 3),
                                 qi.reshape(-1, chunk)))
    md = md.reshape(-1)[:N]
    return jnp.where(valid, md, jnp.inf)


@partial(jax.jit, static_argnames=("k", "bucket_cap", "chunk"))
def statistical_outlier_removal(points, valid, voxel_size: float,
                                k: int = 8, std_ratio: float = 2.0,
                                bucket_cap: int = 16, chunk: int = 16384):
    """PCL-style SOR: keep points whose mean k-NN distance is within
    mean + std_ratio * std over the cloud.  Returns the filtered bool
    mask (same shape as ``valid``)."""
    md = knn_mean_distance(points, valid, voxel_size, k=k,
                           bucket_cap=bucket_cap, chunk=chunk)
    fin = valid & jnp.isfinite(md)
    n = jnp.maximum(jnp.sum(fin), 1)
    m = jnp.where(fin, md, 0.0)
    mean = jnp.sum(m) / n
    var = jnp.sum(jnp.where(fin, (md - mean) ** 2, 0.0)) / n
    thresh = mean + std_ratio * jnp.sqrt(var)
    return fin & (md <= thresh)


@partial(jax.jit, static_argnames=("min_neighbors", "bucket_cap", "chunk"))
def radius_outlier_removal(points, valid, radius: float,
                           min_neighbors: int = 4, bucket_cap: int = 16,
                           chunk: int = 16384):
    """Keep points with >= min_neighbors others inside ``radius``.

    The voxel size equals ``radius`` so the 27-neighborhood provably
    covers the ball; counts saturate at 27*bucket_cap."""
    N = points.shape[0]
    table, row_ids, lo = build_voxel_hash(points, valid, radius, bucket_cap)
    pts_q = jnp.where(valid[:, None], points, 1e9)
    pad = (-N) % chunk
    q = jnp.pad(pts_q, ((0, pad), (0, 0)), constant_values=2e9)
    qi = jnp.pad(jnp.arange(N, dtype=jnp.int32), (0, pad),
                 constant_values=-2)
    r2 = radius * radius

    def one_chunk(args):
        qc, qic = args
        d2 = _candidate_d2(qc, qic, points, table, row_ids, lo, radius,
                           bucket_cap)
        return jnp.sum(d2 <= r2, axis=1)

    cnt = jax.lax.map(one_chunk, (q.reshape(-1, chunk, 3),
                                  qi.reshape(-1, chunk)))
    cnt = cnt.reshape(-1)[:N]
    return valid & (cnt >= min_neighbors)
