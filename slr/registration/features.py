"""Coarse registration: FPFH-style descriptors + vectorized RANSAC.

SURVEY.md component 14 / section 4.6. The reference matches OpenCV image
features + RANSAC; point clouds from structured light have reliable
geometry but viewpoint-dependent texture, so the build uses geometric
descriptors computed on-device:

- keypoints: strided subsample of valid points (organized grids make
  uniform subsampling well-distributed);
- descriptor: simplified FPFH — histograms of the Darboux-frame angles
  (alpha, phi, theta) over the k nearest neighbours, 11 bins each (33-d),
  k-NN done with the same tiled-matmul search as ICP;
- matching: mutual nearest descriptors via one (K1, K2) distance matmul;
- RANSAC: all hypotheses evaluated in parallel with vmap — sample 3
  matches, Kabsch-solve the rigid fit, count inliers, argmax. No
  data-dependent control flow, so the whole aligner jit-compiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _knn(query, target, k: int, tile: int = 2048):
    """k nearest neighbours via tiled distance blocks + top-k merge.

    Returns idx (Q,k). Exact within each tile-merge (standard streaming
    top-k: keep best k while scanning tiles).
    """
    Q, T = query.shape[0], target.shape[0]
    tile = min(tile, T)
    pad = (-T) % tile
    tgt = jnp.concatenate([target, jnp.full((pad, 3), 1e9, target.dtype)])
    n_tiles = tgt.shape[0] // tile
    q2 = jnp.sum(query * query, axis=1)

    def body(carry, inp):
        best_d, best_i = carry                     # (Q,k) each
        t_blk, base = inp
        t2 = jnp.sum(t_blk * t_blk, axis=1)
        d2 = q2[:, None] + t2[None, :] - 2.0 * (query @ t_blk.T)
        idx = jnp.arange(tile, dtype=jnp.int32)[None, :] + base
        # merge current best with this tile, keep k smallest
        d_all = jnp.concatenate([best_d, d2], axis=1)
        i_all = jnp.concatenate([best_i, jnp.broadcast_to(idx, d2.shape)], axis=1)
        neg_d, sel = jax.lax.top_k(-d_all, k)
        return (-neg_d, jnp.take_along_axis(i_all, sel, axis=1)), None

    bases = (jnp.arange(n_tiles) * tile).astype(jnp.int32)
    init = (
        jnp.full((Q, k), jnp.inf, jnp.float32),
        jnp.zeros((Q, k), jnp.int32),
    )
    (d, i), _ = jax.lax.scan(
        body, init, (tgt.reshape(n_tiles, tile, 3), bases)
    )
    return i, d


def _spfh(points, normals, idx, bins: int):
    """Simple point-feature histogram per point over its knn (N, 3*bins)."""
    nb_p = points[idx]                     # (N,k,3)
    nb_n = normals[idx]
    p = points[:, None, :]
    n = normals[:, None, :]
    d = nb_p - p
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    self_nb = dist[..., 0] < 1e-9          # knn of self includes self
    d_unit = d / jnp.where(dist < 1e-9, 1.0, dist)
    # Darboux frame u=n, v=d x u, w=u x v
    u = jnp.broadcast_to(n, nb_p.shape)
    v = jnp.cross(d_unit, u)
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.where(vn < 1e-9, 1.0, vn)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * nb_n, axis=-1)                     # [-1,1]
    phi = jnp.sum(u * d_unit, axis=-1)                     # [-1,1]
    theta = jnp.arctan2(jnp.sum(w * nb_n, axis=-1), jnp.sum(u * nb_n, axis=-1))
    valid = (~self_nb).astype(jnp.float32)                 # drop self pair

    def hist(x, lo, hi):
        xb = jnp.clip((x - lo) / (hi - lo) * bins, 0, bins - 1e-3)
        b = jnp.floor(xb).astype(jnp.int32)                 # (N,k)
        oh = jax.nn.one_hot(b, bins, dtype=jnp.float32)
        return jnp.sum(oh * valid[..., None], axis=1)       # (N,bins)

    return jnp.concatenate(
        [hist(alpha, -1.0, 1.0), hist(phi, -1.0, 1.0),
         hist(theta, -jnp.pi, jnp.pi)],
        axis=1,
    )


@partial(jax.jit, static_argnames=("k", "bins"))
def fpfh_features(points, normals, k: int = 16, bins: int = 11):
    """FPFH descriptors (N, 3*bins), L2-normalized.

    True two-pass FPFH (Rusu et al.): SPFH per point, then
    FPFH(p) = SPFH(p) + mean_{q in knn(p)} SPFH(q) / ||p-q|| — the
    neighbourhood aggregation is what makes the descriptor discriminative
    on smooth surfaces (a single-pass SPFH of a plane/sphere patch is
    nearly constant, which made matching collapse on rendered scans)."""
    idx, d2 = _knn(points, points, k=k)
    s = _spfh(points, normals, idx, bins)
    # distance-weighted neighbour aggregation; exclude self (d2 ~ 0)
    wd = jnp.where(d2 > 1e-9, 1.0 / jnp.sqrt(jnp.maximum(d2, 1e-9)), 0.0)
    f = s + jnp.sum(s[idx] * wd[..., None], axis=1) / (
        jnp.sum(wd, axis=1, keepdims=True) + 1e-9)
    return f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-9)


def _kabsch(P, Q, w):
    """Weighted rigid fit Q ~ R P + t (Kabsch/Umeyama, no scale)."""
    ws = jnp.sum(w) + 1e-9
    cp = jnp.sum(P * w[:, None], axis=0) / ws
    cq = jnp.sum(Q * w[:, None], axis=0) / ws
    P0, Q0 = P - cp, Q - cq
    H = (P0 * w[:, None]).T @ Q0
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    D = D.at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    return R, t


@partial(jax.jit, static_argnames=("n_iters",))
def ransac_align(
    src_pts, src_feat, tgt_pts, tgt_feat,
    n_iters: int = 256,
    inlier_dist: float = 5.0,
    key=None,
):
    """Feature-matched RANSAC rigid alignment src -> tgt.

    Returns (R, t, inlier_frac). All n_iters hypotheses evaluated in
    parallel (vmap); the best by inlier count is refit on its inliers.

    Robustness machinery (all fixed-shape, jit-compiled):
    - matches are mutual nearest descriptors, weighted by the ratio-test
      margin (best minus second-best similarity) so ambiguous matches on
      self-similar patches rarely seed a hypothesis;
    - every 3-sample hypothesis must pass the rigid length-consistency
      tuple test (pairwise distances agree between the two clouds within
      max(10%, inlier_dist)) before its Kabsch fit counts — wrong-match
      triplets are rejected wholesale, which multiplies the effective
      iteration budget (the trick behind fast-global-registration/TEASER
      style matchers);
    - the winner is refit with two IRLS rounds on its inlier set.

    Note the inlier radius: matched keypoints are distinct subsample
    draws of the surface, so even a perfect alignment leaves them ~one
    point-spacing apart — inlier_dist must be a few spacings, not the
    target accuracy (ICP owns the fine alignment).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    # mutual nearest matching in descriptor space (one matmul)
    sim = src_feat @ tgt_feat.T                       # cosine (unit feats)
    top2, top2_i = jax.lax.top_k(sim, 2)              # (S,2)
    fwd = top2_i[:, 0]                                # (S,)
    bwd = jnp.argmax(sim, axis=0)                     # (T,)
    mutual = bwd[fwd] == jnp.arange(src_pts.shape[0])
    margin = jnp.maximum(top2[:, 0] - top2[:, 1], 0.0)
    match_w = mutual.astype(jnp.float32) * margin
    P = src_pts
    Q = tgt_pts[fwd]
    d2_thresh = inlier_dist * inlier_dist
    probs = match_w + 1e-5
    probs = probs / jnp.sum(probs)

    def hypothesis(k):
        sel = jax.random.choice(k, P.shape[0], shape=(3,), p=probs)
        Ps, Qs = P[sel], Q[sel]
        # rigid length-consistency tuple test on the 3 pairwise edges
        ip = jnp.array([0, 0, 1])
        jp = jnp.array([1, 2, 2])
        dp = jnp.linalg.norm(Ps[ip] - Ps[jp], axis=1)
        dq = jnp.linalg.norm(Qs[ip] - Qs[jp], axis=1)
        tol = jnp.maximum(0.1 * jnp.maximum(dp, dq), inlier_dist)
        consistent = jnp.all(jnp.abs(dp - dq) < tol)
        # degenerate (near-collinear) samples fit any rotation: reject
        area2 = jnp.linalg.norm(
            jnp.cross(Ps[1] - Ps[0], Ps[2] - Ps[0]))
        good = consistent & (area2 > 1e-3)
        R, t = _kabsch(Ps, Qs, jnp.ones(3))
        moved = P @ R.T + t
        d2 = jnp.sum((moved - Q) ** 2, axis=1)
        inliers = (d2 < d2_thresh) & mutual
        return jnp.where(good, jnp.sum(inliers), -1), R, t

    keys = jax.random.split(key, n_iters)
    counts, Rs, ts = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]
    # IRLS refit on the winner's inliers (two rounds tighten the fit
    # enough that the final inlier set is stable)
    w = match_w
    for _ in range(2):
        moved = P @ R.T + t
        w = ((jnp.sum((moved - Q) ** 2, axis=1) < d2_thresh) & mutual
             ).astype(jnp.float32)
        R, t = _kabsch(P, Q, w + 1e-9 * match_w)
    inl = jnp.sum(w) / (jnp.sum(mutual) + 1e-9)
    return R, t, inl
