"""Chessboard corner detection + sub-pixel refinement + grid ordering.

The image-based front end of camera calibration (SURVEY.md component 9;
the role of cv::findChessboardCorners + cornerSubPix in the reference,
with cv2 kept as the parity oracle in tests only).

TPU-native split: the dense work (Gaussian smoothing, Hessian saddle
response, non-max suppression, windowed gradient-orthogonality sub-pixel
refinement) is jitted JAX over the whole image / all corners at once; the
tiny combinatorial step (ordering ~54 detected points into a cols x rows
grid via a hull-quad homography) is host-side numpy — same division the
reference makes between per-pixel loops and control logic.

Corner model: chessboard X-junctions are saddle points of the smoothed
intensity, so the detector peaks ``Ixy^2 - Ixx*Iyy`` (positive iff the
Hessian is indefinite), which is edge-free by construction: a straight
edge has one zero principal curvature and scores ~0.

Sub-pixel model (same normal equations cv2.cornerSubPix solves): around a
saddle q every gradient g(p) is orthogonal to (p - q), so q solves
``(sum w g g^T) q = sum w g g^T p`` over a window; iterate re-centering.

Assumes the full board is visible in the image (cv2 requires the same).
"""

from __future__ import annotations

from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- dense part

def _smooth(img, sigma: float):
    r = int(np.ceil(3.0 * sigma))
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    dn = ("NCHW", "OIHW", "NCHW")
    out = img[None, None]
    out = jax.lax.conv_general_dilated(
        out, k.reshape(1, 1, 1, -1), (1, 1), [(0, 0), (r, r)],
        dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(
        out, k.reshape(1, 1, -1, 1), (1, 1), [(r, r), (0, 0)],
        dimension_numbers=dn)
    return out[0, 0]


def chess_corner_response(img, sigma: float = 2.0):
    """Saddle-point response Ixy^2 - Ixx*Iyy of the smoothed image."""
    g = _smooth(img, sigma)
    pad = jnp.pad(g, 1, mode="edge")
    Ixx = pad[1:-1, 2:] - 2.0 * g + pad[1:-1, :-2]
    Iyy = pad[2:, 1:-1] - 2.0 * g + pad[:-2, 1:-1]
    Ixy = 0.25 * (pad[2:, 2:] - pad[2:, :-2] - pad[:-2, 2:] + pad[:-2, :-2])
    return jnp.maximum(Ixy * Ixy - Ixx * Iyy, 0.0)


@partial(jax.jit, static_argnames=("k", "nms_radius", "sigma"))
def corner_candidates(img, k: int, nms_radius: int = 5, sigma: float = 2.0):
    """Top-k saddle peaks after non-max suppression.

    Returns (xy (k,2) float32, score (k,)); low-score rows are filler
    (score ~0) for images with fewer true corners than k.
    """
    resp = chess_corner_response(img, sigma)
    m = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        (2 * nms_radius + 1, 2 * nms_radius + 1), (1, 1), "SAME")
    peaks = jnp.where((resp == m) & (resp > 0.05 * jnp.max(resp)), resp, 0.0)
    score, idx = jax.lax.top_k(peaks.reshape(-1), k)
    H, W = img.shape
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), score


@partial(jax.jit, static_argnames=("win", "iters", "sigma"))
def refine_subpix(img, pts, win: int = 5, iters: int = 4,
                  sigma: float = 1.0):
    """Gradient-orthogonality sub-pixel refinement of corner estimates.

    pts (N,2) in (x, y); window is (2*win+1)^2 with Gaussian weighting.
    """
    g = _smooth(img, sigma)
    pad = jnp.pad(g, 1, mode="edge")
    gx = 0.5 * (pad[1:-1, 2:] - pad[1:-1, :-2])
    gy = 0.5 * (pad[2:, 1:-1] - pad[:-2, 1:-1])
    H, W = img.shape
    off = jnp.arange(-win, win + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    wgt = jnp.exp(-(ox ** 2 + oy ** 2) / (2.0 * (0.6 * win) ** 2))

    def one(q0):
        def step(q, _):
            cx = jnp.clip(jnp.round(q[0]).astype(jnp.int32), win, W - win - 1)
            cy = jnp.clip(jnp.round(q[1]).astype(jnp.int32), win, H - win - 1)
            sz = (2 * win + 1, 2 * win + 1)
            px = jax.lax.dynamic_slice(gx, (cy - win, cx - win), sz)
            py = jax.lax.dynamic_slice(gy, (cy - win, cx - win), sz)
            Xc = cx.astype(jnp.float32) + ox
            Yc = cy.astype(jnp.float32) + oy
            a = jnp.sum(wgt * px * px)
            b = jnp.sum(wgt * px * py)
            c = jnp.sum(wgt * py * py)
            bx = jnp.sum(wgt * (px * px * Xc + px * py * Yc))
            by = jnp.sum(wgt * (px * py * Xc + py * py * Yc))
            det = a * c - b * b
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            qx = (c * bx - b * by) / det
            qy = (a * by - b * bx) / det
            q_new = jnp.stack([qx, qy])
            # clamp the step: a bad window cannot fling the corner away
            q_new = jnp.clip(q_new, q - win, q + win)
            return q_new, None

        q, _ = jax.lax.scan(step, q0, None, length=iters)
        return q

    return jax.vmap(one)(pts.astype(jnp.float32))


# ------------------------------------------------------------- ordering part

def _dlt_homography(src, dst):
    """Least-squares homography src -> dst (numpy, normalized DLT)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)

    def normalize(p):
        c = p.mean(0)
        s = np.sqrt(2.0) / max(np.linalg.norm(p - c, axis=1).mean(), 1e-9)
        T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])
        return (p - c) * s, T

    sn, Ts = normalize(src)
    dn, Td = normalize(dst)
    n = len(src)
    A = np.zeros((2 * n, 9))
    A[0::2, 0:2] = sn
    A[0::2, 2] = 1
    A[0::2, 6:8] = -dn[:, 0:1] * sn
    A[0::2, 8] = -dn[:, 0]
    A[1::2, 3:5] = sn
    A[1::2, 5] = 1
    A[1::2, 6:8] = -dn[:, 1:2] * sn
    A[1::2, 8] = -dn[:, 1]
    _, _, vt = np.linalg.svd(A)
    Hn = vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


def _apply_h(H, p):
    q = np.c_[p, np.ones(len(p))] @ H.T
    return q[:, :2] / q[:, 2:3]


def _hull_quad(pts):
    """4 extreme points of the detected cloud, in convex (cyclic) order."""
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    hv = hull.vertices  # ccw
    if len(hv) == 4:
        return hv
    best, best_area = None, -1.0
    for comb in combinations(range(len(hv)), 4):
        q = pts[hv[list(comb)]]
        # shoelace area of the cyclic quad (hull order preserved)
        x, y = q[:, 0], q[:, 1]
        area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        if area > best_area:
            best_area, best = area, hv[list(comb)]
    return np.asarray(best)


def order_corner_grid(pts, cols: int, rows: int):
    """Order detected corner candidates into the cols x rows grid.

    pts (K,2) numpy, K >= cols*rows (extra spurious candidates allowed).
    Tries the 8 assignments of the detected hull quad to the ideal grid
    quad (4 cyclic shifts x 2 orientations), keeps the homography whose
    grid prediction NN-matches the detections best, then refits on all
    matches. Returns (ordered (cols*rows, 2), rms residual in px).
    """
    pts = np.asarray(pts, np.float64)
    quad_idx = _hull_quad(pts)
    quad = pts[quad_idx]
    ideal_quad = np.array(
        [[0, 0], [cols - 1, 0], [cols - 1, rows - 1], [0, rows - 1]],
        np.float64)
    jj, ii = np.meshgrid(np.arange(cols), np.arange(rows))
    grid = np.c_[jj.ravel(), ii.ravel()].astype(np.float64)

    def match(H):
        pred = _apply_h(H, grid)
        d = np.linalg.norm(pred[:, None] - pts[None], axis=-1)
        nn = d.argmin(1)
        return nn, d[np.arange(len(grid)), nn]

    centre = np.array([[(cols - 1) / 2.0, (rows - 1) / 2.0]])
    eps = 0.1

    def jac_det(H):
        dx = _apply_h(H, centre + [eps, 0]) - _apply_h(H, centre - [eps, 0])
        dy = _apply_h(H, centre + [0, eps]) - _apply_h(H, centre - [0, eps])
        return dx[0, 0] * dy[0, 1] - dx[0, 1] * dy[0, 0]

    best = None
    for flip in (1, -1):
        for shift in range(4):
            q = quad[::flip]
            q = np.roll(q, shift, axis=0)
            H = _dlt_homography(ideal_quad, q)
            # a mirror assignment fits a homography exactly as well as the
            # true one (reflections are homographies) but flips the plane's
            # handedness; a really-projected board face never does.
            # Convention: board x cross y points along the outward normal,
            # so the image-space Jacobian determinant is positive.
            if jac_det(H) <= 0:
                continue
            nn, dist = match(H)
            res = np.mean(dist)
            # a valid assignment matches each grid node to a distinct point
            if len(np.unique(nn)) != len(grid):
                res += 1e6
            if best is None or res < best[0]:
                best = (res, nn)
    if best is None:
        raise ValueError("chessboard grid ordering failed: no orientation-"
                         "preserving hull assignment")
    _, nn = best
    # refit on all matches for a tighter prediction, then rematch
    H = _dlt_homography(grid, pts[nn])
    nn, dist = match(H)
    if len(np.unique(nn)) != len(grid):
        raise ValueError("chessboard grid ordering failed: ambiguous match")
    return pts[nn].astype(np.float32), float(np.sqrt((dist ** 2).mean()))


def _fix_checker_orientation(img_np, ordered, cols: int, rows: int):
    """Resolve the 180-degree grid ambiguity with the checker colors.

    Convention (matches slr.synth.board): the square on the (+x, +y) side
    of corner (0, 0) — board cell (0, 0) — is LIGHT. The grid itself is
    symmetric under 180-degree rotation, so geometry alone cannot pick
    the origin; the cell colors break the tie (the same trick cv2 uses).
    """
    H = _dlt_homography(
        np.c_[np.meshgrid(np.arange(cols), np.arange(rows))[0].ravel(),
              np.meshgrid(np.arange(cols), np.arange(rows))[1].ravel()],
        ordered)
    probe = _apply_h(H, np.array([[0.5, 0.5],
                                  [cols - 1.5, rows - 1.5]], np.float64))
    h, w = img_np.shape
    xy = np.clip(np.round(probe).astype(int), 0, [w - 1, h - 1])
    i0 = img_np[xy[0, 1], xy[0, 0]]
    i1 = img_np[xy[1, 1], xy[1, 0]]
    if i0 < i1:          # origin cell must be the lighter one
        return ordered[::-1]
    return ordered


def detect_chessboard(img, cols: int, rows: int, extra: int = 12,
                      sigma: float = 2.0, win: int = 5):
    """Full detection: saddle peaks -> grid ordering -> sub-pixel refine.

    Returns (corners (cols*rows, 2) float32 in cv2 ordering (row-major,
    x first), grid-fit rms). Raises ValueError if no coherent grid found.
    """
    img = jnp.asarray(img, jnp.float32)
    K = cols * rows
    cand, score = corner_candidates(img, K + extra, sigma=sigma)
    cand_np = np.asarray(cand)
    score_np = np.asarray(score)
    live = score_np > 0
    if live.sum() < K:
        raise ValueError(
            f"found only {int(live.sum())} corner candidates, need {K}")
    # X-junction saddles score several times higher than the T-junction
    # saddles at the squares/margin boundary; filtering relative to the
    # K-th strongest keeps the hull quad on the true corner grid. Fall
    # back to looser candidate sets if the strict one fails.
    kth = np.sort(score_np[live])[::-1][K - 1]
    subsets = [
        cand_np[live & (score_np >= 0.5 * kth)],
        cand_np[np.argsort(score_np)[::-1][:K]],
        cand_np[live],
    ]
    err = None
    for sub in subsets:
        if len(sub) < K:
            continue
        try:
            ordered, grid_rms = order_corner_grid(sub, cols, rows)
        except ValueError as e:
            err = e
            continue
        ordered = _fix_checker_orientation(np.asarray(img), ordered,
                                           cols, rows)
        refined = refine_subpix(img, jnp.asarray(ordered), win=win)
        return np.asarray(refined), grid_rms
    raise err if err is not None else ValueError("grid ordering failed")
