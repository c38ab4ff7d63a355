"""Two-camera structured-light reconstruction (SURVEY.md section 1: the
reference class supports "one or two cameras"; VERDICT r2 missing #5).

The classic two-camera layout: both cameras watch the scene, the projector
only supplies per-pixel *correspondence codes* — its calibration never
enters the triangulation, so projector distortion / drift cancels out
entirely. Requires a pattern config that codes BOTH projector axes
(``row_gray_bits > 0``) so each camera pixel decodes to a full projector
coordinate (x_p, y_p).

TPU-first correspondence: instead of the reference-class per-pixel search
along epipolar lines, we rendezvous in projector space with one scatter and
one gather — both dense, fixed-shape, VPU-friendly ops:

1. **splat** — every valid cam-2 pixel bilinearly splats moving-least-
   squares MOMENTS of its own image coordinates (u2, v2), weighted by
   decode quality, into a projector-resolution accumulation grid at its
   decoded (x_p, y_p).
2. **gather** — every valid cam-1 pixel reads the 4 neighbor cells at its
   own decoded (x_p, y_p), translates the moments to its query point, and
   solves a ridge-regularized 3x3 weighted linear fit u2(x_p, y_p),
   v2(x_p, y_p). A plain weighted *mean* is ~1 cam-px biased wherever a
   projector cell is only partially covered (occlusion boundaries, image
   borders): the mean sits at the covered portion's centroid, not at the
   query. The linear term extrapolates through that, and its residual is
   a per-point mixed-surface detector.
3. **triangulate** — midpoint of the cam-1 and cam-2 rays; the common-
   perpendicular gap and the fit residual gate the mask.

The result is an organized ``ScanCloud`` on the cam-1 grid, so every
downstream stage (registration, fusion, meshing, IO) works unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.codec import decode_stack
from slr.geom.camera import Camera, pixel_to_ray
from slr.geom.triangulate import triangulate_midpoint, _solve3x3
from slr.pipeline.reconstruct import ScanCloud, _white_color

# moment-vector layout per projector cell (local coords d = X - cell):
# [ w, w dx, w dy, w dx2, w dxdy, w dy2,
#   w u, w u dx, w u dy, w v, w v dx, w v dy, w (u2+v2) ]
_NM = 13


def _splat_moments(x_p, y_p, w, u, v, proj_w: int, proj_h: int):
    """Bilinearly scatter the MLS moment vector into a (proj_h, proj_w,
    13) grid. One flattened scatter-add of a (4*H*W, 13) payload — XLA
    lowers it to a single sorted segment-sum on TPU."""
    x0 = jnp.floor(x_p)
    y0 = jnp.floor(y_p)
    fx = x_p - x0
    fy = y_p - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    idxs, vals = [], []
    for ddx, ddy, ww in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                         (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
        xi = jnp.clip(x0 + ddx, 0, proj_w - 1)
        yi = jnp.clip(y0 + ddy, 0, proj_h - 1)
        wq = w * ww
        dx = x_p - xi.astype(jnp.float32)
        dy = y_p - yi.astype(jnp.float32)
        idxs.append((yi * proj_w + xi).reshape(-1))
        vals.append(jnp.stack(
            [wq, wq * dx, wq * dy, wq * dx * dx, wq * dx * dy, wq * dy * dy,
             wq * u, wq * u * dx, wq * u * dy,
             wq * v, wq * v * dx, wq * v * dy,
             wq * (u * u + v * v)], axis=-1).reshape(-1, _NM))
    flat_idx = jnp.concatenate(idxs)
    flat_val = jnp.concatenate(vals)
    acc = jnp.zeros((proj_h * proj_w, _NM), jnp.float32)
    acc = acc.at[flat_idx].add(flat_val)
    return acc.reshape(proj_h, proj_w, _NM)


def _gather_moments(moms, qx, qy):
    """Combine the 4 neighbor cells' moments, re-centred on the query
    point (qx, qy). Moment translation is linear, so the bilinear blend
    of translated moments is itself a valid moment vector about the
    query."""
    Hp, Wp = moms.shape[:2]
    qx = jnp.clip(qx, 0.0, Wp - 1.0)
    qy = jnp.clip(qy, 0.0, Hp - 1.0)
    x0 = jnp.floor(qx).astype(jnp.int32)
    y0 = jnp.floor(qy).astype(jnp.int32)
    fx = qx - x0
    fy = qy - y0

    out = 0.0
    for ddx, ddy, ww in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                         (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
        xi = jnp.minimum(x0 + ddx, Wp - 1)
        yi = jnp.minimum(y0 + ddy, Hp - 1)
        m = moms[yi, xi]                       # (..., 13)
        a = qx - xi.astype(jnp.float32)        # query in cell-local coords
        b = qy - yi.astype(jnp.float32)
        S0, Sx, Sy = m[..., 0], m[..., 1], m[..., 2]
        Sxx, Sxy, Syy = m[..., 3], m[..., 4], m[..., 5]
        Su, Sux, Suy = m[..., 6], m[..., 7], m[..., 8]
        Sv, Svx, Svy = m[..., 9], m[..., 10], m[..., 11]
        Sm2 = m[..., 12]
        t = jnp.stack(
            [S0,
             Sx - a * S0,
             Sy - b * S0,
             Sxx - 2 * a * Sx + a * a * S0,
             Sxy - a * Sy - b * Sx + a * b * S0,
             Syy - 2 * b * Sy + b * b * S0,
             Su, Sux - a * Su, Suy - b * Su,
             Sv, Svx - a * Sv, Svy - b * Sv,
             Sm2], axis=-1)
        out = out + ww[..., None] * t
    return out


def match_via_projector(
    x_p1, y_p1, dec2_x, dec2_y, w2, proj_w: int, proj_h: int,
    ridge: float = 3e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Projector-space rendezvous: cam-2 pixel coords seen from cam-1.

    Returns (u2, v2, weight, resid) on the cam-1 grid: ``weight`` ~ how
    much quality-weighted cam-2 evidence landed on cam-1's projector
    coordinate (0 where cam 2 never saw that projector ray); ``resid``
    is the RMS residual (cam-2 px) of the local linear fit — large
    exactly where the splat straddles a depth discontinuity and mixes
    two surfaces, the failure mode the ray-gap metric cannot see (the
    mixed mean ray can still pass near the cam-1 ray).
    """
    H2, W2 = dec2_x.shape
    v2g = jax.lax.broadcasted_iota(jnp.float32, (H2, W2), 0)
    u2g = jax.lax.broadcasted_iota(jnp.float32, (H2, W2), 1)
    moms = _splat_moments(dec2_x, dec2_y, w2, u2g, v2g, proj_w, proj_h)
    g = _gather_moments(moms, x_p1, y_p1)

    S0 = g[..., 0]
    # ridge on the SLOPE diagonal only: shrinking the slopes degrades
    # gracefully to the weighted mean when a cell has too few samples;
    # ridge on the constant term would bias the value itself
    lam = ridge * S0 + 1e-12
    A = jnp.stack([
        jnp.stack([S0 + 1e-12, g[..., 1], g[..., 2]], -1),
        jnp.stack([g[..., 1], g[..., 3] + lam, g[..., 4]], -1),
        jnp.stack([g[..., 2], g[..., 4], g[..., 5] + lam], -1),
    ], -2)
    bu = g[..., 6:9]
    bv = g[..., 9:12]
    cu = _solve3x3(A, bu)
    cv = _solve3x3(A, bv)
    u2 = cu[..., 0]
    v2 = cv[..., 0]
    # fit residual: S_m2 - sum_k cu_k * bu_k - sum_k cv_k * bv_k, i.e. the
    # weighted RSS of both linear fits combined
    rss = (g[..., 12] - jnp.sum(cu * bu, -1) - jnp.sum(cv * bv, -1))
    safe = jnp.maximum(S0, 1e-12)
    resid = jnp.sqrt(jnp.maximum(rss, 0.0) / safe)
    return u2, v2, S0, resid


def match_via_depth_search(
    x_p1, y_p1, dec2_x, mask2, cam1: Camera, cam2: Camera,
    t_lo: float, t_hi: float, iters: int = 20, coarse: int = 48,
):
    """Scatter-free rendezvous: locate the depth along each cam-1 ray at
    which cam 2's decoded column code under the ray point's cam-2
    projection equals the query code.

    The splat/gather path is exact but its (4·H·W)-entry scatter-add is
    the one op XLA cannot make fast on TPU (measured 0.59 s/scan at
    1280×1024 — serial scatter). Here every step is a dense gather: as t
    sweeps the bracket, the cam-2 pixel under proj2(ray1(t)) sweeps the
    epipolar line and the surface code under it varies monotonically
    except across occlusion jumps; at the true surface the codes match.

    Two phases, both fixed-iteration: a ``coarse`` uniform sweep of the
    bracket keeps the sign-change interval whose endpoint errors are
    smallest (the bracket may contain no crossing for much of its range
    — outside cam 2's frustum the masked code map reads 0 — and can
    contain several at occlusion jumps); then ``iters`` bisection steps
    localize the root inside that interval. False roots at
    discontinuities converge but fail the caller's left-right
    code-equality gates.

    Returns (u2, v2, t_star): matched cam-2 pixel coords and ray depth.
    """
    H, W = x_p1.shape
    v1 = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u1 = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    o1, d1 = pixel_to_ray(cam1, u1, v1)
    from slr.geom.camera import project

    x2map = jnp.where(mask2, dec2_x, 0.0)

    def code_err(t):
        p = o1 + t[..., None] * d1
        uv2, _ = project(cam2, p)
        cx = _bilinear(x2map, uv2[..., 0], uv2[..., 1])
        return cx - x_p1, uv2

    # Per-pixel bracket: clip [t_lo, t_hi] to the segment of the ray
    # inside cam 2's frustum. Outside it the masked code map reads 0 and
    # the sweep wastes samples on (or worse, hides the surface band
    # between) dead stretches. In cam-2 coords the ray is a + t b, and
    # each frustum face (Z > 0, 0 <= u,v <= bounds, distortion ignored —
    # this is a bracket, not a measurement) is one linear-in-t constraint
    # c0 + c1 t >= 0.
    H2, W2 = dec2_x.shape
    a = jnp.einsum("ij,j->i", cam2.R, o1) + cam2.t          # (3,)
    b = jnp.einsum("ij,...j->...i", cam2.R, d1)             # (H,W,3)
    # t is the parameter of the UNIT-norm ray d1, but the caller's bounds
    # are cam-1 z-depths (z = t * (R1[2]@d1)); divide by the per-pixel
    # z-component so the sweep covers [t_lo, t_hi] in DEPTH at every
    # pixel — off-axis rays otherwise lose up to ~25% of the far range
    # at the FOV corners (ADVICE r3 #1).
    d1z = jnp.maximum(jnp.einsum("j,...j->...", cam1.R[2], d1), 1e-3)
    lo_px = t_lo / d1z
    hi_px = t_hi / d1z
    cons = (
        (a[2] - 1e-3, b[..., 2]),
        (cam2.fx * a[0] + cam2.cx * a[2],
         cam2.fx * b[..., 0] + cam2.cx * b[..., 2]),
        ((W2 - 1 - cam2.cx) * a[2] - cam2.fx * a[0],
         (W2 - 1 - cam2.cx) * b[..., 2] - cam2.fx * b[..., 0]),
        (cam2.fy * a[1] + cam2.cy * a[2],
         cam2.fy * b[..., 1] + cam2.cy * b[..., 2]),
        ((H2 - 1 - cam2.cy) * a[2] - cam2.fy * a[1],
         (H2 - 1 - cam2.cy) * b[..., 2] - cam2.fy * b[..., 1]),
    )
    for c0, c1 in cons:
        c0 = jnp.broadcast_to(c0, (H, W))
        root = -c0 / jnp.where(jnp.abs(c1) < 1e-12, 1e-12, c1)
        lo_px = jnp.where(c1 > 0, jnp.maximum(lo_px, root), lo_px)
        hi_px = jnp.where(c1 < 0, jnp.minimum(hi_px, root), hi_px)
        infeasible = (jnp.abs(c1) < 1e-12) & (c0 < 0)
        hi_px = jnp.where(infeasible, lo_px, hi_px)
    hi_px = jnp.maximum(hi_px, lo_px)

    dt = (hi_px - lo_px) / (coarse - 1)
    f0, _ = code_err(lo_px)
    big = jnp.float32(1e30)
    init = (lo_px,                                    # best interval lo
            hi_px,                                    # best interval hi
            jnp.full((H, W), big),                    # best score
            f0,                                       # f at best lo
            f0)                                       # f at previous sample

    def sweep(i, st):
        b_lo, b_hi, b_sc, b_f, f_prev = st
        t_i = lo_px + dt * i.astype(jnp.float32)
        f_i, _ = code_err(t_i)
        change = jnp.sign(f_i) != jnp.sign(f_prev)
        score = jnp.where(change, jnp.abs(f_i) + jnp.abs(f_prev), big)
        better = score < b_sc
        return (jnp.where(better, t_i - dt, b_lo),
                jnp.where(better, t_i, b_hi),
                jnp.where(better, score, b_sc),
                jnp.where(better, f_prev, b_f),
                f_i)

    lo, hi, _, f_lo, _ = jax.lax.fori_loop(1, coarse, sweep, init)

    def body(_, st):
        lo, hi, f_lo = st
        mid = 0.5 * (lo + hi)
        f_mid, _ = code_err(mid)
        same = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo_n = jnp.where(same, mid, lo)
        f_lo_n = jnp.where(same, f_mid, f_lo)
        hi_n = jnp.where(same, hi, mid)
        return lo_n, hi_n, f_lo_n

    lo, hi, _ = jax.lax.fori_loop(0, iters, body, (lo, hi, f_lo))
    t_star = 0.5 * (lo + hi)
    _, uv2 = code_err(t_star)
    return uv2[..., 0], uv2[..., 1], t_star


def invert_to_projector(x_p, y_p, mask, quality, white,
                        proj_w: int, proj_h: int, *,
                        dmin: float = 0.125, dmax: float = 2.5,
                        du_max: float = 8.0,
                        flip_u: bool = False, flip_v: bool = False,
                        use_kernel: bool = True):
    """One camera's decoded code maps inverted onto the projector pixel
    grid: for every integer projector coordinate (k, j), the sub-pixel
    CAMERA position (u, v) that observes it, plus quality/intensity
    carried along. This is the TPU-native replacement for both the
    moment-splat (scatter-bound) and the epipolar depth search
    (gather-bound): two separable monotone-crossing passes, each ONE
    one-hot matmul per row on the MXU (slr.kernels.crossing).

    Pass 1 inverts x_p along each image row (x_p is monotone in u for a
    horizontally-separated rig; set ``flip_u`` for mirrored mounts),
    interpolating (u, y_p, quality, white) at every integer column k.
    Pass 2 inverts the resulting y table along v per projector column
    (monotone in v; ``flip_v`` for upside-down mounts), interpolating
    (u, v, quality, white) at every integer row j.

    ``dmax`` (projector px per pixel step) gates the per-pair code jump
    in BOTH passes: pairs jumping more than dmax bins straddle a
    silhouette, and interpolating "crossings" inside the jump would
    bridge two surfaces with phantom points that the ray-gap gate cannot
    see (both cameras bridge the SAME jump consistently). 2.5 keeps 98%
    of the dmax=4 coverage on the test rig while cutting the worst-case
    error from 31 mm to 0.07 mm; raise it only for rigs whose smooth-
    surface code gradient genuinely exceeds ~2 px/px.

    Returns (valid, u, v, q, w), all (proj_h, proj_w).
    """
    from slr.kernels.crossing import crossing_interp, crossing_interp_fused

    H, W = x_p.shape
    u_i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    if flip_u:
        x_p, y_p, mask, quality, white, u_i = (
            a[:, ::-1] for a in (x_p, y_p, mask, quality, white, u_i))
    ch1 = jnp.stack([u_i, y_p, quality, white])
    # continuity of the CARRIED code axis: a pair stepping < dmax bins in
    # x can still jump in y across a shallow silhouette — interpolating
    # there would bridge two surfaces (phantom points the ray-gap gate
    # cannot see, since both cameras bridge the same jump consistently).
    # The fused route applies the same veto in-kernel (gates=).
    # fused route needs the full row in one block AND its per-row
    # (num_bins, pairs) one-hot to fit scoped VMEM (16 MB): bound
    # Kp * Up * 4 B well under it; larger rigs take the tiled route
    fused = (use_kernel and max(H, W) <= 2560
             and max(proj_w, proj_h) * max(H, W) * 4 <= 8 * 2 ** 20)
    if fused:
        cnt1, (u1, y1, q1, w1) = crossing_interp_fused(
            x_p, mask, ch1, proj_w, interp=(True, True, False, False),
            gates=((1, dmax),), dmin=dmin, dmax=dmax)
    else:
        gate1 = jnp.abs(y_p[:, 1:] - y_p[:, :-1]) < dmax
        cnt1, (u1, y1, q1, w1) = crossing_interp(
            x_p, mask, ch1, proj_w, interp=(True, True, False, False),
            dmin=dmin, dmax=dmax, use_kernel=use_kernel, pair_gate=gate1)

    code2 = y1.T                       # (proj_w, H)
    valid2 = (cnt1 > 0.5).T
    v_i2 = jax.lax.broadcasted_iota(jnp.float32, (proj_w, H), 1)
    u2c, q2c, w2c = u1.T, q1.T, w1.T
    if flip_v:
        code2, valid2, v_i2, u2c, q2c, w2c = (
            a[:, ::-1] for a in (code2, valid2, v_i2, u2c, q2c, w2c))
    ch2 = jnp.stack([u2c, v_i2, q2c, w2c])
    # same continuity veto on the carried camera-u position (``du_max``
    # cam px): fore/background bridges jump in disparity even when the
    # y-code step stays under dmax
    if fused:
        cnt2, (u_t, v_t, q_t, w_t) = crossing_interp_fused(
            code2, valid2, ch2, proj_h, interp=(True, True, False, False),
            gates=((0, du_max),), dmin=dmin, dmax=dmax)
    else:
        gate2 = jnp.abs(u2c[:, 1:] - u2c[:, :-1]) < du_max
        cnt2, (u_t, v_t, q_t, w_t) = crossing_interp(
            code2, valid2, ch2, proj_h, interp=(True, True, False, False),
            dmin=dmin, dmax=dmax, use_kernel=use_kernel, pair_gate=gate2)
    return ((cnt2 > 0.5).T, u_t.T, v_t.T, q_t.T, w_t.T)


def _code_edge_mask(x_p, y_p, mask, tol: float):
    """False at code-discontinuity pixels: a silhouette-edge pixel blends
    foreground and background intensities, so its decoded code is an
    arbitrary value between two surfaces' codes — and can counterfeit the
    code of a point the camera cannot actually see. Such pixels show a
    code jump of several projector px to at least one 4-neighbor (a smooth
    surface moves ~1 proj px per cam px). Neighbors outside ``mask``
    don't vote, and neither do the wrapped-around border rows/columns a
    plain roll drags in (ADVICE r3 #2) — border pixels only compare
    against real neighbors."""
    from slr.codec.unwrap import _shift_zero

    jump = jnp.zeros_like(x_p)
    for ax, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        dy, dx = (sh, 0) if ax == 0 else (0, sh)
        nx = jnp.roll(x_p, sh, axis=ax)
        ny = jnp.roll(y_p, sh, axis=ax)
        nm = _shift_zero(mask.astype(jnp.float32), dy, dx) > 0.5
        d = jnp.abs(nx - x_p) + jnp.abs(ny - y_p)
        jump = jnp.maximum(jump, jnp.where(nm, d, 0.0))
    return jump < tol


def _bilinear(img, x, y):
    """Clamped bilinear sample of an (H, W) map at float coords."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)


@partial(jax.jit, static_argnames=("cfg", "dec", "rec", "max_ray_gap",
                                   "min_weight", "max_resid", "code_tol",
                                   "edge_tol", "method", "search_iters",
                                   "flip_u", "flip_v", "merge_dmax",
                                   "merge_kernel", "unsafe_search"))
def reconstruct_two_camera(
    frames1,
    frames2,
    cam1: Camera,
    cam2: Camera,
    cfg: PatternConfig,
    dec: DecodeConfig = DecodeConfig(),
    rec: ReconstructConfig = ReconstructConfig(),
    max_ray_gap: float = 1.0,
    min_weight: float = 0.05,
    max_resid: float = 1.5,
    code_tol: float = 0.5,
    edge_tol: float = 3.0,
    method: str = "merge",
    search_iters: int = 24,
    flip_u: bool = False,
    flip_v: bool = False,
    merge_dmax: float = 2.5,
    merge_kernel: bool = True,
    unsafe_search: bool = False,
) -> ScanCloud:
    """Decode both stacks, rendezvous in projector space, triangulate
    cam-1 x cam-2 rays. Projector calibration is NOT an input: only the two
    camera calibrations shape the geometry.

    ``method``:

    - "merge" (default): monotone-crossing inversion of both cameras'
      code maps onto the projector grid (``invert_to_projector``) —
      no scatters, no gathers, two one-hot MXU matmul passes per camera
      (slr.kernels.crossing; VERDICT r3 next #1). Most accurate of the
      three (0.012 mm vs 0.028 search / 0.108 splat on the test rig)
      AND the TPU-fast path. The organized output lives on the
      (proj_h, proj_w) grid, one cell per projector pixel — the natural
      sampling of a structured-light scanner. Left-right consistency is
      by construction; ``merge_dmax`` is the anti-phantom jump gate
      (see invert_to_projector), ``merge_kernel=False`` selects the
      pure-JAX oracle contraction (tests / tiny maps).
    - "splat": moment-splat/MLS-gather rendezvous on the cam-1 grid.
      Its (4·H·W)-entry scatter-add is the one op XLA executes near-
      serially on TPU (0.59 s/scan at 1280×1024) — kept as the oracle
      for the merge path and for cam-1-grid-organized output.
    - "search": epipolar depth sweep + bisection over [rec.min_depth,
      rec.max_depth] (clipped per pixel to cam 2's frustum); ~70 full-
      frame bilinear gathers, 4.0 s/scan on TPU. Set rec.min/max_depth
      to the scanner's working volume: with the default [1, 1e4]
      bracket the coarse sweep can step over narrow surface bands and
      coverage drops ~15 %.

    ``max_ray_gap`` (scene units) gates on the common-perpendicular
    distance of the matched rays; ``min_weight`` on the splat evidence;
    ``max_resid`` (cam-2 px) on the local linear-fit residual, which
    rejects depth-discontinuity pixels whose projector cell mixes two
    surfaces (both splat-only); ``code_tol`` (projector px) is the
    left-right consistency gate — cam 2's own decoded code, sampled at
    the matched (u2, v2), must agree with the query code on BOTH axes.
    This is what rejects points OCCLUDED in cam 2 (under "splat" the
    starved gather extrapolates background geometry with a deceptively
    perfect zero-residual fit; under "search" the bisection converges
    onto an occlusion discontinuity instead of a root) — in both cases
    the background's code never matches the query's.
    """
    if not cfg.row_gray_bits:
        raise ValueError(
            "two-camera mode needs both projector axes coded: set "
            "row_gray_bits (+ optionally row_phase_steps) in PatternConfig")

    # decode through the fused Pallas kernel's decode_only route when the
    # config supports it (r5: the pure-JAX decode_stack was ~2 ms/camera
    # of the merge path's 8 ms — the kernel reads the frame stack once
    # and emits the code maps at HBM speed; no projector model needed).
    # Off-accelerator the kernel would run in interpret mode — strictly
    # slower than the vectorized decode_stack — so gate on the backend.
    from slr.kernels.common import use_interpret

    if (cfg.coding == "gray_phase" and cfg.use_inverse and cfg.phase_steps
            and not use_interpret()):
        from slr.codec.patterns import DecodeResult
        from slr.kernels.fused_scan import fused_decode_triangulate

        def _dec(frames, cam):
            o = fused_decode_triangulate(frames, cam, None, cfg, dec,
                                         decode_only=True)
            return DecodeResult(x_p=o.x_p, y_p=o.y_p, mask=o.mask > 0.5,
                                quality=o.quality)

        r1 = _dec(frames1, cam1)
        r2 = _dec(frames2, cam2)
    else:
        r1 = decode_stack(frames1, cfg, dec)
        r2 = decode_stack(frames2, cfg, dec)
    if r1.y_p is None:
        raise ValueError("decode produced no projector-row coordinate")

    H, W = r1.x_p.shape
    v1 = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u1 = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    # both sides drop code-discontinuity (silhouette-blend) pixels: on the
    # splat side they counterfeit occluded codes, on the query side they
    # ask for codes that exist on no surface (``edge_tol`` proj px)
    edge1 = _code_edge_mask(r1.x_p, r1.y_p, r1.mask, edge_tol)
    edge2 = _code_edge_mask(r2.x_p, r2.y_p, r2.mask, edge_tol)
    if method == "merge":
        # TPU-native default: both cameras' code maps inverted onto the
        # projector grid by separable monotone-crossing MXU passes; the
        # organized output lives on the (proj_h, proj_w) grid — every
        # cell where both cameras found the code triangulates, and
        # left-right consistency is BY CONSTRUCTION (both rays decode
        # the same integer projector coordinate).
        m1 = invert_to_projector(
            r1.x_p, r1.y_p, r1.mask & edge1, r1.quality,
            _white_color(frames1), cfg.proj_width, cfg.proj_height,
            dmax=merge_dmax, flip_u=flip_u, flip_v=flip_v,
            use_kernel=merge_kernel)
        m2 = invert_to_projector(
            r2.x_p, r2.y_p, r2.mask & edge2, r2.quality,
            _white_color(frames2), cfg.proj_width, cfg.proj_height,
            dmax=merge_dmax, flip_u=flip_u, flip_v=flip_v,
            use_kernel=merge_kernel)
        valid = m1[0] & m2[0]
        o1m, d1m = pixel_to_ray(cam1, m1[1], m1[2])
        o2m, d2m = pixel_to_ray(cam2, m2[1], m2[2])
        pts, gap = triangulate_midpoint(o1m, d1m, o2m, d2m)
        depth1 = jnp.einsum("j,...j->...", cam1.R[2], pts) + cam1.t[2]
        mk = (valid & (gap < max_ray_gap)
              & (depth1 > rec.min_depth) & (depth1 < rec.max_depth))
        pts = jnp.where(mk[..., None], pts, 0.0)
        Hp_, Wp_ = mk.shape
        xp_grid = jax.lax.broadcasted_iota(jnp.float32, (Hp_, Wp_), 1)
        quality = jnp.where(mk, jnp.minimum(m1[3], m2[3]), 0.0)
        return ScanCloud(points=pts, mask=mk, colors=m1[4],
                         quality=quality, x_p=xp_grid)
    if method == "search":
        # Product-layer fence for a reproduced CHIP-KILLER (VERDICT r4
        # next #6): chaining >= 17 copies of this graph in one dispatch
        # faulted the v5e with a device-lost UNAVAILABLE error twice
        # (benchmarks/repro_search_fault.py; tpu_matrix_r4.jsonl error
        # rows). "search" is an oracle path — "merge" is both faster
        # (7.4 vs 4026 ms/scan) and more accurate (0.005 vs 0.19 mm) —
        # so on accelerators it requires an explicit opt-in rather than
        # letting a user loop themselves into a device fault.
        if not unsafe_search and jax.default_backend() not in ("cpu",):
            raise ValueError(
                "method='search' is an oracle path that can fault TPU "
                "devices when dispatched repeatedly (>=17 chained graphs "
                "reproduce a device-lost error; see BASELINE.md and "
                "benchmarks/repro_search_fault.py). Use the default "
                "method='merge' (faster and more accurate), or pass "
                "unsafe_search=True to accept the risk — then keep "
                "chains short (<= 5 calls per dispatch was stable)."
            )
        u2, v2, _ = match_via_depth_search(
            r1.x_p, r1.y_p, r2.x_p, r2.mask & edge2, cam1, cam2,
            t_lo=rec.min_depth, t_hi=rec.max_depth, iters=search_iters)
        gw = None
        resid = None
    elif method == "splat":
        w2 = jnp.where(r2.mask & edge2, jnp.maximum(r2.quality, 1e-6), 0.0)
        u2, v2, gw, resid = match_via_projector(
            r1.x_p, r1.y_p, r2.x_p, r2.y_p, w2,
            cfg.proj_width, cfg.proj_height)
    else:
        raise ValueError(f"unknown two-camera method {method!r}")

    o1, d1 = pixel_to_ray(cam1, u1, v1)
    o2, d2 = pixel_to_ray(cam2, u2, v2)
    pts, gap = triangulate_midpoint(o1, d1, o2, d2)

    # left-right consistency: cam 2's decode at the matched pixel must
    # carry the query's projector code (all 4 sample neighbors valid)
    x_back = _bilinear(jnp.where(r2.mask, r2.x_p, 0.0), u2, v2)
    y_back = _bilinear(jnp.where(r2.mask, r2.y_p, 0.0), u2, v2)
    m_back = _bilinear(r2.mask.astype(jnp.float32), u2, v2)
    consistent = ((m_back > 0.999)
                  & (jnp.abs(x_back - r1.x_p) < code_tol)
                  & (jnp.abs(y_back - r1.y_p) < code_tol))

    depth1 = jnp.einsum("j,...j->...", cam1.R[2], pts) + cam1.t[2]
    mask = (r1.mask & edge1 & consistent & (gap < max_ray_gap)
            & (depth1 > rec.min_depth) & (depth1 < rec.max_depth))
    if gw is not None:
        mask = mask & (gw > min_weight) & (resid < max_resid)
    pts = jnp.where(mask[..., None], pts, 0.0)
    q_match = r1.quality if gw is None else jnp.minimum(r1.quality, gw)
    quality = jnp.where(mask, q_match, 0.0)
    return ScanCloud(points=pts, mask=mask, colors=_white_color(frames1),
                     quality=quality, x_p=r1.x_p)
