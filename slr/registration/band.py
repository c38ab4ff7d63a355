"""Sorted-band MXU nearest-neighbour search (VERDICT r4 next #3).

The exact tiled-matmul NN (slr.registration.nn) does O(Q*T) work; the
voxel hash is gather-bound and near-serial on TPU (measured 4.8 s at 64k,
tpu_matrix_r4 icp_64k_voxel). This module applies the crossing kernel's
activity-table idea (slr/kernels/crossing.py) to 3D NN:

1. project both clouds onto the target's principal axis (one power
   iteration on the 3x3 covariance — the axis with the largest spread
   gives the tightest 1D pruning);
2. sort target AND queries by that key ONCE (jax.lax.sort carries the
   payload columns through the sort network — no gathers);
3. tile both sorted clouds; a (query-tile, target-tile) pair can contain
   a correspondence within ``max_corr_dist`` only if their key intervals
   are closer than it — and because the tiles are sorted, the active
   target tiles for each query tile form one CONTIGUOUS band;
4. a Pallas kernel walks (query-tile, band-position) with the band start
   SCALAR-PREFETCHED into the BlockSpec index maps, so inactive tile
   pairs are never even fetched from HBM — work and traffic both scale
   with the band fraction (~2 r / extent), not with T.

The kernel never emits indices for the hot path: the winning target's
coordinates and normal are extracted IN-kernel with a one-hot matmul
against a bf16-exact 3-split payload (same trick as crossing.py), so ICP
needs no post-hoc ``tgt[idx]`` gather at all — on TPU a 256k-row gather
would cost more than the search. Results are exact within
``max_corr_dist``: any query whose true NN is farther gets d2 = +inf
(the caller's correspondence gate drops it anyway).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slr.kernels.common import round_up, use_interpret
from slr.kernels.crossing import _round_bf16, _split3

_QT = 512       # queries per tile
_TT = 512       # targets per tile
_BIG = 1e9      # coordinate sentinel for invalid/padded points
_NCH = 16       # payload channels (9 coord splits, 3 normals, 3 idx, 1)


class BandTarget(NamedTuple):
    """Sorted, tiled target structure (build once, search many)."""
    axis: jnp.ndarray     # (3,) principal sort axis
    coords: jnp.ndarray   # (3, Tp) sorted coords, invalid/pad = _BIG
    payload: jnp.ndarray  # (_NCH, Tp) f32, every value bf16-representable
    tlo: jnp.ndarray      # (n_ttiles,) tile key lower bounds
    thi: jnp.ndarray      # (n_ttiles,) tile key upper bounds


def principal_axis(pts, valid, iters: int = 8):
    """Leading eigenvector of the valid points' covariance via power
    iteration (3x3 — eigh would also work, this keeps it branch-free),
    sign-canonicalized so the result is deterministic."""
    w = valid.astype(jnp.float32)
    ws = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(pts * w[:, None], axis=0) / ws
    X = (pts - mu) * w[:, None]
    C = X.T @ (pts - mu) / ws + 1e-9 * jnp.eye(3)
    v = jnp.full((3,), 0.57735027, jnp.float32)
    for _ in range(iters):
        v = C @ v
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-20)
    # canonical sign: largest-magnitude component positive
    s = jnp.sign(v[jnp.argmax(jnp.abs(v))])
    return v * jnp.where(s == 0, 1.0, s)


def build_band_target(tgt, tgt_normals=None, tgt_valid=None,
                      tt: int = _TT) -> BandTarget:
    """Sort + tile the target cloud. All payload values are packed as
    bf16-representable f32 terms so the kernel's one-hot extraction
    matmul is EXACT in one DEFAULT-precision MXU pass (see
    slr/kernels/crossing.py module docstring for the toolchain law)."""
    T = tgt.shape[0]
    if tgt_valid is None:
        tgt_valid = jnp.ones((T,), bool)
    if tgt_normals is None:
        tgt_normals = jnp.zeros_like(tgt)
    axis = principal_axis(tgt, tgt_valid)
    key = jnp.where(tgt_valid, tgt @ axis, jnp.float32(1e38))
    coords = jnp.where(tgt_valid[:, None], tgt, _BIG)
    idx = jnp.arange(T, dtype=jnp.float32)
    ops = [key] + [coords[:, i] for i in range(3)] + \
          [tgt_normals[:, i] for i in range(3)] + [idx]
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    key_s = sorted_ops[0]
    Tp = round_up(T, tt)
    pad = Tp - T

    def padded(a, v):
        return jnp.pad(a, (0, pad), constant_values=v) if pad else a

    key_s = padded(key_s, 3e38)
    cs = [padded(sorted_ops[1 + i], _BIG) for i in range(3)]
    ns = [padded(_round_bf16(sorted_ops[4 + i]), 0.0) for i in range(3)]
    idx_s = padded(sorted_ops[7], 0.0)
    rows = []
    for c in cs:
        rows.extend(_split3(c))
    rows.extend(ns)
    i_int = idx_s.astype(jnp.int32)
    rows.append((i_int // 65536).astype(jnp.float32))
    rows.append(((i_int // 256) % 256).astype(jnp.float32))
    rows.append((i_int % 256).astype(jnp.float32))
    rows.append(jnp.ones_like(idx_s))
    payload = jnp.stack(rows)                     # (_NCH, Tp)
    kt = key_s.reshape(-1, tt)
    return BandTarget(axis=axis, coords=jnp.stack(cs),
                      payload=payload, tlo=kt[:, 0], thi=kt[:, -1])


def _band_kernel(sref, qc_ref, tc_ref, tv_ref, out_ref):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:, 0:1] = jnp.full_like(out_ref[:, 0:1], 3.0e38)

    @pl.when(b < sref[1, pl.program_id(0)])
    def _compute():
        q = qc_ref[:, :]                                    # (3, Qt)
        t = tc_ref[:, :]                                    # (3, Tt)
        # score = |t|^2 - 2 q.t  (adding |q|^2, constant per row, does
        # not move the argmin; the true d2 is reconstructed outside)
        qt = jax.lax.dot_general(
            q, t, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # (Qt, Tt)
        t2 = jnp.sum(t * t, axis=0, keepdims=True)          # (1, Tt)
        sc = t2 - 2.0 * qt
        tmin = jnp.min(sc, axis=1, keepdims=True)           # (Qt, 1)
        # tie-break to the FIRST (lowest-index) minimizer: exact ties
        # (duplicate target points) would otherwise be summed and the
        # averaged idx digits decode to an unrelated index. Across
        # tiles the strict `tmin < best` below already keeps the first.
        ties = sc <= tmin
        lane = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        first = jnp.min(jnp.where(ties, lane, jnp.int32(1 << 30)),
                        axis=1, keepdims=True)
        oh = (ties & (lane == first)).astype(jnp.float32)
        vals = jax.lax.dot_general(
            oh, tv_ref[:, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)             # (Qt, _NCH)
        best = out_ref[:, 0:1]
        better = tmin < best
        out_ref[:, 0:1] = jnp.where(better, tmin, best)
        out_ref[:, 1:] = jnp.where(better, vals, out_ref[:, 1:])


@partial(jax.jit, static_argnames=("b_max", "qt"))
def band_nn_sorted(qc, q_valid, bt: BandTarget, max_corr_dist: float,
                   b_max: int, qt: int = _QT):
    """NN search for SORTED queries against a BandTarget.

    qc: (3, Qp) query coords (Qp a multiple of ``qt``; invalid = _BIG
    with q_valid False). Returns (d2, nn_pts (Qp,3), nn_nrm (Qp,3),
    nn_idx (Qp,) int32 into the ORIGINAL target order): d2 = +inf and
    idx = -1 where no target lies within ``max_corr_dist`` (including
    band truncation at ``b_max`` tiles — pick b_max via
    ``suggest_b_max`` with slack so real bands never truncate).
    """
    Qp = qc.shape[1]
    n_q = Qp // qt
    n_t = bt.tlo.shape[0]
    r = max_corr_dist
    qkey = bt.axis @ qc                                   # (Qp,)
    qk = qkey.reshape(n_q, qt)
    vk = q_valid.reshape(n_q, qt)
    qlo = jnp.min(jnp.where(vk, qk, jnp.inf), axis=1)
    qhi = jnp.max(jnp.where(vk, qk, -jnp.inf), axis=1)
    jstart = jnp.sum((bt.thi[None, :] < (qlo[:, None] - r)),
                     axis=1).astype(jnp.int32)
    jend = jnp.sum((bt.tlo[None, :] <= (qhi[:, None] + r)),
                   axis=1).astype(jnp.int32)
    jlen = jnp.clip(jend - jstart, 0, b_max)
    jstart = jnp.minimum(jstart, n_t - 1)
    bands = jnp.stack([jstart, jlen])                     # (2, n_q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_q, b_max),
        in_specs=[
            pl.BlockSpec((3, qt), lambda qi, b, s: (0, qi)),
            pl.BlockSpec(
                (3, bt.coords.shape[1] // n_t),
                lambda qi, b, s: (0, jnp.minimum(s[0, qi] + b, n_t - 1))),
            pl.BlockSpec(
                (_NCH, bt.payload.shape[1] // n_t),
                lambda qi, b, s: (0, jnp.minimum(s[0, qi] + b, n_t - 1))),
        ],
        out_specs=pl.BlockSpec((qt, 1 + _NCH), lambda qi, b, s: (qi, 0)),
    )
    out = pl.pallas_call(
        _band_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Qp, 1 + _NCH), jnp.float32),
        interpret=use_interpret(),
    )(bands, qc, bt.coords, bt.payload)

    q2 = jnp.sum(qc * qc, axis=0)
    cnt = out[:, 16]
    safe = jnp.maximum(cnt, 1.0)
    d2 = jnp.maximum(q2 + out[:, 0], 0.0)
    hit = (cnt > 0.5) & (d2 <= r * r) & q_valid
    d2 = jnp.where(hit, d2, jnp.inf)
    pts = jnp.stack([(out[:, 1] + out[:, 2] + out[:, 3]),
                     (out[:, 4] + out[:, 5] + out[:, 6]),
                     (out[:, 7] + out[:, 8] + out[:, 9])],
                    axis=1) / safe[:, None]
    nrm = out[:, 10:13] / safe[:, None]
    idx = jnp.round(
        (out[:, 13] * 65536.0 + out[:, 14] * 256.0 + out[:, 15]) / safe
    ).astype(jnp.int32)
    idx = jnp.where(hit, idx, -1)
    return d2, pts, nrm, idx


def band_widths(query, q_valid, bt: BandTarget, max_corr_dist: float,
                qt: int = _QT):
    """Per-query-tile band lengths (in target tiles) at the given query
    positions — the quantity ``b_max`` must bound."""
    key = jnp.where(q_valid, query @ bt.axis, jnp.inf)
    ops = jax.lax.sort([key], num_keys=1)
    Qp = round_up(query.shape[0], qt)
    k = jnp.pad(ops[0], (0, Qp - query.shape[0]),
                constant_values=jnp.inf).reshape(-1, qt)
    qlo = jnp.min(k, axis=1)
    qhi = jnp.max(jnp.where(jnp.isfinite(k), k, -jnp.inf), axis=1)
    r = max_corr_dist
    js = jnp.sum(bt.thi[None, :] < (qlo[:, None] - r), axis=1)
    je = jnp.sum(bt.tlo[None, :] <= (qhi[:, None] + r), axis=1)
    return jnp.maximum(je - js, 0)


def suggest_b_max(query, target, max_corr_dist: float, slack: float = 1.5,
                  qt: int = _QT, tt: int = _TT) -> int:
    """Static band cap for ``band_nn_sorted``: the measured max band at
    the CURRENT query positions, padded by ``slack`` (+2 tiles) so the
    pose motion of an ICP run cannot push a real band past the cap.
    Host-syncs once (the result becomes a static kernel parameter)."""
    bt = build_band_target(target, tt=tt)
    w = band_widths(query, jnp.ones(query.shape[0], bool), bt,
                    max_corr_dist, qt=qt)
    wmax = int(jax.device_get(jnp.max(w)))
    return max(1, min(int(slack * wmax) + 2, int(bt.tlo.shape[0])))


def band_nearest_neighbors(query, target, target_normals=None,
                           target_valid=None, max_corr_dist: float = 10.0,
                           b_max: int | None = None,
                           qt: int = _QT, tt: int = _TT):
    """Standalone exact-within-radius NN (test/verification surface):
    sorts queries internally and returns (idx, d2) in the ORIGINAL query
    order, matching ``nearest_neighbors``'s contract except that queries
    with no target within ``max_corr_dist`` report idx = -1, d2 = inf.
    The hot ICP path uses ``band_nn_sorted`` directly (no unsort pass).
    """
    if b_max is None:
        b_max = suggest_b_max(query, target, max_corr_dist, qt=qt, tt=tt)
    bt = build_band_target(target, target_normals, target_valid, tt=tt)
    Q = query.shape[0]
    qkey = query @ bt.axis
    ops = jax.lax.sort(
        [qkey] + [query[:, i] for i in range(3)]
        + [jnp.arange(Q, dtype=jnp.float32)], num_keys=1)
    Qp = round_up(Q, qt)
    pad = Qp - Q
    qc = jnp.stack([jnp.pad(ops[1 + i], (0, pad), constant_values=_BIG)
                    for i in range(3)])
    qv = jnp.pad(jnp.ones(Q, bool), (0, pad))
    d2s, _, _, idxs = band_nn_sorted(qc, qv, bt, max_corr_dist, b_max,
                                     qt=qt)
    qord = ops[4].astype(jnp.int32)
    inv = jnp.zeros(Q, jnp.int32).at[qord].set(
        jnp.arange(Q, dtype=jnp.int32))
    return idxs[inv], d2s[inv]
