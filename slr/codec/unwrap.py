"""Phase unwrapping: temporal (Gray-code order) + spatial quality-guided.

SURVEY.md components 7 and 8, contract in section 4.3.

Temporal unwrap combines the wrapped phase phi with the Gray-code stripe
index into an absolute phase Phi = phi + 2*pi*k. Two code layouts are
supported:

- ``half_shifted=True`` (default, used by the pipeline): the Gray-code
  stripes are shifted by half a fringe period and wrap cyclically
  (``slr.codec.patterns`` generates them this way). Code transitions then
  sit at phi == pi — maximally far from the phase wrap at phi == 0 — which
  is the complementary-Gray-code order-error correction of [P:7]
  (arxiv 2001.06790) without extra patterns: k = (s - [phi >= pi]) mod 2^m.

- ``half_shifted=False``: stripes aligned with fringes (code pitch p' may
  be a multiple of the fringe pitch p); the order is recovered by the
  minimum-distance rule k = round((c + 0.5) * r - phi/(2*pi)), r = p'/p
  (SURVEY.md 4.3 "k chosen by minimizing |Phi - Phi_code|").

Spatial quality-guided unwrap (component 8) is the reference's sequential
priority-queue flood fill reformulated as a fixed-iteration, data-parallel
label propagation: each sweep lets low-quality pixels snap their fringe
order to the quality-weighted consensus of their 4-neighbourhood. This is
the "vectorized quality-guided unwrapping" the north star prescribes
[B:5]; the Pallas scan version lives in slr/kernels/unwrap_scan.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def unwrap_temporal(phi, code, bits: int, code_to_fringe_ratio: float = 1.0,
                    half_shifted: bool = True):
    """Absolute phase from wrapped phase + Gray-code stripe index.

    phi: (H,W) wrapped phase in [0, 2pi). code: (H,W) int stripe index.
    Returns Phi (H,W) f32 absolute phase; projector coordinate is
    x_p = Phi * pitch / (2 pi).
    """
    phi = phi.astype(jnp.float32)
    if half_shifted:
        n = 1 << bits
        k = code - (phi >= jnp.pi).astype(code.dtype)
        k = jnp.mod(k, n)
        return phi + TWO_PI * k.astype(jnp.float32)
    r = jnp.float32(code_to_fringe_ratio)
    k = jnp.round((code.astype(jnp.float32) + 0.5) * r - phi / TWO_PI)
    return phi + TWO_PI * k


def spatial_quality_unwrap(Phi, quality, mask, iters: int = 8):
    """Fixed-iteration strict-consensus fringe-order repair.

    Each iteration lets every valid 4-neighbour vote an integer
    fringe-order correction; a pixel snaps only when >= 3 neighbours cast
    the SAME non-zero vote (see propagation_step). ``quality`` is kept in
    the signature for kernel-sharing symmetry but the voting itself is
    quality-blind by design — strict voting is what keeps the repair
    error-reducing at depth discontinuities. It repairs ISOLATED
    single-pixel order errors only; for multi-pixel blobs and phase-only
    maps use quality_guided_unwrap below.

    Phi: (H,W) absolute phase; quality: (H,W) >= 0; mask: (H,W) bool.
    Returns repaired Phi.
    """
    q = jnp.where(mask, quality, 0.0).astype(jnp.float32)

    def body(_, state):
        Phi_c, q_c = state
        return propagation_step(Phi_c, q_c, mask)

    Phi_out, _ = jax.lax.fori_loop(0, iters, body, (Phi.astype(jnp.float32), q))
    return Phi_out


def _shift_zero(a, dy, dx, roll_fn=None):
    """roll + zero-fill at borders (no wraparound leakage). Implemented
    with iota masks (not .at[].set) so it lowers inside Pallas kernels.
    roll_fn overrides the roll primitive (the Pallas kernel passes
    pltpu.roll, the TPU vector-rotate, which lowers far better than the
    generic jnp.roll inside Mosaic)."""
    if roll_fn is None:
        out = jnp.roll(a, shift=(dy, dx), axis=(0, 1))
    else:
        out = a
        if dy:
            out = roll_fn(out, dy, 0)
        if dx:
            out = roll_fn(out, dx, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    if dy == 1:
        out = jnp.where(rows == 0, 0.0, out)
    elif dy == -1:
        out = jnp.where(rows == a.shape[0] - 1, 0.0, out)
    if dx == 1:
        out = jnp.where(cols == 0, 0.0, out)
    elif dx == -1:
        out = jnp.where(cols == a.shape[1] - 1, 0.0, out)
    return out


def propagation_step(Phi_c, q_c, mask, roll_fn=None):
    """One quality-guided repair sweep (shared by the jnp path above and
    the Pallas kernel in slr.kernels.unwrap_scan — identical semantics).

    Strict-consensus voting: each valid 4-neighbour votes the integer
    fringe-order correction k = round((Phi_nb - Phi_c) / 2pi); the pixel
    snaps by k periods only when at least 3 neighbours cast the SAME
    non-zero vote. True order errors are isolated pixels surrounded by a
    consistent surface (4 agreeing votes); depth discontinuities and
    steep limbs split the neighbourhood so no 3-vote majority forms.
    (A naive quality-weighted mean consensus "repaired" correct pixels at
    sphere/plane occlusion edges whose disparity jump lands near a whole
    period — 5.6 mm RMS vs 0.27 mm without repair; strict voting keeps
    the repair strictly error-reducing.)
    """
    fmask = mask.astype(jnp.float32)
    votes, valids = [], []
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nb_val = _shift_zero(fmask, dy, dx, roll_fn)
        nb_phi = _shift_zero(Phi_c * fmask, dy, dx, roll_fn)
        k = jnp.round((nb_phi - Phi_c) / TWO_PI)
        votes.append(k)
        valids.append(nb_val > 0.5)
    # count agreement for each neighbour's vote (4x4 unrolled comparisons)
    best_count = jnp.zeros_like(Phi_c)
    best_k = jnp.zeros_like(Phi_c)
    for i in range(4):
        count_i = jnp.zeros_like(Phi_c)
        for j in range(4):
            agree = valids[j] & (votes[j] == votes[i])
            count_i = count_i + agree.astype(jnp.float32)
        cand = valids[i] & (votes[i] != 0)
        better = cand & (count_i > best_count)
        best_count = jnp.where(better, count_i, best_count)
        best_k = jnp.where(better, votes[i], best_k)
    take = mask & (best_count >= 3.0)
    Phi_new = jnp.where(take, Phi_c + TWO_PI * best_k, Phi_c)
    return Phi_new, q_c


# --- quality-guided wavefront unwrap (component 8 proper) -------------------
#
# The reference's priority-queue flood fill processes pixels in strictly
# decreasing quality order, unwrapping each new pixel against an
# already-unwrapped neighbour. TPU reformulation ([B:5] "vectorized
# quality-guided unwrapping"): the priority queue becomes L descending
# quality thresholds (the iterative threshold-lowering front); within a
# level the wavefront grows by directional line scans whose per-pixel
# elements form a monoid, so a whole scanline unwraps in ONE
# lax.associative_scan (log-depth, fully vectorized) instead of one
# pixel per queue pop.
#
# Monoid: each pixel along the scan direction acts as a function of the
# absolute phase arriving from upstream:
#   CONST(v): already-unwrapped pixel -> emits v, ignores upstream;
#   CHAIN(p): eligible pixel with wrapped phase p -> unwraps itself
#             against whatever arrives: out = p + 2pi*round((in-p)/2pi);
#   KILL:     masked / below-threshold pixel -> blocks propagation.
# Function composition is associative, and the closure of these under
# composition stays representable with four fields
#   tag: 2=CONST (value pe) | 1=CHAIN(ps, pe, c) | 0=KILL
#   CHAIN(ps, pe, c)(x) = pe + 2pi*(round((x - ps)/2pi) + c)
# because round((p + 2pi k - p')/2pi) = k + round((p - p')/2pi) for
# integer k — chained unwraps collapse into one round plus an integer.


def _compose(x, y):
    """Monoid combine: the function 'x then y' (y downstream of x)."""
    tx, psx, pex, cx = x
    ty, psy, pey, cy = y
    k = jnp.round((pex - psy) / TWO_PI)
    const_val = pey + TWO_PI * (k + cy)       # x CONST feeding y CHAIN
    chain_c = cx + cy + k                     # x CHAIN feeding y CHAIN
    y_is_chain = ty == 1
    tag = jnp.where(y_is_chain,
                    jnp.where(tx == 2, 2, jnp.where(tx == 1, 1, 0)), ty)
    ps = jnp.where(y_is_chain & (tx == 1), psx, psy)
    pe = jnp.where(y_is_chain & (tx == 2), const_val, pey)
    c = jnp.where(y_is_chain & (tx == 1), chain_c, cy)
    return tag, ps, pe, c


def _directional_pass(Phi, done, phi, eligible, axis: int, reverse: bool):
    """One line-scan growth pass over the whole image (one direction)."""
    tag = jnp.where(done, 2, jnp.where(eligible, 1, 0)).astype(jnp.int32)
    ps = phi
    pe = jnp.where(done, Phi, phi)
    c = jnp.zeros_like(phi)
    tg, _, pe_o, _ = jax.lax.associative_scan(
        _compose, (tag, ps, pe, c), axis=axis, reverse=reverse
    )
    reached = eligible & ~done & (tg == 2)
    return jnp.where(reached, pe_o, Phi), done | reached


def quality_guided_unwrap(
    phi,                     # (H,W) wrapped phase (any 2pi-branch, e.g. [0,2pi))
    quality,                 # (H,W) >= 0 modulation map
    mask,                    # (H,W) bool valid pixels
    Phi_init=None,           # (H,W) initial absolute phase (repair mode)
    trust=None,              # (H,W) bool: pixels whose Phi_init is kept fixed
    levels: int = 4,
    rounds_per_level: int = 2,
):
    """Quality-ordered wavefront phase unwrapping (SURVEY.md component 8).

    Two modes:
    - **phase-only** (Phi_init None): a single seed — the highest-quality
      masked pixel — anchors the absolute phase; everything reachable
      through the mask unwraps from it, high-quality regions first.
    - **repair** (Phi_init + trust given): trusted pixels keep their
      temporal (Gray-code) absolute phase and act as wavefront sources;
      every untrusted pixel's fringe order is RE-DERIVED by propagation
      from the trusted set, which repairs multi-pixel order-error blobs
      that local voting (spatial_quality_unwrap) cannot. Unreached
      pixels fall back to Phi_init.

    The front lowers the quality threshold over ``levels`` steps
    (quantiles of the masked quality map), so propagation paths prefer
    high-modulation pixels exactly like the reference's priority queue.
    Returns (Phi, reached): absolute phase and the bool map of pixels
    anchored to a source.
    """
    phi = phi.astype(jnp.float32)
    q = jnp.where(mask, quality, 0.0).astype(jnp.float32)
    if Phi_init is None:
        flat = jnp.argmax(jnp.where(mask, q, -1.0))
        done = jnp.zeros(phi.shape, bool).reshape(-1).at[flat].set(True)
        done = done.reshape(phi.shape) & mask
        Phi = phi
    else:
        assert trust is not None, "repair mode needs a trust mask"
        done = trust & mask
        Phi = Phi_init.astype(jnp.float32)

    # descending quality thresholds: quantiles of the valid-pixel quality
    qs = jnp.nanquantile(
        jnp.where(mask, q, jnp.nan),
        jnp.linspace(1.0 - 1.0 / levels, 0.0, levels),
    )

    def level_body(i, state):
        Phi_c, done_c = state
        thresh = qs[i]
        eligible = mask & (q >= thresh)

        def round_body(_, st):
            Ph, dn = st
            for axis, rev in ((1, False), (1, True), (0, False), (0, True)):
                Ph, dn = _directional_pass(Ph, dn, phi, eligible, axis, rev)
            return Ph, dn

        return jax.lax.fori_loop(0, rounds_per_level, round_body,
                                 (Phi_c, done_c))

    Phi, done = jax.lax.fori_loop(0, levels, level_body, (Phi, done))
    return Phi, done


def quality_guided_repair(Phi, quality, mask, trust_quantile: float = 0.5,
                          levels: int = 4, rounds_per_level: int = 2):
    """Blob-capable order-error repair on a temporally-unwrapped map.

    Pixels above the ``trust_quantile`` of the masked quality
    distribution anchor the wavefront; the fringe order of everything
    below is re-derived by quality-guided propagation (wrapped phase is
    always trustworthy — only the order k is re-chosen). Unreached
    pixels keep their temporal value.
    """
    phi = jnp.mod(Phi, TWO_PI)
    q = jnp.where(mask, quality, jnp.nan)
    thr = jnp.nanquantile(q, trust_quantile)
    trust = mask & (quality >= thr)
    out, _ = quality_guided_unwrap(
        phi, quality, mask, Phi_init=Phi, trust=trust,
        levels=levels, rounds_per_level=rounds_per_level,
    )
    return out
