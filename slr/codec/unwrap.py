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
    """Fixed-iteration quality-guided fringe-order repair.

    Each iteration computes, per pixel, the quality-weighted mean absolute
    phase of the 4-neighbourhood and snaps the pixel's fringe order by an
    integer number of periods toward that consensus — but only where the
    pixel's quality is below the consensus quality (high-quality pixels
    anchor the propagation, mirroring the reference's process-best-first
    flood fill). Masked-out pixels contribute nothing and are not updated.

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
