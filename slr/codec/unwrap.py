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


def _shift_zero(a, dy, dx):
    """roll + zero-fill at borders (no wraparound leakage). Implemented
    with iota masks (not .at[].set) so it lowers inside Pallas kernels."""
    out = jnp.roll(a, shift=(dy, dx), axis=(0, 1))
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


def propagation_step(Phi_c, q_c, mask):
    """One quality-guided label-propagation sweep (shared by the jnp path
    above and the Pallas kernel in slr.kernels.unwrap_scan, so both have
    identical semantics)."""
    wsum = jnp.zeros_like(Phi_c)
    psum = jnp.zeros_like(Phi_c)
    qmax = jnp.zeros_like(Phi_c)
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        w = _shift_zero(q_c, dy, dx)
        p = _shift_zero(Phi_c * q_c, dy, dx)
        wsum = wsum + w
        psum = psum + p
        qmax = jnp.maximum(qmax, w)
    consensus = psum / jnp.where(wsum > 0, wsum, 1.0)
    k_fix = jnp.round((consensus - Phi_c) / TWO_PI)
    take = mask & (wsum > 0) & (q_c < qmax) & (k_fix != 0)
    Phi_new = jnp.where(take, Phi_c + TWO_PI * k_fix, Phi_c)
    # repaired pixels inherit the consensus quality so fixes propagate
    q_new = jnp.where(take, qmax, q_c)
    return Phi_new, q_new
