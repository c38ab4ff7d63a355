"""Multi-frequency phase-shift coding (phase-only, no Gray code).

The second classic temporal-coding family the reference lineage supports
(SURVEY.md 4.1 "single or multi frequency", [P:6] coded phase-shift
scanners): project N-step fringe sets at F decreasing pitches
p_0 > p_1 > ... (p_0 spanning the full width so its phase is already
absolute) and unwrap hierarchically — each finer level's fringe order
comes from the previous level's absolute phase:

    k_i = round((Phi_{i-1} * p_{i-1} / p_i) - phi_i) / (2 pi))
    Phi_i = phi_i + 2 pi k_i

Fewer frames than Gray+phase for the same depth resolution when the
noise floor allows the frequency ratios.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from slr.codec.phaseshift import decode_phase, generate_phase_patterns

TWO_PI = 2.0 * jnp.pi


def default_pitches(width: int, levels: int = 3, ratio: float = 8.0):
    """Geometric pitch ladder: level 0 spans the full width."""
    return [width / (ratio ** i) for i in range(levels)]


def generate_multifreq_stack(width: int, height: int, pitches: Sequence[float],
                             steps: int = 4):
    """(white, black, then steps fringes per pitch) -> (2+F*steps, H, W)."""
    frames = [jnp.ones((height, width), jnp.float32),
              jnp.zeros((height, width), jnp.float32)]
    for p in pitches:
        ph = generate_phase_patterns(width, p, steps)
        frames.append(jnp.broadcast_to(ph[:, None, :], (steps, height, width)))
    flat = [f[None] if f.ndim == 2 else f for f in frames]
    return jnp.concatenate(flat, axis=0)


def decode_multifreq(frames, pitches: Sequence[float], steps: int = 4,
                     black_threshold: float = 0.1,
                     modulation_threshold: float = 0.05):
    """Hierarchical unwrap: (x_p, mask, quality) from a multi-freq stack.

    frames: (2 + len(pitches)*steps, H, W) in the generate_multifreq_stack
    layout. x_p is the sub-pixel projector column from the FINEST pitch.
    """
    white, black = frames[0], frames[1]
    mask = (white - black) > black_threshold
    Phi_abs = None
    quality = None
    for i, p in enumerate(pitches):
        sl = frames[2 + i * steps: 2 + (i + 1) * steps]
        phi, B = decode_phase(sl, steps)
        mask = mask & (B > modulation_threshold)
        if Phi_abs is None:
            Phi_abs = phi          # pitch 0 spans the width: already absolute
            quality = B
        else:
            prev_in_cur = Phi_abs * (pitches[i - 1] / p)  # phase @ cur pitch
            k = jnp.round((prev_in_cur - phi) / TWO_PI)
            Phi_abs = phi + TWO_PI * k
            quality = jnp.minimum(quality, B)
    x_p = Phi_abs * pitches[-1] / TWO_PI
    # atan2 rounding at x=0 can wrap to the top of the unambiguous range
    # (one coarse period); fold it back, as in the Gray-code path
    x_p = jnp.where(x_p > pitches[0] - 0.5, x_p - pitches[0], x_p)
    return x_p, mask, quality
