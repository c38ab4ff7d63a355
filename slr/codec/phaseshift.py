"""N-step phase-shift fringe generation and wrapped-phase decoding.

SURVEY.md components 2 (generator) and 6 (decoder). Fringes:
``I_k(x) = A + B cos(2 pi x / p - 2 pi k / N)``; the N-step least-squares
phase estimate is

    phi = atan2(sum_k I_k sin(2 pi k/N), sum_k I_k cos(2 pi k/N))

which equals ``2 pi x / p mod 2 pi``, and the modulation
``B = (2/N) sqrt(S^2 + C^2)`` gates low-signal pixels (SURVEY.md 4.2,
[P:7] Gray-coded-light phase measurement). f32 throughout — phase math is
precision-critical (SURVEY.md section 6 numerics).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def generate_phase_patterns(
    width: int, pitch: float, steps: int, amplitude: float = 0.5, offset: float = 0.5
):
    """(steps, width) fringe profiles I_k(x) = offset + amplitude*cos(2pi x/p - 2pi k/N)."""
    x = jnp.arange(width, dtype=jnp.float32)
    k = jnp.arange(steps, dtype=jnp.float32)
    phase = TWO_PI * x[None, :] / pitch - TWO_PI * k[:, None] / steps
    return offset + amplitude * jnp.cos(phase)


def decode_phase(frames, steps: int):
    """Wrapped phase + modulation from the (steps, H, W) fringe stack.

    Returns (phi in [0, 2pi), modulation B >= 0). phi is the sub-pixel
    position within one fringe period: x mod p = phi * p / (2 pi).
    """
    k = jnp.arange(steps, dtype=jnp.float32)
    delta = TWO_PI * k / steps
    s = jnp.sin(delta)[:, None, None]
    c = jnp.cos(delta)[:, None, None]
    S = jnp.sum(frames * s, axis=0)
    C = jnp.sum(frames * c, axis=0)
    phi = jnp.arctan2(S, C)  # (-pi, pi]
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)  # -> [0, 2pi)
    B = (2.0 / steps) * jnp.sqrt(S * S + C * C)
    return phi, B
