"""Transcendentals implemented for the Pallas TPU lowering.

The Mosaic TC lowering in this environment has no atan/atan2 primitive
(NotImplementedError at lowering time), so the phase-decode kernel brings
its own: an 11th-order odd minimax polynomial for atan on [-1, 1] (max
error ~1e-6 rad, far below the phase-noise floor; x_p error contribution
~1e-6 projector px), range-reduced by atan(x) = pi/2 - atan(1/x), with
standard quadrant fixup for atan2. VPU-only ops: mul/add/select/rsqrt.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Remez coefficients for atan(x)/x on [-1, 1] in f32
_A1 = 0.99997726
_A3 = -0.33262347
_A5 = 0.19354346
_A7 = -0.11643287
_A9 = 0.05265332
_A11 = -0.01172120


def atan_poly(x):
    """atan for |x| <= 1 (polynomial in x^2, Horner)."""
    x2 = x * x
    p = _A11
    p = p * x2 + _A9
    p = p * x2 + _A7
    p = p * x2 + _A5
    p = p * x2 + _A3
    p = p * x2 + _A1
    return x * p


def atan2(y, x):
    """Elementwise atan2(y, x) in (-pi, pi], Pallas-lowerable."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    # t = min/max in [0,1]; swap-based range reduction
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    den = jnp.where(den == 0.0, 1.0, den)  # (0,0) -> angle 0
    t = num / den
    r = atan_poly(t)
    r = jnp.where(swap, (0.5 * math.pi) - r, r)
    # quadrant fixup on signs of x, y
    r = jnp.where(x < 0.0, math.pi - r, r)
    r = jnp.where(y < 0.0, -r, r)
    both_zero = (jnp.abs(x) == 0.0) & (jnp.abs(y) == 0.0)
    return jnp.where(both_zero, 0.0, r)
