"""Gray-code pattern generation and per-pixel decoding.

SURVEY.md components 1 (generator) and 5 (decoder) + the shadow/certainty
mask of component 4. The reference does this with per-pixel C++ loops over
cv::Mat; here the whole image decodes as a handful of vectorized ops on the
(F, H, W) frame stack — XLA fuses the comparisons and the Gray->binary XOR
chain into a single memory-bound pass.

Gray code: g = b ^ (b >> 1). Decode: b_0 = g_0 (MSB), b_i = b_{i-1} ^ g_i.
Patterns are MSB-first: frame i stripes the projector into 2^(i+1) bands.
"""

from __future__ import annotations

import jax.numpy as jnp


def gray_encode(n):
    """Integer -> Gray code (elementwise)."""
    n = jnp.asarray(n)
    return n ^ (n >> 1)


def gray_decode_int(g, bits: int):
    """Gray code -> integer, by the prefix-XOR chain over ``bits`` bits."""
    g = jnp.asarray(g)
    b = jnp.zeros_like(g)
    shift = 1
    # prefix XOR via doubling: O(log bits) ops instead of a per-bit loop
    b = g
    while shift < bits:
        b = b ^ (b >> shift)
        shift <<= 1
    return b


def generate_gray_patterns(width: int, bits: int, half_shift: bool = False,
                           antialias: bool = False):
    """Per-bit stripe patterns for a ``width``-pixel projector axis.

    Returns (bits, width) float32 in [0,1]; row ``i`` is bit ``bits-1-i`` of
    the Gray code of the stripe index — i.e. MSB first, matching the usual
    projection order (coarse stripes first).

    The stripe index of pixel x is ``x * 2**bits // width`` (equal-width
    stripes even when width is not a power of two). With ``half_shift``
    the stripes are offset by half a stripe width and wrap cyclically
    (stripe = floor(x/p + 1/2) mod 2^bits) — the complementary-Gray-code
    layout whose transitions fall mid-fringe, used for robust temporal
    unwrapping (see slr.codec.unwrap, [P:7]). The Gray code stays a valid
    cyclic code across the wrap (2^bits-1 -> 0 is a 1-bit transition).
    """
    n = 1 << bits
    bit_idx = jnp.arange(bits - 1, -1, -1, dtype=jnp.int32)  # MSB first

    def bits_at(x4):
        # x4: pixel coordinate scaled by 4 (quarter-pixel sampling grid)
        if half_shift:
            stripe = ((x4 * n * 2 + 4 * width) // (8 * width)) % n
        else:
            stripe = jnp.clip((x4 * n) // (4 * width), 0, n - 1)
        g = gray_encode(stripe)
        return ((g[None, :] >> bit_idx[:, None]) & 1).astype(jnp.float32)

    x4 = 4 * jnp.arange(width, dtype=jnp.int32)
    if not antialias:
        return bits_at(x4)
    # 2x supersample at x -/+ 0.25: a stripe edge falling inside the pixel
    # footprint yields 0.5 — the intermediate value a real camera pixel
    # integrates at a blurred edge, which the certainty mask then rejects.
    return 0.5 * (bits_at(x4 - 1) + bits_at(x4 + 1))


def decode_gray(
    frames_pat,
    frames_inv,
    white,
    black,
    bits: int,
    black_threshold: float = 0.1,
    white_threshold: float = 0.02,
):
    """Per-pixel Gray decode with shadow + certainty masking.

    frames_pat/frames_inv: (bits, H, W) captured pattern / inverse stacks
    (MSB first). white/black: (H, W) all-on / all-off frames.

    Returns (code (H,W) int32 stripe index, mask (H,W) bool).
    mask = contrast gate  AND  per-bit certainty gate (SURVEY.md 4.2).
    """
    contrast = white - black
    mask = contrast > black_threshold
    diff = frames_pat - frames_inv
    bits_on = diff > 0
    certain = jnp.all(jnp.abs(diff) > white_threshold, axis=0)
    mask = mask & certain
    # Pack bits MSB-first into the Gray value, then prefix-XOR decode.
    weights = (1 << jnp.arange(bits - 1, -1, -1, dtype=jnp.int32))
    g = jnp.sum(bits_on.astype(jnp.int32) * weights[:, None, None], axis=0)
    code = gray_decode_int(g, bits)
    return code, mask
