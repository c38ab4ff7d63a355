"""Full pattern-stack assembly and decoding (SURVEY.md section 4.1-4.3).

Frame-stack layout (the order in which the reference-style scan controller
would project; SURVEY.md E3/E4):

    0: all-white, 1: all-black,
    2 .. 2+B-1:       column Gray-code patterns (MSB first),
    2+B .. 2+2B-1:    their inverses            (if use_inverse),
    [row Gray codes + inverses, if row_gray_bits > 0]
    last N:           phase-shift fringes k = 0..N-1.

``generate_pattern_stack`` returns the (F, H_p, W_p) projector images;
``decode_stack`` turns the captured (F, H_c, W_c) camera stack into
(x_p, [y_p], mask, quality) per camera pixel — the complete per-pixel
decode path (components 4-7) as a single jit-able function. The Pallas
fused version is slr.kernels.decode_kernel; it is tested against this.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from slr.config import DecodeConfig, PatternConfig
from slr.codec.graycode import decode_gray, generate_gray_patterns
from slr.codec.phaseshift import decode_phase, generate_phase_patterns
from slr.codec.unwrap import unwrap_temporal

TWO_PI = 2.0 * jnp.pi


class DecodeResult(NamedTuple):
    x_p: jnp.ndarray          # (H,W) sub-pixel projector column
    y_p: Optional[jnp.ndarray]  # (H,W) projector row (None if not coded)
    mask: jnp.ndarray         # (H,W) bool valid-pixel mask
    quality: jnp.ndarray      # (H,W) phase modulation B (or contrast)


def generate_pattern_stack(cfg: PatternConfig):
    """(num_frames, proj_height, proj_width) float32 in [0,1]."""
    W, H = cfg.proj_width, cfg.proj_height
    if cfg.coding == "multifreq":
        from slr.codec.multifreq import generate_multifreq_stack

        stack = generate_multifreq_stack(W, H, cfg.mf_pitches,
                                         steps=cfg.phase_steps)
        assert stack.shape[0] == cfg.num_frames, (stack.shape, cfg.num_frames)
        return stack
    frames = [jnp.ones((H, W), jnp.float32), jnp.zeros((H, W), jnp.float32)]

    col = generate_gray_patterns(W, cfg.gray_bits, half_shift=cfg.phase_steps > 0,
                                 antialias=True)
    col_imgs = jnp.broadcast_to(col[:, None, :], (cfg.gray_bits, H, W))
    frames.append(col_imgs)
    if cfg.use_inverse:
        frames.append(1.0 - col_imgs)

    if cfg.row_gray_bits:
        row = generate_gray_patterns(H, cfg.row_gray_bits,
                                     half_shift=cfg.row_phase_steps > 0,
                                     antialias=True)
        row_imgs = jnp.broadcast_to(row[:, :, None], (cfg.row_gray_bits, H, W))
        frames.append(row_imgs)
        if cfg.use_inverse:
            frames.append(1.0 - row_imgs)

    if cfg.phase_steps:
        ph = generate_phase_patterns(W, cfg.fringe_pitch, cfg.phase_steps)
        frames.append(jnp.broadcast_to(ph[:, None, :], (cfg.phase_steps, H, W)))

    if cfg.row_phase_steps:
        rp = generate_phase_patterns(H, cfg.row_fringe_pitch,
                                     cfg.row_phase_steps)
        frames.append(
            jnp.broadcast_to(rp[:, :, None], (cfg.row_phase_steps, H, W)))

    flat = [f[None] if f.ndim == 2 else f for f in frames]
    stack = jnp.concatenate(flat, axis=0)
    assert stack.shape[0] == cfg.num_frames, (stack.shape, cfg.num_frames)
    return stack


def _slices(cfg: PatternConfig):
    """Frame-index bookkeeping for the stack layout above."""
    i = 2
    s = {"white": 0, "black": 1}
    s["col"] = (i, i + cfg.gray_bits); i += cfg.gray_bits
    if cfg.use_inverse:
        s["col_inv"] = (i, i + cfg.gray_bits); i += cfg.gray_bits
    if cfg.row_gray_bits:
        s["row"] = (i, i + cfg.row_gray_bits); i += cfg.row_gray_bits
        if cfg.use_inverse:
            s["row_inv"] = (i, i + cfg.row_gray_bits); i += cfg.row_gray_bits
    if cfg.phase_steps:
        s["phase"] = (i, i + cfg.phase_steps); i += cfg.phase_steps
    if cfg.row_phase_steps:
        s["row_phase"] = (i, i + cfg.row_phase_steps); i += cfg.row_phase_steps
    assert i == cfg.num_frames
    return s


def decode_stack(frames, cfg: PatternConfig, dec: DecodeConfig,
                 bit_depth: int | None = None) -> DecodeResult:
    """Captured (F,H,W) stack -> sub-pixel projector coords + mask + quality.

    Accepts float32 frames in [0,1] or raw integer camera frames, which
    are normalized to [0,1] so thresholds keep one meaning. ``bit_depth``
    gives the true ADC range for sensors delivering fewer bits than their
    container (e.g. 10/12-bit data in uint16: pass bit_depth=10/12 —
    dividing by the container max would scale values 16-64x too small and
    break every threshold); default is the container's full range.
    """
    if jnp.issubdtype(frames.dtype, jnp.integer):
        m = ((1 << bit_depth) - 1 if bit_depth is not None
             else jnp.iinfo(frames.dtype).max)
        frames = frames.astype(jnp.float32) / float(m)
    if cfg.coding == "multifreq":
        from slr.codec.multifreq import decode_multifreq

        x_p, mask, quality = decode_multifreq(
            frames, cfg.mf_pitches, steps=cfg.phase_steps,
            black_threshold=dec.black_threshold,
            modulation_threshold=dec.modulation_threshold)
        return DecodeResult(x_p=x_p, y_p=None, mask=mask, quality=quality)
    s = _slices(cfg)
    white, black = frames[s["white"]], frames[s["black"]]

    a, b = s["col"]
    col_pat = frames[a:b]
    if cfg.use_inverse:
        ai, bi = s["col_inv"]
        col_inv = frames[ai:bi]
    else:
        col_inv = 0.5 * (white + black)[None] * jnp.ones_like(col_pat)

    code, mask = decode_gray(
        col_pat, col_inv, white, black, cfg.gray_bits,
        dec.black_threshold, dec.white_threshold,
    )

    if cfg.phase_steps:
        pa, pb = s["phase"]
        phi, modulation = decode_phase(frames[pa:pb], cfg.phase_steps)
        mask = mask & (modulation > dec.modulation_threshold)
        Phi = unwrap_temporal(phi, code, cfg.gray_bits, half_shifted=True)
        x_p = Phi * cfg.fringe_pitch / TWO_PI
        # the half-shifted code is cyclic with period == coded width, so the
        # coordinate is recovered modulo W_coded; wrap the top edge back
        w_coded = cfg.fringe_pitch * (1 << cfg.gray_bits)
        x_p = jnp.where(x_p > w_coded - 0.5, x_p - w_coded, x_p)
        quality = modulation
    else:
        # Gray-code only: stripe centre, half-stripe resolution
        pitch = cfg.proj_width / (1 << cfg.gray_bits)
        x_p = (code.astype(jnp.float32) + 0.5) * pitch
        quality = white - black

    y_p = None
    if cfg.row_gray_bits:
        ra, rb = s["row"]
        row_pat = frames[ra:rb]
        if cfg.use_inverse:
            ria, rib = s["row_inv"]
            row_inv = frames[ria:rib]
        else:
            row_inv = 0.5 * (white + black)[None] * jnp.ones_like(row_pat)
        row_code, row_mask = decode_gray(
            row_pat, row_inv, white, black, cfg.row_gray_bits,
            dec.black_threshold, dec.white_threshold,
        )
        mask = mask & row_mask
        if cfg.row_phase_steps:
            rpa, rpb = s["row_phase"]
            rphi, rmod = decode_phase(frames[rpa:rpb], cfg.row_phase_steps)
            mask = mask & (rmod > dec.modulation_threshold)
            rPhi = unwrap_temporal(rphi, row_code, cfg.row_gray_bits,
                                   half_shifted=True)
            y_p = rPhi * cfg.row_fringe_pitch / TWO_PI
            h_coded = cfg.row_fringe_pitch * (1 << cfg.row_gray_bits)
            y_p = jnp.where(y_p > h_coded - 0.5, y_p - h_coded, y_p)
        else:
            row_pitch = cfg.proj_height / (1 << cfg.row_gray_bits)
            y_p = (row_code.astype(jnp.float32) + 0.5) * row_pitch

    return DecodeResult(x_p=x_p, y_p=y_p, mask=mask, quality=quality)
