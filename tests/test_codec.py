"""Tests for Gray-code/phase-shift codecs and unwrapping.

Property tests over all stripe indices, analytic fringe recovery with noise
bounds, and order-correction behaviour at code boundaries (SURVEY.md
section 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr.codec import (
    gray_encode, gray_decode_int, generate_gray_patterns, decode_gray,
    generate_phase_patterns, decode_phase, unwrap_temporal,
    spatial_quality_unwrap, generate_pattern_stack, decode_stack,
)
from slr.config import DecodeConfig, PatternConfig

TWO_PI = 2.0 * np.pi


def test_gray_roundtrip_property():
    n = jnp.arange(1 << 12)
    g = gray_encode(n)
    # gray code: consecutive values differ in exactly one bit
    diff = g[1:] ^ g[:-1]
    assert bool(jnp.all((diff & (diff - 1)) == 0))
    back = gray_decode_int(g, 12)
    assert bool(jnp.all(back == n))


def test_gray_pattern_decode_all_columns():
    W, bits = 1024, 10
    pats = generate_gray_patterns(W, bits)           # (bits, W)
    frames = jnp.broadcast_to(pats[:, None, :], (bits, 4, W))
    inv = 1.0 - frames
    white = jnp.ones((4, W))
    black = jnp.zeros((4, W))
    code, mask = decode_gray(frames, inv, white, black, bits)
    stripe_true = (jnp.arange(W) * (1 << bits)) // W
    assert bool(jnp.all(mask))
    assert bool(jnp.all(code == stripe_true[None, :]))


def test_gray_mask_rejects_shadow():
    W, bits = 256, 8
    pats = generate_gray_patterns(W, bits)
    frames = jnp.broadcast_to(pats[:, None, :], (bits, 2, W)) * 0.02  # dark
    inv = (1.0 - jnp.broadcast_to(pats[:, None, :], (bits, 2, W))) * 0.02
    white = jnp.full((2, W), 0.03)
    black = jnp.zeros((2, W))
    _, mask = decode_gray(frames, inv, white, black, bits,
                          black_threshold=0.1, white_threshold=0.02)
    assert not bool(jnp.any(mask))


def test_phase_decode_analytic():
    W, pitch, N = 512, 32.0, 4
    pats = generate_phase_patterns(W, pitch, N)      # (N, W)
    frames = jnp.broadcast_to(pats[:, None, :], (N, 3, W))
    phi, B = decode_phase(frames, N)
    x = jnp.arange(W, dtype=jnp.float32)
    phi_true = jnp.mod(TWO_PI * x / pitch, TWO_PI)
    err = jnp.abs(phi[0] - phi_true[None, :][0])
    err = jnp.minimum(err, TWO_PI - err)             # circular distance
    assert float(jnp.max(err)) < 1e-4
    np.testing.assert_allclose(np.asarray(B), 0.5, atol=1e-4)


def test_phase_decode_noise_floor():
    W, pitch, N = 512, 32.0, 4
    pats = generate_phase_patterns(W, pitch, N)
    key = jax.random.PRNGKey(0)
    noise = 0.01 * jax.random.normal(key, (N, 16, W))
    frames = jnp.broadcast_to(pats[:, None, :], (N, 16, W)) + noise
    phi, B = decode_phase(frames, N)
    x = jnp.arange(W, dtype=jnp.float32)
    phi_true = jnp.mod(TWO_PI * x / pitch, TWO_PI)
    err = jnp.abs(phi - phi_true[None, :])
    err = jnp.minimum(err, TWO_PI - err)
    # phase noise ~ sqrt(2/N) * sigma / B = sqrt(0.5)*0.01/0.5 ~ 0.014 rad
    assert float(jnp.percentile(err, 99.0)) < 0.1


def test_unwrap_temporal_half_shifted_exact():
    """Full synthetic 1-D axis: shifted cyclic code + fringes -> exact x."""
    W, bits = 1024, 6
    pitch = W / (1 << bits)
    x = jnp.arange(W, dtype=jnp.float32)[None, :]    # (1, W) as an image row
    # phase truth in f64 to avoid mod-reduction knife edges at phi == pi
    phi = jnp.asarray(
        np.mod(TWO_PI * np.arange(W, dtype=np.float64) / pitch, TWO_PI),
        jnp.float32,
    )[None, :]
    n = 1 << bits
    stripe = ((2 * jnp.arange(W) * n + W) // (2 * W)) % n
    Phi = unwrap_temporal(phi, stripe[None, :], bits, half_shifted=True)
    x_rec = Phi * pitch / TWO_PI
    assert float(jnp.max(jnp.abs(x_rec - x))) < 1e-3


def test_unwrap_temporal_robust_to_code_noise():
    """Flip codes near stripe transitions by +-1: unwrap must self-correct
    because transitions sit mid-fringe (half-shifted layout)."""
    W, bits = 1024, 6
    pitch = W / (1 << bits)
    n = 1 << bits
    x = jnp.arange(W, dtype=jnp.float32)
    phi = jnp.mod(TWO_PI * x / pitch, TWO_PI)
    stripe = ((2 * jnp.arange(W) * n + W) // (2 * W)) % n
    # corrupt: near each transition, code jitters one stripe early/late
    frac = jnp.mod(x / pitch + 0.5, 1.0)
    near_edge = (frac < 0.06) | (frac > 0.94)
    noisy = jnp.where(near_edge, (stripe + 1) % n, stripe)
    Phi = unwrap_temporal(phi[None], noisy[None], bits, half_shifted=True)
    x_rec = Phi[0] * pitch / TWO_PI
    err = jnp.abs(x_rec - x)
    # jittered codes at the edge move the answer by a full stripe for the
    # corrupted pixels ONLY if phi disagrees; half-shift tolerates +-1 code
    # errors whenever the pixel is not exactly at the transition.
    ok = err < 1e-3
    frac_bad = 1.0 - jnp.mean(ok.astype(jnp.float32))
    assert float(frac_bad) < 0.07  # only the truly ambiguous edge sliver


def test_unwrap_temporal_aligned_mode():
    W, bits = 512, 5
    pitch = W / (1 << bits)
    x = jnp.arange(W, dtype=jnp.float32)
    phi = jnp.mod(TWO_PI * x / pitch, TWO_PI)
    stripe = (jnp.arange(W) * (1 << bits)) // W
    Phi = unwrap_temporal(phi[None], stripe[None], bits, half_shifted=False)
    x_rec = Phi[0] * pitch / TWO_PI
    # interior pixels exact; boundary pixels may sit on the wrap
    err = jnp.abs(x_rec - x)
    assert float(jnp.percentile(err, 95)) < 1e-3


def test_spatial_quality_unwrap_repairs_outliers():
    H, W = 32, 64
    Phi_true = jnp.broadcast_to(
        jnp.linspace(0, 40.0, W)[None, :], (H, W)
    ).astype(jnp.float32)
    q = jnp.ones((H, W), jnp.float32)
    # inject isolated 2pi fringe-order errors at low-quality pixels
    rng = np.random.default_rng(0)
    bad = np.zeros((H, W), bool)
    bad[rng.integers(1, H - 1, 40), rng.integers(1, W - 1, 40)] = True
    bad = jnp.asarray(bad)
    Phi_noisy = jnp.where(bad, Phi_true + TWO_PI * 2.0, Phi_true)
    q = jnp.where(bad, 0.1, 1.0)
    mask = jnp.ones((H, W), bool)
    Phi_fixed = spatial_quality_unwrap(Phi_noisy, q, mask, iters=8)
    err = jnp.abs(Phi_fixed - Phi_true)
    assert float(jnp.max(err)) < 0.8  # all 2pi jumps removed


def test_pattern_stack_shapes_and_decode_roundtrip():
    """Direct capture (camera == projector pixels): decode must be exact."""
    cfg = PatternConfig(proj_width=256, proj_height=64, gray_bits=5,
                        phase_steps=4)
    dec = DecodeConfig()
    stack = generate_pattern_stack(cfg)
    assert stack.shape == (cfg.num_frames, 64, 256)
    res = decode_stack(stack, cfg, dec)
    x_true = jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32)[None, :], (64, 256))
    err = jnp.abs(res.x_p - x_true)
    valid = res.mask
    assert float(jnp.mean(valid.astype(jnp.float32))) > 0.8
    assert float(jnp.max(jnp.where(valid, err, 0.0))) < 0.05


def test_pattern_stack_gray_only_decode():
    cfg = PatternConfig(proj_width=256, proj_height=32, gray_bits=8,
                        phase_steps=0)
    dec = DecodeConfig()
    stack = generate_pattern_stack(cfg)
    res = decode_stack(stack, cfg, dec)
    x_true = jnp.arange(256, dtype=jnp.float32)[None, :]
    err = jnp.abs(res.x_p - x_true)
    # gray-only: half-stripe quantization => max error 0.5 px at 8 bits/256
    assert float(jnp.max(jnp.where(res.mask, err, 0.0))) <= 0.5 + 1e-5


def test_spatial_unwrap_repairs_blob():
    """A 1-wide run of fringe-order errors is repaired end-inward over
    successive strict-vote sweeps. (2x2+ blobs deadlock by design: each
    blob pixel keeps 2 agreeing wrong neighbours, and relaxing the
    3-vote threshold was measured to corrupt genuine depth edges.)"""
    H, W = 24, 48
    Phi_true = jnp.broadcast_to(
        jnp.linspace(0, 30.0, W)[None, :], (H, W)
    ).astype(jnp.float32)
    bad = np.zeros((H, W), bool)
    bad[10, 19:23] = True  # 1x4 run
    Phi_n = jnp.where(jnp.asarray(bad), Phi_true + TWO_PI * 3, Phi_true)
    q = jnp.ones((H, W), jnp.float32)
    Phi_fix = spatial_quality_unwrap(Phi_n, q, jnp.ones((H, W), bool), iters=6)
    assert float(jnp.max(jnp.abs(Phi_fix - Phi_true))) < 0.5


# ---------------------------------------------------------------------------
# Quality-guided wavefront unwrap (component 8 proper, VERDICT r1 #4)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_wavefront_repairs_multipixel_blob():
    """A 2D blob of fringe-order errors deadlocks the strict voting
    (every blob pixel keeps agreeing wrong neighbours) but must fall to
    the quality-ordered wavefront, which re-derives the order of every
    low-quality pixel from the trusted surroundings."""
    from slr.codec import quality_guided_repair

    H, W = 48, 80
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    Phi_true = 0.5 * u + 0.2 * v
    blob = np.zeros((H, W), bool)
    blob[18:26, 30:42] = True          # 8 x 12 block
    blob[10:13, 55:58] = True          # second 3 x 3 block
    blob = jnp.asarray(blob)
    Phi_bad = jnp.where(blob, Phi_true + TWO_PI * 2, Phi_true)
    q = jnp.where(blob, 0.05, 1.0)
    mask = jnp.ones((H, W), bool)

    # voting cannot fix it
    Phi_vote = spatial_quality_unwrap(Phi_bad, q, mask, iters=8)
    assert float(jnp.max(jnp.abs(Phi_vote - Phi_true))) > TWO_PI

    Phi_wave = quality_guided_repair(Phi_bad, q, mask)
    assert float(jnp.max(jnp.abs(Phi_wave - Phi_true))) < 0.5


@pytest.mark.slow
def test_wavefront_phase_only_single_seed():
    """Unwrap a PHASE-ONLY map (no Gray code) from a single seed — the
    reference's quality-guided flood fill use case the voting repair
    cannot serve at all. Rendered scan: recover the projector coordinate
    up to one global fringe offset."""
    from slr.codec import quality_guided_unwrap
    from slr.codec.phaseshift import decode_phase
    from slr.synth import bumps_depth
    from slr.synth.render import default_rig, render_scan

    CAM_W, CAM_H = 256, 128
    cam, proj = default_rig(cam_w=CAM_W, cam_h=CAM_H, proj_w=256, proj_h=192,
                            baseline=150.0, toe_in_deg=14.0)
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=5,
                        phase_steps=4)
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=20.0)
    scan = render_scan(cam, proj, depth, cfg, noise_std=0.003,
                       key=jax.random.PRNGKey(5))
    # use ONLY the phase frames + white/black
    F = cfg.num_frames
    phase_frames = scan.frames[F - 4:]
    white, black = scan.frames[0], scan.frames[1]
    phi, B = decode_phase(phase_frames, 4)
    mask = ((white - black) > 0.1) & (B > 0.05) & scan.mask_true
    Phi, reached = jax.jit(quality_guided_unwrap)(phi, B, mask)
    Phi_true = scan.xp_true * (TWO_PI / cfg.fringe_pitch)
    # global offset: spatial unwrap is absolute only up to one 2pi k
    diff = jnp.where(mask & reached, Phi - Phi_true, jnp.nan)
    off = jnp.round(jnp.nanmedian(diff) / TWO_PI) * TWO_PI
    err = jnp.abs(jnp.where(mask & reached, Phi - Phi_true - off, 0.0))
    assert float(jnp.mean(reached & mask) / jnp.mean(mask)) > 0.99
    # sub-period accuracy everywhere reached (in projector px:
    # err_phi * pitch / 2pi < 0.25 px)
    err_px = err * cfg.fringe_pitch / TWO_PI
    assert float(jnp.max(err_px)) < 0.5, float(jnp.max(err_px))


def test_wavefront_prefers_quality_paths():
    """Propagation must route around a low-quality noisy band when a
    high-quality path exists (quality ordering, not raster ordering)."""
    from slr.codec import quality_guided_unwrap

    H, W = 40, 60
    v, u = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    Phi_true = 0.45 * u
    phi = jnp.mod(Phi_true, TWO_PI)
    # corrupt the wrapped phase inside a low-quality band that does NOT
    # fully sever the image (high-q corridor at the bottom)
    band = (v > 8) & (v < 30) & (u > 25) & (u < 35)
    rng = np.random.default_rng(7)
    phi_noisy = jnp.where(
        jnp.asarray(band),
        jnp.mod(phi + jnp.asarray(rng.uniform(-2.5, 2.5, (H, W)),
                                  jnp.float32), TWO_PI),
        phi,
    )
    q = jnp.where(jnp.asarray(band), 0.01, 1.0)
    mask = jnp.ones((H, W), bool)
    Phi, reached = jax.jit(quality_guided_unwrap)(phi_noisy, q, mask)
    good = ~np.asarray(band)
    err = np.abs(np.asarray(Phi) - np.asarray(Phi_true))[good]
    # every good pixel correct: the wavefront crossed via the corridor,
    # never through the noisy band while good pixels remained
    assert err.max() < 1e-3, err.max()


def test_multi_exposure_decode_covers_dark_and_saturated():
    """HDR bracket fusion (slr.codec.exposure): a low exposure decodes the
    bright half, a high exposure the dark half (where the low exposure's
    modulation dies); the fused decode covers both at full accuracy, and
    saturated pixels never win the per-pixel selection."""
    import jax

    from slr.codec import decode_multi_exposure
    from slr.synth import checker_albedo, render_scan
    from slr.synth.render import default_rig

    H, W = 192, 256
    cam, proj = default_rig(cam_w=W, cam_h=H, proj_w=256, proj_h=192)
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=6,
                        phase_steps=4)
    # left half nearly black (albedo 0.04), right half full white
    albedo = jnp.where(
        jnp.arange(W)[None, :] < W // 2, 0.04, 1.0
    ) * jnp.ones((H, 1))
    depth = jnp.full((H, W), 500.0, jnp.float32)
    # render noiselessly; exposure scales the SIGNAL and read noise is
    # added per capture (a longer exposure improves SNR — scaling an
    # already-noisy render would wrongly amplify the noise with the gain)
    scan = render_scan(cam, proj, depth, cfg, albedo=albedo)

    def exposed(gain, key):
        noisy = scan.frames * gain + 0.004 * jax.random.normal(
            key, scan.frames.shape)
        return jnp.clip(noisy, 0.0, 1.0)

    # the low exposure must sit BELOW full scale on the bright half (a
    # white frame at ADC full scale reads as saturated, as in a real
    # camera), the high exposure above it
    lo = exposed(0.6, jax.random.PRNGKey(1))
    hi = exposed(12.0, jax.random.PRNGKey(2))
    stacks = jnp.stack([lo, hi])

    dec = DecodeConfig()
    r_lo = decode_stack(lo, cfg, dec)
    r_hi = decode_stack(hi, cfg, dec)
    fused = decode_multi_exposure(stacks, cfg, dec)

    true_mask = np.asarray(scan.mask_true)
    n_lo = int((np.asarray(r_lo.mask) & true_mask).sum())
    n_hi = int((np.asarray(r_hi.mask) & true_mask).sum())
    n_f = int((np.asarray(fused.mask) & true_mask).sum())
    # each single exposure loses a half; fusion keeps (almost) everything
    assert n_f > 1.3 * max(n_lo, n_hi), (n_lo, n_hi, n_f)
    assert n_f > 0.9 * true_mask.sum()

    # accuracy everywhere the fused decode claims validity
    valid = np.asarray(fused.mask) & true_mask
    err = np.abs(np.asarray(fused.x_p) - np.asarray(scan.xp_true))[valid]
    assert np.percentile(err, 99) < 0.1, np.percentile(err, 99)

    # the saturated bright half must come from the LOW exposure: the high
    # exposure's white frame clips there
    sat_hi = np.asarray(hi[0]) >= 0.98
    lit_right = true_mask.copy()
    lit_right[:, : W // 2] = False
    assert sat_hi[lit_right].mean() > 0.9
