"""Virtual-scanner fixture tests + the config-1/2 end-to-end slices.

Config 1 [B:7]: synthetic Gray-code decode + triangulation.
Config 2 [B:8]: Gray + 4-step phase shift to sub-pixel stripe coords.
Ground truth comes from the renderer itself (SURVEY.md section 6).
"""

import jax.numpy as jnp
import numpy as np

from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack
from slr.geom.triangulate import triangulate_plane
from slr.synth import bumps_depth, plane_depth, sphere_depth, checker_albedo
from slr.synth.render import default_rig, render_scan

CAM_W, CAM_H = 320, 256


def _small_rig():
    return default_rig(cam_w=CAM_W, cam_h=CAM_H, proj_w=256, proj_h=192,
                       baseline=150.0, toe_in_deg=14.0)


def _cfg(phase_steps):
    return PatternConfig(proj_width=256, proj_height=192, gray_bits=6,
                         phase_steps=phase_steps)


def test_render_shapes_and_mask():
    cam, proj = _small_rig()
    cfg = _cfg(4)
    depth = plane_depth(cam, CAM_H, CAM_W, point=[0, 0, 500.0], normal=[0, 0, -1.0])
    scan = render_scan(cam, proj, depth, cfg)
    assert scan.frames.shape == (cfg.num_frames, CAM_H, CAM_W)
    assert scan.points_true.shape == (CAM_H, CAM_W, 3)
    assert 0.2 < float(jnp.mean(scan.mask_true.astype(jnp.float32)))
    # white frame brighter than black frame where illuminated
    assert float(
        jnp.min(
            jnp.where(scan.mask_true, scan.frames[0] - scan.frames[1], 1.0)
        )
    ) > 0.3


def test_decode_recovers_true_projector_column_phase():
    """Config 2: rendered stack -> decode -> x_p vs ground truth, sub-pixel."""
    cam, proj = _small_rig()
    cfg = _cfg(4)
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=25.0)
    scan = render_scan(cam, proj, depth, cfg)
    res = decode_stack(scan.frames, cfg, DecodeConfig())
    valid = res.mask & scan.mask_true
    assert float(jnp.mean(valid.astype(jnp.float32))) > 0.5
    err = jnp.where(valid, jnp.abs(res.x_p - scan.xp_true), 0.0)
    # sub-0.2 projector-pixel phase accuracy on noiseless render
    n = jnp.sum(valid)
    rms = float(jnp.sqrt(jnp.sum(err * err) / n))
    assert rms < 0.2, rms
    assert float(jnp.max(err)) < 2.0  # no fringe-order errors


def test_decode_gray_only():
    """Config 1: Gray-code only decode; half-stripe accuracy."""
    cam, proj = _small_rig()
    cfg = _cfg(0)
    depth = plane_depth(cam, CAM_H, CAM_W, point=[0, 0, 500.0], normal=[0, 0, -1.0])
    scan = render_scan(cam, proj, depth, cfg)
    res = decode_stack(scan.frames, cfg, DecodeConfig())
    valid = res.mask & scan.mask_true
    assert float(jnp.mean(valid.astype(jnp.float32))) > 0.4
    pitch = cfg.proj_width / (1 << cfg.gray_bits)
    err = jnp.where(valid, jnp.abs(res.x_p - scan.xp_true), 0.0)
    assert float(jnp.max(err)) < pitch  # within one stripe


def test_end_to_end_triangulation_rms():
    """Render -> decode -> plane-triangulate -> compare 3D points to truth."""
    cam, proj = _small_rig()
    cfg = _cfg(4)
    depth = sphere_depth(cam, CAM_H, CAM_W, center=[0, 0, 520.0], radius=120.0,
                         background=700.0)
    albedo = checker_albedo(CAM_H, CAM_W, cells=6, lo=0.5)
    scan = render_scan(cam, proj, depth, cfg, albedo=albedo)
    res = decode_stack(scan.frames, cfg, DecodeConfig())
    valid = res.mask & scan.mask_true

    v, u = jnp.meshgrid(jnp.arange(CAM_H, dtype=jnp.float32),
                        jnp.arange(CAM_W, dtype=jnp.float32), indexing="ij")
    pts, z = triangulate_plane(cam, proj, u, v, res.x_p)
    err = jnp.linalg.norm(pts - scan.points_true, axis=-1)
    err = jnp.where(valid, err, 0.0)
    n = jnp.sum(valid)
    rms = float(jnp.sqrt(jnp.sum(err * err) / n))
    # scene units are mm: sub-mm RMS is the reference accuracy bound [B:5]
    assert rms < 1.0, rms


def test_noise_robustness():
    """With sensor noise the decode should still be sub-pixel on average."""
    import jax

    cam, proj = _small_rig()
    cfg = _cfg(4)
    depth = plane_depth(cam, CAM_H, CAM_W, point=[0, 0, 500.0], normal=[0.1, 0, -1.0])
    scan = render_scan(cam, proj, depth, cfg, noise_std=0.01,
                       key=jax.random.PRNGKey(7))
    res = decode_stack(scan.frames, cfg, DecodeConfig())
    valid = res.mask & scan.mask_true
    err = jnp.where(valid, jnp.abs(res.x_p - scan.xp_true), 0.0)
    n = jnp.sum(valid)
    rms = float(jnp.sqrt(jnp.sum(err * err) / n))
    assert rms < 0.5, rms


def test_cast_shadows_rejected_by_decode():
    """A sphere floating in front of a background plane casts a real
    projector shadow (VERDICT r1 missing #3): the shadowed plane pixels
    must lose pattern light, mask_true must mark them, and the decode's
    contrast mask must reject them — while sub-mm RMS holds elsewhere."""
    cam, proj = _small_rig()
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=5,
                        phase_steps=4)
    depth = sphere_depth(cam, CAM_H, CAM_W, center=[0, 0, 520.0],
                         radius=60.0, background=700.0)
    plain = render_scan(cam, proj, depth, cfg)
    shad = render_scan(cam, proj, depth, cfg, cast_shadows=True)

    shadowed = np.asarray(plain.mask_true) & ~np.asarray(shad.mask_true)
    assert shadowed.sum() > 500, shadowed.sum()
    # most of the shadow is the sphere's cast shadow on the background
    # plane; the rest is the sphere's own terminator (the limb facing
    # away from the projector), which is physical self-shadowing
    on_bg = np.asarray(depth) > 650.0
    cast = shadowed & on_bg
    assert cast.sum() > 400, cast.sum()
    # projector sits at +x toed in: its shadow falls left of the sphere
    us = np.nonzero(cast)[1]
    assert np.median(us) < CAM_W / 2

    # shadowed pixels get ambient only -> contrast mask rejects them
    res = decode_stack(shad.frames, cfg, DecodeConfig())
    leak = np.asarray(res.mask) & shadowed
    assert leak.sum() < 0.02 * shadowed.sum(), leak.sum()

    # lit pixels unaffected: sub-mm reconstruction RMS still holds
    valid = np.asarray(res.mask) & np.asarray(shad.mask_true)
    v, u = jnp.meshgrid(jnp.arange(CAM_H, dtype=jnp.float32),
                        jnp.arange(CAM_W, dtype=jnp.float32), indexing="ij")
    pts, _ = triangulate_plane(cam, proj, u, v, res.x_p)
    err = np.linalg.norm(
        np.asarray(pts - shad.points_true), axis=-1)[valid]
    assert float(np.sqrt(np.mean(err ** 2))) < 1.0


def test_cast_shadows_no_false_positives_on_smooth_scene():
    """Shadow mapping on a smooth unoccluded scene must not shadow
    anything (scatter-min bias handles same-projector-pixel slope)."""
    cam, proj = _small_rig()
    cfg = _cfg(4)
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=25.0)
    plain = render_scan(cam, proj, depth, cfg)
    shad = render_scan(cam, proj, depth, cfg, cast_shadows=True)
    lost = np.asarray(plain.mask_true) & ~np.asarray(shad.mask_true)
    assert lost.mean() < 0.005, lost.mean()


def test_defocus_blur_attenuates_modulation_not_accuracy():
    """Defocused projector optics: modulation drops by the closed-form
    Gaussian factor but the phase (and hence geometry) is preserved."""
    cam, proj = _small_rig()
    cfg = PatternConfig(proj_width=256, proj_height=192, gray_bits=5,
                        phase_steps=4)  # pitch 8 px
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=25.0)
    sharp = render_scan(cam, proj, depth, cfg)
    blurred = render_scan(cam, proj, depth, cfg, defocus_sigma=1.5)
    rs = decode_stack(sharp.frames, cfg, DecodeConfig())
    rb = decode_stack(blurred.frames, cfg, DecodeConfig())
    both = np.asarray(rs.mask) & np.asarray(rb.mask) \
        & np.asarray(sharp.mask_true)
    assert both.mean() > 0.3
    # modulation attenuation matches exp(-2 (pi sigma / pitch)^2)
    import math
    expect = math.exp(-2.0 * (math.pi * 1.5 / cfg.fringe_pitch) ** 2)
    ratio = (np.asarray(rb.quality)[both] / np.asarray(rs.quality)[both])
    assert abs(np.median(ratio) - expect) < 0.05 * expect
    # phase accuracy survives the blur
    err = np.abs(np.asarray(rb.x_p - blurred.xp_true))[both]
    assert float(np.sqrt(np.mean(err ** 2))) < 0.2


def test_projector_gamma_harmonics():
    """Projector gamma generates fringe harmonics; N-step decoding
    rejects all but the kN +/- 1 terms, so the phase ripple shrinks as N
    grows — and gamma == 1 reproduces the ideal-path render exactly."""
    cam, proj = _small_rig()
    depth = plane_depth(cam, CAM_H, CAM_W, point=[0, 0, 500.0],
                        normal=[0, 0, -1.0])

    cfg4 = _cfg(4)
    base = render_scan(cam, proj, depth, cfg4)
    same = render_scan(cam, proj, depth, cfg4, proj_gamma=1.0)
    np.testing.assert_allclose(np.asarray(same.frames),
                               np.asarray(base.frames), atol=1e-5)

    def xp_rms(steps, gamma):
        cfg = _cfg(steps)
        scan = render_scan(cam, proj, depth, cfg, proj_gamma=gamma)
        res = decode_stack(scan.frames, cfg, DecodeConfig())
        valid = np.asarray(res.mask) & np.asarray(scan.mask_true)
        err = np.abs(np.asarray(res.x_p - scan.xp_true))[valid]
        return float(np.sqrt(np.mean(err ** 2)))

    r4g = xp_rms(4, 2.2)
    r8g = xp_rms(8, 2.2)
    r4i = xp_rms(4, 1.0)
    # gamma hurts 4-step decoding measurably; 8-step recovers most of it
    assert r4g > 2.0 * r4i, (r4g, r4i)
    assert r8g < 0.5 * r4g, (r8g, r4g)
    assert r8g < 0.2
