"""Virtual scanner forward model: depth map + rig + patterns -> frame stack.

For each camera pixel: cast the (undistorted) camera ray to the scene depth,
project the 3D point into the projector, bilinearly sample each projected
pattern there, apply albedo/ambient and optional sensor noise. Exact ground
truth (true 3D points, true projector coords, true visibility mask) rides
along for the tests.

Optics model (SURVEY.md section 6 "noise, defocus blur, albedo texture,
shadowing"):

- **cast shadows**: a projector-space shadow map is built by scatter-min
  splatting every scene point's projector-frame depth; a point is lit only
  if nothing nearer the projector claims its projector pixel (within
  ``shadow_bias``). Shadowed pixels receive ambient light only, so the
  decode's contrast mask must reject them.
- **defocus blur**: projected patterns are convolved with a Gaussian PSF of
  ``defocus_sigma`` projector px; for the analytically-evaluated sinusoidal
  fringes this is the exact closed form — contrast attenuation by
  exp(-2 (pi sigma / pitch)^2) with phase preserved.
- **projector gamma**: ``proj_gamma`` raises the (blurred) pattern
  luminance to a power, the dominant harmonic-generating nonlinearity of a
  real DLP chain; N-step phase decoding rejects harmonics except those at
  kN +/- 1, so larger N suppresses the resulting phase ripple.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from slr.config import PatternConfig
from slr.codec.patterns import generate_pattern_stack
from slr.geom.camera import Camera, make_camera, pixel_to_ray, project


class RenderedScan(NamedTuple):
    frames: jnp.ndarray       # (F, H, W) captured stack in [0,1]
    points_true: jnp.ndarray  # (H, W, 3) ground-truth 3D points (world=cam frame)
    xp_true: jnp.ndarray      # (H, W) true projector column (sub-pixel)
    yp_true: jnp.ndarray      # (H, W) true projector row
    mask_true: jnp.ndarray    # (H, W) bool: point illuminated by projector


def default_rig(cam_w: int = 1280, cam_h: int = 1024, proj_w: int = 1024,
                proj_h: int = 768, baseline: float = 200.0,
                toe_in_deg: float = 12.0, cam_dist=None, proj_dist=None):
    """A plausible scanner rig: camera at origin, projector offset along -x
    with a toe-in rotation so both frustums overlap around z ~ 500."""
    f_c = 0.9 * cam_w
    cam = make_camera(
        fx=f_c, fy=f_c, cx=cam_w / 2 - 0.5, cy=cam_h / 2 - 0.5,
        dist=cam_dist,
    )
    th = jnp.deg2rad(toe_in_deg)
    # world->proj rotation about y; the projector sits at x=+baseline in
    # world and its optical axis R^T e_z = (-sin th, 0, cos th) is toed in
    # toward the camera's view volume around (0, 0, ~500).
    R = jnp.array(
        [
            [jnp.cos(th), 0.0, jnp.sin(th)],
            [0.0, 1.0, 0.0],
            [-jnp.sin(th), 0.0, jnp.cos(th)],
        ],
        jnp.float32,
    )
    C = jnp.array([baseline, 0.0, 0.0], jnp.float32)  # projector centre, world
    t = -R @ C
    f_p = 1.2 * proj_w
    proj = make_camera(
        fx=f_p, fy=f_p, cx=proj_w / 2 - 0.5, cy=proj_h / 2 - 0.5,
        dist=proj_dist, R=R, t=t,
    )
    return cam, proj


def two_camera_rig(cam_w: int = 1280, cam_h: int = 1024, proj_w: int = 1024,
                   proj_h: int = 768, baseline: float = 280.0,
                   toe_in_deg: float = 14.0):
    """Two-camera + central-projector rig (the reference class's two-camera
    layout, SURVEY.md section 1): cameras at x = -+ baseline/2 toed in
    toward a working volume around z ~ 500, projector mid-way between them.

    Returns (cam1, cam2, proj). The projector's calibration is only used to
    *render* — two-camera reconstruction never reads it.
    """
    f_c = 0.9 * cam_w

    def toed(cx_world: float, deg: float):
        th = jnp.deg2rad(deg)
        R = jnp.array([[jnp.cos(th), 0.0, jnp.sin(th)],
                       [0.0, 1.0, 0.0],
                       [-jnp.sin(th), 0.0, jnp.cos(th)]], jnp.float32)
        C = jnp.array([cx_world, 0.0, 0.0], jnp.float32)
        return R, -R @ C

    R1, t1 = toed(-baseline / 2, -toe_in_deg)
    cam1 = make_camera(fx=f_c, fy=f_c, cx=cam_w / 2 - 0.5,
                       cy=cam_h / 2 - 0.5, R=R1, t=t1)
    R2, t2 = toed(+baseline / 2, +toe_in_deg)
    cam2 = make_camera(fx=f_c, fy=f_c, cx=cam_w / 2 - 0.5,
                       cy=cam_h / 2 - 0.5, R=R2, t=t2)
    f_p = 1.2 * proj_w
    proj = make_camera(fx=f_p, fy=f_p, cx=proj_w / 2 - 0.5,
                       cy=proj_h / 2 - 0.5)
    return cam1, cam2, proj


def move_rig(cam: Camera, proj: Camera, R_m, t_m):
    """Move the whole scanner rig by the pose (R_m, t_m) (rig -> world).

    Returns (cam', proj') whose extrinsics see the world scene from the
    moved rig: world->cam' = (world->cam) o T_rig^{-1}. Reconstruction
    with the ORIGINAL calibration then yields points in the rig frame, and
    registration must recover T_rig — exact multi-scan ground truth for
    configs 4-5.
    """
    R_m = jnp.asarray(R_m, jnp.float32)
    t_m = jnp.asarray(t_m, jnp.float32)

    def mv(c: Camera) -> Camera:
        R_new = c.R @ R_m.T
        t_new = c.t - R_new @ t_m
        return c._replace(R=R_new, t=t_new)

    return mv(cam), mv(proj)


def _bilinear_sample(img, x, y):
    """Sample (H,W) image at float coords, clamped to borders."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _gauss_blur(imgs, sigma: float):
    """Separable Gaussian blur of an (F, H, W) stack, 'same' borders."""
    import math as _math

    r = int(_math.ceil(3.0 * sigma))
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    F, H, W = imgs.shape
    lhs = imgs[:, None]                               # (F, 1, H, W)
    kx = k.reshape(1, 1, 1, -1)
    ky = k.reshape(1, 1, -1, 1)
    dn = ("NCHW", "OIHW", "NCHW")
    out = jax.lax.conv_general_dilated(
        lhs, kx, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(
        out, ky, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn)
    return out[:, 0]


def _shadow_map(xp, yp, z_p, in_frustum, proj_w: int, proj_h: int):
    """Scatter-min projector-space depth map from the scene points.

    Every camera-visible point splats its projector-frame depth onto its
    nearest projector pixel; a point is shadowed iff some other geometry
    is nearer the projector along (approximately) the same projector ray.
    """
    xi = jnp.clip(jnp.round(xp).astype(jnp.int32), 0, proj_w - 1)
    yi = jnp.clip(jnp.round(yp).astype(jnp.int32), 0, proj_h - 1)
    z = jnp.where(in_frustum, z_p, jnp.inf)
    smap = jnp.full((proj_h, proj_w), jnp.inf, jnp.float32)
    return smap.at[yi.reshape(-1), xi.reshape(-1)].min(z.reshape(-1))


def quantize_frames(frames, dtype=jnp.uint8):
    """Quantize rendered [0,1] frames to raw sensor integers (8-bit ADC by
    default) — the realistic camera output format; the fused kernel and
    decode_stack both accept these directly (1 byte/px HBM reads)."""
    m = float(jnp.iinfo(dtype).max)
    return jnp.clip(jnp.round(frames * m), 0, m).astype(dtype)


@partial(jax.jit, static_argnames=("cfg", "ambient", "noise_std",
                                   "cast_shadows", "shadow_bias",
                                   "defocus_sigma", "proj_gamma"))
def render_scan(
    cam: Camera,
    proj: Camera,
    depth,                      # (H, W) camera-frame depth along z
    cfg: PatternConfig,
    albedo: Optional[jnp.ndarray] = None,   # (H, W) in [0,1]
    ambient: float = 0.05,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    cast_shadows: bool = False,
    shadow_bias: float = 2.0,   # scene units; slope tolerance of the test
    defocus_sigma: float = 0.0,  # projector-optics Gaussian PSF, proj px
    proj_gamma: float = 1.0,    # projector luminance nonlinearity
) -> RenderedScan:
    H, W = depth.shape
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    o, d = pixel_to_ray(cam, u, v)
    # depth is along the CAMERA z axis; for a camera with extrinsics the
    # ray parameter is depth / (R_c d)_z (world-frame rays)
    d_cam_z = jnp.einsum("j,...j->...", cam.R[2], d)
    dz = jnp.where(jnp.abs(d_cam_z) < 1e-9, 1e-9, d_cam_z)
    pts = o + (depth / dz)[..., None] * d           # (H, W, 3) world frame

    uv_p, z_p = project(proj, pts)
    xp, yp = uv_p[..., 0], uv_p[..., 1]
    illuminated = (
        (z_p > 0)
        & (xp >= 0) & (xp <= cfg.proj_width - 1)
        & (yp >= 0) & (yp <= cfg.proj_height - 1)
    )
    if cast_shadows:
        smap = _shadow_map(xp, yp, z_p, illuminated,
                           cfg.proj_width, cfg.proj_height)
        xi = jnp.clip(jnp.round(xp).astype(jnp.int32), 0, cfg.proj_width - 1)
        yi = jnp.clip(jnp.round(yp).astype(jnp.int32), 0, cfg.proj_height - 1)
        illuminated = illuminated & (z_p <= smap[yi, xi] + shadow_bias)

    patterns = generate_pattern_stack(cfg)          # (F, Hp, Wp)
    if proj_gamma != 1.0:
        patterns = jnp.clip(patterns, 0.0, 1.0) ** proj_gamma
    if defocus_sigma > 0.0:
        patterns = _gauss_blur(patterns, defocus_sigma)
    sample = jax.vmap(lambda img: _bilinear_sample(img, xp, yp))
    proj_light = sample(patterns)                   # (F, H, W)

    def analytic_fringes(coord, pitch: float, steps: int):
        # Evaluate the sinusoidal fringes analytically at the exact
        # projected coordinate instead of bilinearly interpolating the
        # discrete pattern image: a defocused projector emits a continuous
        # sinusoid, and linear interpolation of a pitch-p cosine sampled
        # at integer pixels introduces a systematic, spatially smooth
        # phase warp (measured 0.22 mm RMS at 4 px pitch) that corrupts
        # registration ground truth.
        #
        # Gamma and defocus in closed form: the gamma'd fringe profile
        # (0.5 + 0.5 cos)^gamma is expanded in a (static) Fourier series
        # and the Gaussian PSF attenuates harmonic m by
        # exp(-2 (pi m sigma / pitch)^2). gamma == 1, sigma == 0 reduces
        # to the plain 0.5 + 0.5 cos(ph) of the ideal projector.
        import numpy as _np

        k = jnp.arange(steps, dtype=jnp.float32)
        ph = (2.0 * jnp.pi * coord[None] / pitch
              - 2.0 * jnp.pi * k[:, None, None] / steps)
        _n = 256
        prof = (0.5 + 0.5 * _np.cos(2 * _np.pi * _np.arange(_n) / _n)
                ) ** proj_gamma
        coef = _np.fft.rfft(prof) / _n
        M = 8
        amps = 2.0 * _np.abs(coef[1:M + 1])
        phis = _np.angle(coef[1:M + 1])
        if defocus_sigma > 0.0:
            m = _np.arange(1, M + 1)
            amps = amps * _np.exp(
                -2.0 * (_np.pi * m * defocus_sigma / pitch) ** 2)
        out = jnp.full_like(ph, float(coef[0].real))
        for i in range(M):
            if amps[i] > 1e-7:
                out = out + float(amps[i]) * jnp.cos(
                    (i + 1) * ph + float(phis[i]))
        return out

    if cfg.coding == "multifreq":
        # white + black sampled from the images; every fringe analytic
        segs = [proj_light[:2]]
        for p in cfg.mf_pitches:
            segs.append(analytic_fringes(xp, p, cfg.phase_steps))
        proj_light = jnp.concatenate(segs, axis=0)
    else:
        ps, rps = cfg.phase_steps, cfg.row_phase_steps
        if ps or rps:
            segs = [proj_light[: proj_light.shape[0] - ps - rps]]
            if ps:
                segs.append(analytic_fringes(xp, cfg.fringe_pitch, ps))
            if rps:
                segs.append(analytic_fringes(yp, cfg.row_fringe_pitch, rps))
            proj_light = jnp.concatenate(segs, axis=0)
    proj_light = jnp.where(illuminated[None], proj_light, 0.0)

    if albedo is None:
        albedo = jnp.ones((H, W), jnp.float32)
    frames = albedo[None] * (ambient + (1.0 - ambient) * proj_light)

    if noise_std > 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        frames = frames + noise_std * jax.random.normal(key, frames.shape)
    frames = jnp.clip(frames, 0.0, 1.0)

    return RenderedScan(
        frames=frames,
        points_true=pts,
        xp_true=xp,
        yp_true=yp,
        mask_true=illuminated,
    )
