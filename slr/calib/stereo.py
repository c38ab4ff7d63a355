"""Projector calibration + joint camera-projector stereo refinement.

SURVEY.md components 10-11 / section 4.4. The projector is calibrated as an
inverse camera: structured-light decoding gives each board corner's
projector-pixel coordinate, which then feeds the same Zhang solve. The
stereo stage jointly refines both intrinsic sets, the fixed cam->proj
relative pose, and all board poses — the "calibration refinement" stage of
config 3 [B:10] (reference: cv::stereoCalibrate).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slr.geom.camera import Camera, distort, make_camera
from slr.geom.se3 import se3_compose, so3_exp, so3_log
from slr.calib.lm import lm_solve
from slr.calib.zhang import CalibrationResult, calibrate_camera


def calibrate_projector(obj, proj_uv_views, lm_iters: int = 60):
    """Zhang solve with the projector as an inverse camera.

    proj_uv_views (V,N,2): decoded projector coordinates of board corners
    (from decode_stack at the detected corner pixels).
    """
    return calibrate_camera(obj, proj_uv_views, lm_iters=lm_iters)


class StereoResult(NamedTuple):
    cam: Camera             # refined camera intrinsics (R=I, t=0)
    proj: Camera            # refined projector intrinsics + world->proj R,t
    rvecs: jnp.ndarray      # (V,3) refined board poses (world=camera frame)
    tvecs: jnp.ndarray
    rms: jnp.ndarray        # joint reprojection RMS, px


def _pack_intr(cam: Camera):
    return jnp.concatenate(
        [jnp.stack([cam.fx / 100.0, cam.fy / 100.0, cam.cx, cam.cy]), cam.dist]
    )


def _unpack_intr(p):
    return p[0] * 100.0, p[1] * 100.0, p[2], p[3], p[4:9]


def _reproject(fx, fy, cx, cy, dist, R, t, obj):
    pc = (R @ obj.T).T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xd, yd = distort(pc[:, 0] / zs, pc[:, 1] / zs, dist)
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def _stereo_residual(params, obj, cam_uv, proj_uv, n_views):
    ci = params[0:9]
    pi = params[9:18]
    rel = params[18:24]
    pose = params[24:].reshape(n_views, 6)
    fxc, fyc, cxc, cyc, dc = _unpack_intr(ci)
    fxp, fyp, cxp, cyp, dp = _unpack_intr(pi)
    R_rel = so3_exp(rel[:3])
    t_rel = rel[3:]

    def per_view(rv, tv, uv_c, uv_p):
        R = so3_exp(rv)
        rc = _reproject(fxc, fyc, cxc, cyc, dc, R, tv, obj) - uv_c
        Rp, tp = se3_compose(R_rel, t_rel, R, tv)
        rp = _reproject(fxp, fyp, cxp, cyp, dp, Rp, tp, obj) - uv_p
        return jnp.concatenate([rc, rp], axis=0)

    res = jax.vmap(per_view)(pose[:, :3], pose[:, 3:], cam_uv, proj_uv)
    return res.reshape(-1)


@partial(jax.jit, static_argnames=("lm_iters",))
def stereo_calibrate(
    obj,
    cam_uv,                  # (V,N,2) camera corner detections
    proj_uv,                 # (V,N,2) decoded projector corner coords
    cam_init: CalibrationResult,
    proj_init: CalibrationResult,
    lm_iters: int = 80,
) -> StereoResult:
    V = cam_uv.shape[0]
    # init relative pose: average over views of T_proj_view o inv(T_cam_view)
    Rc = jax.vmap(so3_exp)(cam_init.rvecs)
    Rp = jax.vmap(so3_exp)(proj_init.rvecs)
    R_rel_views = jnp.einsum("vij,vkj->vik", Rp, Rc)  # Rp @ Rc^T
    t_rel_views = proj_init.tvecs - jnp.einsum(
        "vij,vj->vi", R_rel_views, cam_init.tvecs
    )
    # chordal-mean rotation: SVD projection of the mean matrix
    M = jnp.mean(R_rel_views, axis=0)
    U, _, Vt = jnp.linalg.svd(M)
    R_rel0 = U @ Vt
    R_rel0 = R_rel0 * jnp.sign(jnp.linalg.det(R_rel0))
    rel0 = jnp.concatenate([so3_log(R_rel0), jnp.mean(t_rel_views, axis=0)])

    x0 = jnp.concatenate(
        [
            _pack_intr(cam_init.camera),
            _pack_intr(proj_init.camera),
            rel0,
            jnp.concatenate([cam_init.rvecs, cam_init.tvecs], axis=1).reshape(-1),
        ]
    )
    x, cost = lm_solve(
        _stereo_residual, x0, args=(obj, cam_uv, proj_uv, V), iters=lm_iters
    )
    fxc, fyc, cxc, cyc, dc = _unpack_intr(x[0:9])
    fxp, fyp, cxp, cyp, dp = _unpack_intr(x[9:18])
    R_rel = so3_exp(x[18:21])
    t_rel = x[21:24]
    pose = x[24:].reshape(V, 6)
    n_res = cam_uv.size + proj_uv.size
    rms = jnp.sqrt(cost / (n_res / 2.0))
    return StereoResult(
        cam=make_camera(fxc, fyc, cxc, cyc, dist=dc),
        proj=make_camera(fxp, fyp, cxp, cyp, dist=dp, R=R_rel, t=t_rel),
        rvecs=pose[:, :3],
        tvecs=pose[:, 3:],
        rms=rms,
    )
