"""Calibration persistence (JSON), the role of cv::FileStorage YAML/XML in
the reference (SURVEY.md component 18 / L1)."""

from __future__ import annotations

import json

import numpy as np

from slr.geom.camera import Camera, make_camera


def _cam_dict(cam: Camera) -> dict:
    return {
        "fx": float(cam.fx), "fy": float(cam.fy),
        "cx": float(cam.cx), "cy": float(cam.cy),
        "dist": np.asarray(cam.dist).tolist(),
        "R": np.asarray(cam.R).tolist(),
        "t": np.asarray(cam.t).tolist(),
    }


def _cam_from(d: dict) -> Camera:
    return make_camera(
        d["fx"], d["fy"], d["cx"], d["cy"],
        dist=np.asarray(d["dist"], np.float32),
        R=np.asarray(d["R"], np.float32),
        t=np.asarray(d["t"], np.float32),
    )


def save_calibration(path, cam: Camera, proj: Camera, meta: dict | None = None,
                     cam2: Camera | None = None):
    """``cam2`` persists a second camera for the two-camera rig layout
    (SURVEY.md section 1 "one or two cameras")."""
    d = {"camera": _cam_dict(cam), "projector": _cam_dict(proj),
         "meta": meta or {}}
    if cam2 is not None:
        d["camera2"] = _cam_dict(cam2)
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_calibration(path, with_cam2: bool = False):
    with open(path) as f:
        d = json.load(f)
    out = (_cam_from(d["camera"]), _cam_from(d["projector"]),
           d.get("meta", {}))
    if with_cam2:
        cam2 = _cam_from(d["camera2"]) if "camera2" in d else None
        return out + (cam2,)
    return out
