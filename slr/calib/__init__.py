"""slr.calib — batched device-resident Zhang calibration (SURVEY.md 4.4).

Replaces the reference's OpenCV ``calibrateCamera``/``stereoCalibrate``
calls (components 9-11) with a JAX-native pipeline: normalized-DLT
homographies, Zhang closed-form intrinsics, per-view extrinsics, then a
batched Levenberg-Marquardt refinement of all parameters at once — the
"batched least-squares Zhang calibration" the north star prescribes [B:5].
cv2 (CPU) is used in tests only, as the parity oracle.
"""

from slr.calib.board import board_object_points, synth_board_views
from slr.calib.homography import homography_dlt
from slr.calib.lm import lm_solve
from slr.calib.zhang import (
    zhang_init_intrinsics,
    extrinsics_from_homography,
    calibrate_camera,
    CalibrationResult,
)
from slr.calib.stereo import stereo_calibrate, calibrate_projector
from slr.calib.corners import (
    detect_chessboard,
    corner_candidates,
    refine_subpix,
    order_corner_grid,
)
from slr.calib.proj_corners import projector_corners_from_decode
from slr.calib.pipeline import calibrate_from_images, ImageCalibResult
