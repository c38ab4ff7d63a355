"""slr.synth — synthetic virtual-scanner renderer (SURVEY.md section 6).

Replaces the reference's physical projector/camera rig (SURVEY.md component
3) as the data source: known scene depth + known calibration -> exact
rendered pattern stacks with per-stage ground truth (true projector
coordinates, true 3D points, true poses). Every downstream test and
benchmark input comes from here (the environment has no network, so all
data is synthetic).
"""

from slr.synth.scene import (
    plane_depth,
    sphere_depth,
    spheres_scene,
    rocks_scene,
    bumps_depth,
    checker_albedo,
)
from slr.synth.render import (
    render_scan, RenderedScan, default_rig, two_camera_rig, move_rig,
)
from slr.synth.board import render_board_view, board_poses, BoardView
