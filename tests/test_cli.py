"""CLI surface tests (SURVEY.md T6): the argparse layer drives the same
Session product paths the tests above cover — here we assert the wiring,
on a small config."""

import numpy as np
import pytest

from slr.cli import main
from slr.config import PatternConfig, ScanConfig
from slr.io import load_stage
from slr.pipeline import Session


def _small_session(root):
    cfg = ScanConfig(
        pattern=PatternConfig(proj_width=256, proj_height=192, gray_bits=6,
                              phase_steps=4),
        cam_width=256, cam_height=160,
    )
    return Session(root, config=cfg)


def test_cli_scan_reconstruct_accumulate(tmp_path):
    """slr scan + slr reconstruct --accumulate: the component-13
    accumulation stage is reachable from the product CLI (VERDICT r2
    next #8)."""
    root = str(tmp_path / "sess")
    _small_session(root)
    main(["scan", "--session", root, "--scene", "bumps", "--pose", "0"])
    main(["reconstruct", "--session", root, "--index", "0", "--accumulate"])
    d = load_stage(tmp_path / "sess" / "clouds" / "scan_000.npz")
    assert "acc_points" in d and "acc_mask" in d and "acc_colors" in d
    n_cells = int(np.asarray(d["acc_mask"]).sum())
    n_px = int(np.asarray(d["mask"]).sum())
    assert 0 < n_cells <= n_px
    # accumulated cells are means of contributing pixels: stay in-volume
    pts = np.asarray(d["acc_points"])[np.asarray(d["acc_mask"])]
    assert np.isfinite(pts).all()
    assert pts[:, 2].min() > 0.0


@pytest.mark.slow
def test_cli_stereo_demo(tmp_path):
    """slr stereo-demo: the two-camera rig is reachable from the CLI and
    produces a sub-mm PLY (SURVEY.md section 1 "one or two cameras")."""
    root = str(tmp_path / "stereo")
    main(["stereo-demo", "--out", root, "--cam-w", "320", "--cam-h", "256"])
    assert (tmp_path / "stereo" / "stereo.ply").exists()
    # the session carries the second camera + both stacks
    sess = Session(root)
    assert sess.cam2 is not None
    assert sess.load_scan(0, second=True) is not None
