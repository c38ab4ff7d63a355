"""slr.io — persistence (SURVEY.md component 18 + section 7 checkpointing).

PLY point-cloud export/import (native C++ fast path via ctypes, NumPy
fallback), OBJ export, calibration save/load (JSON — the role of the
reference's cv::FileStorage YAML), and stage checkpoints as .npz (the
reference's implicit everything-is-a-file resume contract).
"""

from slr.io.ply import write_ply, read_ply, write_obj
from slr.io.calibio import save_calibration, load_calibration
from slr.io.checkpoint import (save_stage, load_stage, peek_stage, save_ba_state, load_ba_state)
from slr.io.opencv_fs import (
    read_opencv_yaml, write_opencv_yaml,
    save_calibration_opencv, load_calibration_opencv,
)
from slr.io.images import (
    load_scan_folder, save_scan_folder, read_pgm, write_pgm,
)
