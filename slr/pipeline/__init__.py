"""slr.pipeline — jit-compiled end-to-end stage graphs (SURVEY.md T5).

One function per configs rung [B:6-12]:

1/2. reconstruct_scan       — decode (+ phase) -> triangulate (single scan)
3.   reconstruct_dense      — fused kernel + spatial repair + accumulation
4.   register_scans         — features + RANSAC + ICP + pose graph
5.   fuse_scans             — transform + merge + voxel fusion
     (distributed variants live in slr.dist)

plus Session, the project/scan-session state object replacing the
reference's GUI-held state (SURVEY.md E1).
"""

from slr.pipeline.reconstruct import (
    reconstruct_scan,
    reconstruct_scan_hdr,
    reconstruct_dense,
    accumulate_by_projector,
    ScanCloud,
)
from slr.pipeline.registerfuse import (
    ba_refine, fuse_scans, register_scans, register_scans_batched,
)
from slr.pipeline.twocam import reconstruct_two_camera, match_via_projector
from slr.pipeline.stream import reconstruct_stream
from slr.pipeline.session import Session
from slr.pipeline.meshing import grid_faces, write_mesh_obj
from slr.pipeline.checks import checked_reconstruct, nan_guard
