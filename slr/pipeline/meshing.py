"""Minimal meshing for organized scan clouds (SURVEY.md component 17,
``MeshCreator``-style export kept export-level per the build plan).

An organized (H, W) cloud meshes directly: each 2x2 pixel quad yields up
to two triangles when all corners are valid and the quad is not stretched
across a depth discontinuity. Faces are computed on device as index
triples; the OBJ writer compacts on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_edge",))
def grid_faces(points, mask, max_edge: float = 5.0):
    """Triangle faces over an organized cloud.

    Returns (faces (2*(H-1)*(W-1), 3) int32 flat-pixel indices,
    face_valid (2*(H-1)*(W-1),) bool). A quad [p00 p01; p10 p11] makes
    triangles (p00, p10, p01) and (p01, p10, p11); a face is valid when
    its three corners are valid and every edge is shorter than max_edge
    (rejects depth-discontinuity bridges).
    """
    H, W = mask.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    p = points

    def edge_ok(a, b):
        return jnp.linalg.norm(a - b, axis=-1) < max_edge

    p00 = p[:-1, :-1]; p01 = p[:-1, 1:]; p10 = p[1:, :-1]; p11 = p[1:, 1:]
    m00 = mask[:-1, :-1]; m01 = mask[:-1, 1:]
    m10 = mask[1:, :-1]; m11 = mask[1:, 1:]
    i00 = idx[:-1, :-1]; i01 = idx[:-1, 1:]; i10 = idx[1:, :-1]; i11 = idx[1:, 1:]

    t1_ok = (
        m00 & m10 & m01
        & edge_ok(p00, p10) & edge_ok(p10, p01) & edge_ok(p01, p00)
    )
    t2_ok = (
        m01 & m10 & m11
        & edge_ok(p01, p10) & edge_ok(p10, p11) & edge_ok(p11, p01)
    )
    t1 = jnp.stack([i00, i10, i01], axis=-1).reshape(-1, 3)
    t2 = jnp.stack([i01, i10, i11], axis=-1).reshape(-1, 3)
    faces = jnp.concatenate([t1, t2], axis=0)
    valid = jnp.concatenate([t1_ok.reshape(-1), t2_ok.reshape(-1)])
    return faces, valid


def write_mesh_obj(path, points, mask, max_edge: float = 5.0,
                   colors=None) -> tuple[int, int]:
    """Mesh an organized cloud and write an OBJ with faces.

    Returns (n_vertices, n_faces). Vertices are compacted to valid pixels
    on host; face indices are remapped accordingly.
    """
    faces, fvalid = grid_faces(points, mask, max_edge=max_edge)
    pts = np.asarray(points).reshape(-1, 3)
    m = np.asarray(mask).reshape(-1)
    faces = np.asarray(faces)[np.asarray(fvalid)]
    remap = -np.ones(m.shape[0], np.int64)
    remap[m] = np.arange(int(m.sum()))
    v = pts[m]
    f = remap[faces]
    col = None
    if colors is not None:
        c = np.asarray(colors).reshape(-1)
        col = np.clip(c[m], 0.0, 1.0)
    with open(path, "w") as fh:
        fh.write("# slr mesh export\n")
        if col is None:
            for pv in v:
                fh.write(f"v {pv[0]:.6f} {pv[1]:.6f} {pv[2]:.6f}\n")
        else:
            for pv, cv in zip(v, col):
                fh.write(
                    f"v {pv[0]:.6f} {pv[1]:.6f} {pv[2]:.6f} "
                    f"{cv:.4f} {cv:.4f} {cv:.4f}\n"
                )
        for tri in f:
            fh.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    return int(v.shape[0]), int(f.shape[0])
