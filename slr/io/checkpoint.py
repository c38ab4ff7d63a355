"""Stage checkpoints (SURVEY.md section 7 checkpoint/resume).

Mirrors the reference's implicit contract — every stage persisted as files
so any stage re-runs from disk: decoded maps and clouds as .npz, BA
iteration state (poses + landmark block + residual stats) checkpointed so
a multi-host BA run is restartable after a host failure (map blocks are
independent; recovery = reload fragments + resume iteration).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_stage(path, **arrays):
    """Save named arrays (jax or numpy) as one .npz stage file."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_stage(path) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def peek_stage(path) -> dict:
    """Array names -> shapes WITHOUT decompressing the data (reads only
    the .npy headers inside the zip). Lets routing decisions (e.g. "is
    scan 0 an exposure bracket?") avoid materializing a 100 MB stack
    (ADVICE r3 #3)."""
    import zipfile

    from numpy.lib import format as npformat

    # dispatch on the magic version to the PUBLIC header readers
    # (numpy's private _read_array_header changed signature across
    # releases; ADVICE r4 #2)
    readers = {
        (1, 0): npformat.read_array_header_1_0,
        (2, 0): npformat.read_array_header_2_0,
    }
    out = {}
    with zipfile.ZipFile(path) as z:
        for n in z.namelist():
            with z.open(n) as f:
                version = npformat.read_magic(f)
                reader = readers.get(version)
                if reader is None:  # unknown format: pay the full load
                    with z.open(n) as f2:
                        shape = np.load(f2, allow_pickle=False).shape
                else:
                    shape, _, _ = reader(f)
                out[n[:-4] if n.endswith(".npy") else n] = shape
    return out


def save_ba_state(path, R, t, X, iteration: int, cost: float):
    save_stage(
        path, R=R, t=t, X=X,
        iteration=np.asarray(iteration), cost=np.asarray(cost),
    )


def load_ba_state(path):
    d = load_stage(path)
    return d["R"], d["t"], d["X"], int(d["iteration"]), float(d["cost"])
