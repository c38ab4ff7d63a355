"""Streaming scan executor — the build's pipeline-parallel analog
(SURVEY.md section 3.2 PP row: "stage overlap ... using double-buffered
device transfers"; there is no layer pipeline because there is no deep
model, so the pipelining seam is capture -> device transfer -> fused
reconstruct).

JAX dispatch is already asynchronous, so kernel execution overlaps Python
naturally; what does NOT overlap by default is the host->device copy of
the NEXT scan's frame stack, which for a 20-frame uint8 stack rides the
relay/PCIe while the chip idles. ``reconstruct_stream`` keeps ``prefetch``
stacks in flight with ``jax.device_put`` so the copy of scan i+1 runs
under the reconstruction of scan i. Bounded look-ahead also bounds device
memory: at most ``prefetch`` stacks + one output resident at a time,
which is what lets a 1000-scan session stream through a single chip.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator

import jax

from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.geom.camera import Camera
from slr.pipeline.reconstruct import ScanCloud, reconstruct_dense


def reconstruct_stream(
    frame_stacks: Iterable,
    cam: Camera,
    proj: Camera,
    cfg: PatternConfig,
    dec: DecodeConfig = DecodeConfig(),
    rec: ReconstructConfig = ReconstructConfig(),
    prefetch: int = 2,
    spatial_iters: int = 0,
) -> Iterator[ScanCloud]:
    """Reconstruct an iterable of (F, H, W) frame stacks, double-buffered.

    Yields one ``ScanCloud`` per stack, in order. ``prefetch`` >= 1; with
    1 this degrades to the sequential path (copy then compute).
    """
    if prefetch < 1:
        raise ValueError("prefetch must be >= 1")
    it = iter(frame_stacks)
    buf: deque = deque()

    def pull():
        try:
            buf.append(jax.device_put(next(it)))
            return True
        except StopIteration:
            return False

    for _ in range(prefetch):
        if not pull():
            break
    while buf:
        frames = buf.popleft()
        cloud = reconstruct_dense(frames, cam, proj, cfg, dec, rec,
                                  spatial_iters=spatial_iters)
        # enqueue the next host->device copy BEFORE the caller blocks on
        # this cloud, so transfer and compute overlap
        pull()
        yield cloud
