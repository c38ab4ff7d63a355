"""Runtime value checks: the functional-runtime analog of the reference's
(absent) sanitizers (SURVEY.md section 7 "race detection / sanitizers").

JAX excludes data races structurally; what remains is numeric hygiene:
- checked_reconstruct: checkify-wrapped reconstruction that errors in a
  debuggable way on NaN/Inf points or an empty mask instead of silently
  producing a broken cloud;
- nan_guard: context manager enabling jax_debug_nans locally (used by
  tests and debug sessions).
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.pipeline.reconstruct import reconstruct_scan


@contextlib.contextmanager
def nan_guard():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_reconstruct(frames, cam, proj, cfg: PatternConfig,
                        dec: DecodeConfig = DecodeConfig(),
                        rec: ReconstructConfig = ReconstructConfig(),
                        min_valid_fraction: float = 0.01):
    """Reconstruction with checkify assertions folded into the jit graph.

    Returns (err, cloud); call err.throw() (or inspect err.get()) for a
    located error message when the scan is unusable.
    """

    def body(frames):
        cloud = reconstruct_scan(frames, cam, proj, cfg, dec, rec)
        pts_ok = jnp.all(jnp.isfinite(jnp.where(cloud.mask[..., None],
                                                cloud.points, 0.0)))
        checkify.check(pts_ok, "non-finite points in masked region")
        fill = jnp.mean(cloud.mask.astype(jnp.float32))
        checkify.check(
            fill >= min_valid_fraction,
            "decoded mask nearly empty: fill={fill} (shadowed scan, bad "
            "thresholds, or wrong pattern config)",
            fill=fill,
        )
        return cloud

    checked = checkify.checkify(jax.jit(body))
    return checked(frames)
