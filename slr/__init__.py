"""slr — TPU-native structured-light 3D reconstruction engine.

A brand-new JAX/XLA implementation of the capability surface of
DrawZeroPoint/Structure-Light-Reconstructor (see SURVEY.md; the reference
mount was empty, so the contract is BASELINE.json's north star):

- Gray-code + N-step phase-shift pattern generation and decoding
- per-pixel temporal + quality-guided phase unwrapping
- Zhang-style camera/projector calibration via batched least squares
- projector-camera triangulation into dense point clouds (fused Pallas
  kernels on the hot path)
- multi-scan registration (features + RANSAC + ICP) and pose-graph /
  bundle-adjustment refinement, distributable over a TPU mesh with
  Schur-complement reduction.

Layer map (SURVEY.md section 2.2):
  T6 cli/api  T5 pipeline  T4 dist  T3 kernels  T2 codec/calib/geom/
  registration  T1 io/synth
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/phase math is precision-critical (sub-mm RMS contract, SURVEY.md
# section 6): on TPU the default matmul/einsum precision is bf16, which
# costs ~0.4% relative error on ray directions and blows the accuracy bound
# (measured: 1.25 mm vs 0.077 mm RMS on the config-3 scene). Hot kernels
# that *want* bf16 MXU throughput request it explicitly instead.
_jax.config.update("jax_default_matmul_precision", "highest")
