"""Typed configuration for the slr engine.

Replaces the reference's Qt settings dialog + persisted QSettings/XML
(SURVEY.md component 20 [ref-class]): every threshold/knob of the reference
pipeline appears here by name so behaviour is reproducible. Frozen
dataclasses so configs are hashable and can be passed as jit static args.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class PatternConfig:
    """Projected pattern-set description (SURVEY.md section 4.1).

    Gray code: ``gray_bits`` column-stripe patterns + inverses (optionally
    row codes too), plus all-white / all-black frames. Phase shift:
    ``phase_steps`` sinusoidal fringes whose pitch equals the finest
    Gray-code stripe width so the code resolves the fringe order.
    """

    proj_width: int = 1024
    proj_height: int = 768
    # column stripes: 2**gray_bits across the width; with phase shift the
    # fringe pitch is proj_width / 2**gray_bits — keep it >= ~8 px so the
    # sinusoid stays resolvable (7 bits -> 8 px pitch at 1024)
    gray_bits: int = 7
    row_gray_bits: int = 0       # 0 = column-only coding (plane triangulation)
    phase_steps: int = 4         # N-step phase shift; 0 disables phase shift
    use_inverse: bool = True     # project inverted Gray patterns as well

    @property
    def fringe_pitch(self) -> float:
        """Stripe pitch p = W / 2**bits; the fringe period in projector px."""
        return self.proj_width / (1 << self.gray_bits)

    @property
    def num_frames(self) -> int:
        """Total frames: white + black + gray(+inv) [+ row gray] + phase."""
        n = 2
        n += self.gray_bits * (2 if self.use_inverse else 1)
        n += self.row_gray_bits * (2 if self.use_inverse else 1)
        n += self.phase_steps
        return n


@dataclass(frozen=True)
class DecodeConfig:
    """Per-pixel decode thresholds (reference settings-dialog knobs)."""

    black_threshold: float = 0.1   # tau_black: white-black contrast for the shadow mask
    white_threshold: float = 0.02  # tau_white: |pattern - inverse| certainty per bit
    modulation_threshold: float = 0.05  # tau_mod: phase modulation B gate
    # Spatial quality-guided unwrap (component 8): fixed-iteration
    # label-propagation repair pass. 0 disables.
    spatial_unwrap_iters: int = 8


@dataclass(frozen=True)
class CalibConfig:
    """Zhang calibration solver knobs (SURVEY.md section 4.4)."""

    board_cols: int = 9           # inner corners per row
    board_rows: int = 6
    square_size: float = 20.0     # board square edge, mm
    num_dist_coeffs: int = 5      # k1 k2 p1 p2 k3
    lm_iters: int = 50
    lm_lambda_init: float = 1e-3
    lm_lambda_up: float = 10.0
    lm_lambda_down: float = 0.1
    lm_tol: float = 1e-10


@dataclass(frozen=True)
class ReconstructConfig:
    """Triangulation / cloud accumulation knobs."""

    method: str = "plane"         # 'plane' (column-only), 'midpoint', 'dlt'
    min_depth: float = 1.0        # z bounds filter, scene units
    max_depth: float = 1e4
    max_points: int = 1 << 20     # fixed-capacity cloud buffer under jit
    # statistical outlier removal on the reconstructed cloud (0 = off)
    sor_k: int = 0                # neighbors per point for the k-NN mean
    sor_std_ratio: float = 2.0    # keep md <= mean + ratio * std
    sor_voxel: float = 3.0        # voxel size for the hash (>= k-NN reach)


@dataclass(frozen=True)
class RegistrationConfig:
    """Feature+RANSAC coarse alignment and ICP refinement (SURVEY 4.6)."""

    ransac_iters: int = 256
    ransac_inlier_dist: float = 2.0
    icp_iters: int = 20
    icp_max_corr_dist: float = 10.0
    icp_sample_points: int = 4096
    voxel_size: float = 2.0
    # Pose graph / BA
    pg_iters: int = 20
    pg_damping: float = 1e-6


@dataclass(frozen=True)
class DistConfig:
    """Device-mesh layout (SURVEY.md section 3.2): ``pixel_tile`` shards the
    image H axis (context/sequence-parallel analog); ``map_block`` shards
    scan fragments across hosts for registration + distributed BA."""

    pixel_tiles: int = 1
    map_blocks: int = 1
    halo: int = 1  # rows exchanged between pixel tiles for the spatial unwrap


@dataclass(frozen=True)
class ScanConfig:
    """Top-level session config bundling every stage."""

    pattern: PatternConfig = field(default_factory=PatternConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    calib: CalibConfig = field(default_factory=CalibConfig)
    reconstruct: ReconstructConfig = field(default_factory=ReconstructConfig)
    registration: RegistrationConfig = field(default_factory=RegistrationConfig)
    dist: DistConfig = field(default_factory=DistConfig)
    cam_width: int = 1280
    cam_height: int = 1024


def _to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: ScanConfig, path: str) -> None:
    """JSON or YAML by extension (.yaml/.yml) — the role of the
    reference's persisted Qt settings / cv::FileStorage YAML."""
    path = str(path)
    d = _to_dict(cfg)
    with open(path, "w") as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            yaml.safe_dump(d, f, sort_keys=False)
        else:
            json.dump(d, f, indent=2)


def load_config(path: str) -> ScanConfig:
    path = str(path)
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            d = yaml.safe_load(f)
        else:
            d = json.load(f)
    return ScanConfig(
        pattern=PatternConfig(**d.get("pattern", {})),
        decode=DecodeConfig(**d.get("decode", {})),
        calib=CalibConfig(**d.get("calib", {})),
        reconstruct=ReconstructConfig(**d.get("reconstruct", {})),
        registration=RegistrationConfig(**d.get("registration", {})),
        dist=DistConfig(**d.get("dist", {})),
        cam_width=d.get("cam_width", 1280),
        cam_height=d.get("cam_height", 1024),
    )
