"""Shared kernel utilities: interpret-mode detection, tiling helpers."""

from __future__ import annotations

import os

import jax


def use_interpret() -> bool:
    """Pallas interpret mode: on for CPU (tests), off on real TPU.

    SLR_FORCE_INTERPRET=1 (set by tests/conftest.py) forces it; otherwise
    detect the default backend.
    """
    if os.environ.get("SLR_FORCE_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
