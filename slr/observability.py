"""Tracing, structured logging and roofline accounting (SURVEY.md sec. 7).

The reference has Qt debug prints and manual timing; the build provides:
- stage_timer: wall-clock stage timing with block_until_ready semantics,
  emitted as JSON-lines (the bench harness and BASELINE.md feed off this);
- trace(): jax.profiler wrapper producing TensorBoard-compatible traces;
- roofline(): bytes/flops -> speed-of-light fraction for a kernel, used to
  check the decode/unwrap/triangulate kernels against the [B:5]
  "speed-of-light HBM bandwidth" target;
- host-0 gating for multi-process runs (multihost_utils analog).

NaN/debug gates (the race-detector analog for a functional runtime):
tests enable jax_debug_nans per-case; checkify wrappers live with the
pipelines that use them.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field
from typing import Optional

import jax

# v5e reference numbers (per chip)
HBM_GBPS = 810.0
BF16_TFLOPS = 394.0
F32_TFLOPS = 98.5


def is_host0() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def log_event(event: str, /, stream=None, **fields) -> None:
    """JSON-lines structured log, emitted from host 0 only."""
    if not is_host0():
        return
    rec = {"event": event, "ts": time.time(), **fields}
    (stream or sys.stderr).write(json.dumps(rec) + "\n")


@dataclass
class StageTimer:
    """Collects per-stage wall times; .summary() feeds the bench."""
    times_ms: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, result_to_block=None):
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        dt = (time.perf_counter() - t0) * 1e3
        self.times_ms[name] = self.times_ms.get(name, 0.0) + dt
        log_event("stage", name=name, ms=dt)

    def summary(self) -> dict:
        return dict(self.times_ms)


def time_fn(fn, *args, iters: int = 5, warmup: int = 1, **kw) -> float:
    """Median wall ms of fn(*args) with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def roofline(bytes_accessed: float, flops: float, measured_ms: float) -> dict:
    """Speed-of-light fractions for a memory/compute-bound kernel."""
    t_mem_ms = bytes_accessed / (HBM_GBPS * 1e9) * 1e3
    t_cmp_ms = flops / (F32_TFLOPS * 1e12) * 1e3
    bound = "memory" if t_mem_ms >= t_cmp_ms else "compute"
    sol_ms = max(t_mem_ms, t_cmp_ms)
    return {
        "bound": bound,
        "sol_ms": sol_ms,
        "measured_ms": measured_ms,
        "sol_fraction": sol_ms / measured_ms if measured_ms > 0 else 0.0,
        "achieved_gbps": bytes_accessed / (measured_ms * 1e-3) / 1e9,
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/slr_trace"):
    """jax.profiler trace context (TensorBoard-compatible output)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
