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


# ---- communicated-bytes accounting (VERDICT r3 next #3) -------------------
#
# On a 1-chip rig the only honest multi-host scaling argument is (measured
# on-chip compute time) vs (exactly-known communicated bytes) over the
# interconnect: every collective in the engine moves a statically-known
# volume per iteration, so per-stage efficiency projects as
#   eff(N) = t_compute / (t_compute + t_comm(N) + n_coll * latency).
# These helpers compute the volumes from shapes; benchmarks/scaling_r4.py
# combines them with the measured matrix rows into scaling_r4.jsonl, and
# BASELINE.md's scaling section quotes that artifact.

ICI_GBPS = 180.0    # v5e per-link ICI, one direction (2D torus, 4 links)
DCN_GBPS = 25.0     # conservative per-host data-center network


def comm_halo_bytes(width: int, halo: int, dtype_bytes: int = 4,
                    n_arrays: int = 1, iters: int = 1) -> int:
    """Bytes ppermuted PER DEVICE per sharded-unwrap call: two ring
    sends (up+down) of ``halo`` rows per array per iteration
    (slr/dist/halo.py + slr/dist/sharded.py)."""
    return 2 * halo * width * dtype_bytes * n_arrays * iters


def comm_schur_bytes(n_poses: int, iters: int = 1) -> int:
    """Bytes psummed per device per distributed-BA solve: the reduced
    (6S x 6S) pose system + rhs + 2 scalars, once per GN iteration
    (slr/dist/ba.py:205-208). A psum over N devices moves ~2x the
    payload per device (reduce-scatter + all-gather)."""
    s = 6 * n_poses
    return (s * s + s + 2) * 4 * 2 * iters


def comm_batched_icp_bytes(n_edges_local: int, iters: int = 1) -> int:
    """The map_block-sharded registration round communicates nothing
    per edge (edges are block-local); only the final pose table is
    allgathered: 12 floats per edge."""
    return n_edges_local * 12 * 4 * iters


def scaling_projection(compute_ms: float, comm_bytes_per_dev: int,
                       n_collectives: int, gbps: float,
                       latency_us: float = 1.0) -> dict:
    """Projected parallel efficiency of one stage: compute time is
    measured on the real chip, comm time = exact volume / interconnect
    bandwidth + per-collective latency. Returns the full accounting so
    the artifact is auditable."""
    t_comm_ms = (comm_bytes_per_dev / (gbps * 1e9)) * 1e3 \
        + n_collectives * latency_us * 1e-3
    eff = compute_ms / (compute_ms + t_comm_ms)
    return {
        "compute_ms": compute_ms,
        "comm_bytes_per_dev": int(comm_bytes_per_dev),
        "n_collectives": n_collectives,
        "interconnect_gbps": gbps,
        "comm_ms": t_comm_ms,
        "efficiency": eff,
    }
