"""Scaling benchmark: frames/s and points/s at 1 chip / N devices.

BASELINE.json's scaling metric (>= 80% efficiency at N >= 2 hosts). On
this single-chip environment the multi-device axis is exercised on the
CPU-simulated mesh (functional scaling; absolute numbers are only
meaningful on a real pod slice — run this same script there with
JAX_PLATFORMS unset and jax.distributed initialized via slr.dist).

Usage:
    python benchmarks/scaling_bench.py                 # default backend
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 \
        python benchmarks/scaling_bench.py             # 8-dev CPU sim

Prints JSON lines: one per device count with throughput + efficiency.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from slr.config import DecodeConfig, PatternConfig
from slr.dist import make_mesh
from slr.dist.batch import batched_reconstruct
from slr.synth import spheres_scene
from slr.synth.render import default_rig, render_scan

CAM_W, CAM_H = 512, 512


def run(n_dev: int, batch: int, frames_batch, cam, proj, cfg):
    mesh = make_mesh(pixel_tiles=1, map_blocks=n_dev,
                     devices=jax.devices()[:n_dev])
    out = batched_reconstruct(frames_batch, cam, proj, cfg, mesh=mesh)
    jax.block_until_ready(out.points)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = batched_reconstruct(frames_batch, cam, proj, cfg, mesh=mesh)
        jax.block_until_ready(out.points)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    scans_per_s = batch / dt
    px_per_s = scans_per_s * CAM_W * CAM_H
    return scans_per_s, px_per_s


def main():
    n_total = len(jax.devices())
    cam, proj = default_rig(cam_w=CAM_W, cam_h=CAM_H, proj_w=512, proj_h=384)
    cfg = PatternConfig(proj_width=512, proj_height=384, gray_bits=6,
                        phase_steps=4)
    depth = spheres_scene(cam, CAM_H, CAM_W)
    scan = render_scan(cam, proj, depth, cfg)
    base = None
    counts = [n for n in (1, 2, 4, 8) if n <= n_total]
    for n in counts:
        batch = n  # weak scaling: one scan per device
        frames_batch = jnp.stack([scan.frames] * batch)
        sps, pps = run(n, batch, frames_batch, cam, proj, cfg)
        if base is None:
            base = sps
        eff = sps / (base * n)
        print(json.dumps({
            "devices": n, "scans_per_s": round(sps, 2),
            "px_per_s": round(pps, 0), "weak_scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
