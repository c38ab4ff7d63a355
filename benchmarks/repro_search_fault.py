"""Minimal repro for the two-camera ``method="search"`` device fault
(VERDICT r4 weak #5 / next #6).

Observed twice on the v5e (tpu_matrix_r4.jsonl error rows): chaining
K >= 17 copies of the epipolar depth-search graph inside ONE dispatch
(a fori_loop whose body is the full search reconstruction) kills the
device with ``UNAVAILABLE: device lost``; every later dispatch in the
process fails too. K <= 5 was stable across the whole r4 matrix run.
The search path is ~70 chained full-frame bilinear gathers per call;
the working theory is an HBM/scoreboard limit in the gather-heavy graph,
not an XLA miscompile — the same graph at K=1 returns correct results.

The production API now refuses ``method="search"`` on accelerators
unless ``unsafe_search=True`` (slr/pipeline/twocam.py). This script
documents the repro; it does NOT run the faulting shape by default.

  python benchmarks/repro_search_fault.py           # safe K=3 probe
  python benchmarks/repro_search_fault.py --fault   # K=17: KILLS THE DEVICE
"""

import sys

import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import PatternConfig, ReconstructConfig
from slr.pipeline import reconstruct_two_camera
from slr.synth import spheres_scene, two_camera_rig
from slr.synth.render import render_scan


def main(K: int):
    H, W = 1024, 1280
    cfg = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                        row_gray_bits=6, phase_steps=4, row_phase_steps=4)
    c1, c2, prj = two_camera_rig(cam_w=W, cam_h=H, proj_w=1024, proj_h=768)
    scans = []
    for i, c in enumerate((c1, c2)):
        d = spheres_scene(c, H, W)
        scans.append(render_scan(c, prj, d, cfg, noise_std=0.003,
                                 key=jax.random.PRNGKey(20 + i),
                                 cast_shadows=True))
    rec = ReconstructConfig(min_depth=300.0, max_depth=900.0)

    @jax.jit
    def chained(f):
        def body(i, carry):
            f_c, acc = carry
            o = reconstruct_two_camera(f_c, scans[1].frames, c1, c2, cfg,
                                       rec=rec, method="search",
                                       unsafe_search=True)
            f_n = f_c.at[0, 0, 0].add(o.points[0, 0, 0] * 1e-30)
            return (f_n, acc + o.points[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, K, body, (f, jnp.float32(0.0)))
        return acc

    print(f"dispatching K={K} chained search graphs "
          f"({'EXPECT DEVICE FAULT' if K >= 17 else 'safe range'})...")
    out = jax.block_until_ready(chained(scans[0].frames))
    print("survived:", float(out))


if __name__ == "__main__":
    main(17 if "--fault" in sys.argv else 3)
