"""Round-5 probe B: merge-path breakdown after the decode_only rewire.

Times: full two_camera merge; the fused decode_only alone; one
invert_to_projector (2 crossing passes + payload build + glue); and
crossing pass-2 shape with candidate subtile configs.

Run: nohup timeout 5400 python benchmarks/probe_r5b.py > /tmp/probe_r5b.log 2>&1 &
"""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.synth import spheres_scene, two_camera_rig
from slr.synth.render import render_scan


def device_ms(step, x0, K_hi=17, n=5):
    def make(K):
        @jax.jit
        def run(x):
            def body(i, carry):
                x_c, acc = carry
                s, x_n = step(x_c)
                return (x_n, acc + s)
            _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))
            return acc
        return run

    run1, runk = make(1), make(K_hi)
    jax.block_until_ready(run1(x0))
    jax.block_until_ready(runk(x0))
    deltas = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run1(x0))
        t1 = time.perf_counter()
        jax.block_until_ready(runk(x0))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) * 1e3 / (K_hi - 1))
    deltas.sort()
    return deltas[len(deltas) // 2]


def main():
    print("devices:", jax.devices(), flush=True)
    H, W = 1024, 1280
    cfg = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                        row_gray_bits=6, phase_steps=4, row_phase_steps=4)
    dec = DecodeConfig()
    c1, c2, prj = two_camera_rig(cam_w=W, cam_h=H, proj_w=1024, proj_h=768)
    scans = []
    for i, c in enumerate((c1, c2)):
        d = spheres_scene(c, H, W)
        scans.append(render_scan(c, prj, d, cfg, noise_std=0.003,
                                 key=jax.random.PRNGKey(20 + i),
                                 cast_shadows=True))
    sa, sb = scans
    rec2 = ReconstructConfig(min_depth=300.0, max_depth=900.0)

    # ---- full merge (fused decode_only route) ----
    try:
        from slr.pipeline import reconstruct_two_camera

        cl_out = jax.block_until_ready(jax.jit(
            lambda a, b: reconstruct_two_camera(
                a, b, c1, c2, cfg, rec=rec2, method="merge"))(
            sa.frames, sb.frames))
        n_pts = int(jnp.sum(cl_out.mask))

        def tc_step(f):
            o = reconstruct_two_camera(f, sb.frames, c1, c2, cfg,
                                       rec=rec2, method="merge")
            return o.points[0, 0, 0], f.at[0, 0, 0].add(
                o.points[0, 0, 0] * 1e-30)

        ms = device_ms(tc_step, sa.frames, K_hi=17)
        print(f"merge full (fused decode): {ms:.3f} ms/scan, {n_pts} pts",
              flush=True)
    except Exception:
        print("merge FAILED:\n" + traceback.format_exc()[-1200:], flush=True)

    # ---- fused decode_only alone ----
    try:
        from slr.kernels.fused_scan import fused_decode_triangulate

        def dec_step(f):
            o = fused_decode_triangulate(f, c1, None, cfg, dec,
                                         decode_only=True)
            return o.x_p[0, 0], f.at[0, 0, 0].add(o.x_p[0, 0] * 1e-30)

        ms_d = device_ms(dec_step, sa.frames, K_hi=33)
        print(f"decode_only f32 (46 frames): {ms_d:.3f} ms", flush=True)
    except Exception:
        print("decode FAILED:\n" + traceback.format_exc()[-800:], flush=True)

    # ---- one invert_to_projector (2 passes + build + unpack) ----
    try:
        from slr.pipeline.twocam import invert_to_projector, _code_edge_mask
        from slr.codec import decode_stack

        r1 = jax.jit(lambda f: decode_stack(f, cfg, dec))(sa.frames)
        r1 = jax.block_until_ready(r1)
        white = jnp.mean(sa.frames[0], axis=0) * 0 + 1.0  # placeholder map
        edge1 = _code_edge_mask(r1.x_p, r1.y_p, r1.mask, 3.0)
        m1 = r1.mask & edge1

        def inv_step(x):
            out = invert_to_projector(x, r1.y_p, m1, r1.quality,
                                      jnp.ones_like(x), 1024, 768)
            return out[1][0, 0], x.at[0, 0].add(out[1][0, 0] * 1e-30)

        ms_i = device_ms(inv_step, r1.x_p, K_hi=17)
        print(f"invert_to_projector (one camera): {ms_i:.3f} ms", flush=True)

        def edge_step(x):
            e = _code_edge_mask(x, r1.y_p, r1.mask, 3.0)
            s = e.astype(jnp.float32)[0, 0]
            return s, x.at[0, 0].add(s * 1e-30)

        ms_e = device_ms(edge_step, r1.x_p, K_hi=33)
        print(f"code_edge_mask (one camera): {ms_e:.3f} ms", flush=True)
    except Exception:
        print("invert FAILED:\n" + traceback.format_exc()[-800:], flush=True)

    # ---- crossing pass-2 shape sweep (R=1024 pairs=1024 K=768) ----
    try:
        from slr.kernels.crossing import build_payload, crossing_bin_sum

        rng = np.random.default_rng(0)
        R2, U2, K2 = 1024, 1024, 768
        code = np.cumsum(rng.uniform(0.55, 0.95, (R2, U2)), 1).astype(np.float32)
        code *= 768.0 / code[:, -1:].mean()
        valid = rng.random((R2, U2)) > 0.1
        chq = rng.normal(0, 1, (4, R2, U2)).astype(np.float32) * 100 + 500
        cl2 = jnp.asarray(code[:, :-1])
        ch2 = jnp.asarray(code[:, 1:])
        dst = ch2 - cl2
        pv = jnp.asarray(valid[:, :-1] & valid[:, 1:]) & (dst > 0.125) & (dst < 2.5)
        pay2, _ = build_payload(pv, cl2, jnp.asarray(chq[:, :, :-1]),
                                jnp.asarray(chq[:, :, 1:]), dst,
                                (True, True, False, False))
        cl2z = jnp.where(pv, cl2, -1.0)
        ch2z = jnp.where(pv, ch2, -1.0)
        for usub, ksub in ((2560, 768), (640, 384), (640, 256), (512, 256)):
            def step(c, usub=usub, ksub=ksub):
                o = crossing_bin_sum(c, ch2z, pay2, K2, usub=usub,
                                     ksub=ksub)
                return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
            jax.block_until_ready(jax.jit(
                lambda c: crossing_bin_sum(c, ch2z, pay2, K2, usub=usub,
                                           ksub=ksub))(cl2z))
            ms2 = device_ms(step, cl2z, K_hi=33)
            print(f"crossing pass2 usub={usub} ksub={ksub}: {ms2:.3f} ms",
                  flush=True)
    except Exception:
        print("pass2 FAILED:\n" + traceback.format_exc()[-800:], flush=True)

    print("probe b done", flush=True)


if __name__ == "__main__":
    main()
