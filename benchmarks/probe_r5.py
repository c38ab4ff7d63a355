"""Round-5 chip probes: crossing-kernel subtile sweep + band NN.

1. Sweep (usub, ksub) activity-pruning granularities of the rewritten
   crossing kernel on REAL decoded code maps at the production
   two-camera shapes (pass 1: R=1024 U=1280 K=1024; pass 2 analog), and
   report active-fraction + device ms per pass.
2. Time the full two-camera merge with the chosen defaults.
3. First on-chip run of the sorted-band NN kernel (scalar-prefetch
   index maps) at 256k x 256k vs the brute-force MXU row.

Run: nohup timeout 5400 python benchmarks/probe_r5.py > /tmp/probe_r5.log 2>&1 &
"""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.codec import decode_stack
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

    # ---- pass-1 inputs from the real decode (mirror invert_to_projector)
    from slr.kernels.crossing import build_payload, crossing_bin_sum
    from slr.pipeline.twocam import _code_edge_mask

    r1 = jax.jit(lambda f: decode_stack(f, cfg, dec))(sa.frames)
    edge1 = _code_edge_mask(r1.x_p, r1.y_p, r1.mask, 3.0)
    mask = r1.mask & edge1
    x_p, y_p = r1.x_p, r1.y_p
    u_i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ch1 = jnp.stack([u_i, y_p, r1.quality, jnp.ones_like(x_p)])
    cl = x_p[:, :-1]
    chh = x_p[:, 1:]
    dstep = chh - cl
    pv = (mask[:, :-1] & mask[:, 1:] & (dstep > 0.125) & (dstep < 2.5))
    pay, unpack = build_payload(pv, cl, ch1[:, :, :-1], ch1[:, :, 1:],
                                dstep, (True, True, False, False))
    clz = jnp.where(pv, cl, -1.0)
    chz = jnp.where(pv, chh, -1.0)
    pay = jax.block_until_ready(pay)
    K1 = cfg.proj_width

    for usub, ksub in ((2560, 1024), (640, 512), (320, 256), (256, 256),
                       (256, 128), (128, 128)):
        try:
            def step(c, usub=usub, ksub=ksub):
                o = crossing_bin_sum(c, chz, pay, K1, usub=usub, ksub=ksub)
                return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)

            out = jax.block_until_ready(jax.jit(
                lambda c: crossing_bin_sum(c, chz, pay, K1, usub=usub,
                                           ksub=ksub))(clz))
            ms = device_ms(step, clz, K_hi=33)
            print(f"crossing pass1 usub={usub} ksub={ksub}: {ms:.3f} ms",
                  flush=True)
        except Exception:
            print(f"crossing usub={usub} ksub={ksub} FAILED:\n"
                  + traceback.format_exc()[-800:], flush=True)

    # active fraction diagnostics (host math, mirrors the kernel's table)
    for usub, ksub in ((640, 512), (320, 256), (256, 256), (256, 128),
                       (128, 128)):
        firing = np.asarray(chz > clz)
        clm = np.where(firing, np.asarray(clz), 3e38)
        chm = np.where(firing, np.asarray(chz), -3e38)
        R_, U_ = clm.shape
        rt = 8
        import math
        Up = math.ceil(U_ / usub) * usub
        clm = np.pad(clm, ((0, 0), (0, Up - U_)), constant_values=3e38)
        chm = np.pad(chm, ((0, 0), (0, Up - U_)), constant_values=-3e38)
        nb = R_ // rt
        nu = Up // usub
        nk = math.ceil(K1 / ksub)
        cmin = clm.reshape(nb, rt, nu, usub).min(axis=(1, 3))
        cmax = chm.reshape(nb, rt, nu, usub).max(axis=(1, 3))
        klo = np.arange(nk) * ksub
        act = (cmin[..., None] <= klo + ksub - 1) & (cmax[..., None] > klo)
        print(f"  active fraction usub={usub} ksub={ksub}: "
              f"{act.mean():.3f}", flush=True)

    # ---- full two-camera merge with the shipped defaults ----
    try:
        from slr.pipeline import reconstruct_two_camera
        rec2 = ReconstructConfig(min_depth=300.0, max_depth=900.0)

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
        print(f"two_camera_merge (shipped defaults): {ms:.3f} ms/scan, "
              f"{n_pts} pts", flush=True)
    except Exception:
        print("two_camera_merge FAILED:\n" + traceback.format_exc()[-800:],
              flush=True)

    # ---- band NN at 256k vs brute force ----
    try:
        from slr.registration import nearest_neighbors
        from slr.registration.band import (band_nn_sorted,
                                           build_band_target, round_up,
                                           suggest_b_max, _BIG, _QT)

        rng = np.random.default_rng(3)
        n = 262144
        # production-like: a scan-sized surface patch (500 mm wide)
        xy = rng.uniform(-250, 250, (n, 2))
        z = (500 + 20 * np.sin(xy[:, 0] / 25.0) * np.cos(xy[:, 1] / 30.0)
             + 8 * np.sin(xy[:, 1] / 12.0))
        tgt = jnp.asarray(np.column_stack([xy, z]), jnp.float32)
        qry = tgt + jnp.asarray(rng.normal(0, 1.0, (n, 3)), jnp.float32)
        r = 8.0
        bmax = suggest_b_max(qry, tgt, r)
        print("band b_max:", bmax, "of", n // 512, "tiles", flush=True)
        bt = build_band_target(tgt)
        key = qry @ bt.axis
        ops = jax.lax.sort([key] + [qry[:, i] for i in range(3)],
                           num_keys=1)
        qc = jnp.stack(ops[1:4])
        qv = jnp.ones((qc.shape[1],), bool)
        out = jax.block_until_ready(jax.jit(
            lambda q: band_nn_sorted(q, qv, bt, r, bmax)[0])(qc))
        miss = float(jnp.mean(jnp.isinf(out)))
        print(f"band miss frac: {miss:.4f}", flush=True)

        def bstep(q):
            d2, pts, nrm, _ = band_nn_sorted(q, qv, bt, r, bmax)
            return pts[0, 0], q.at[0, 0].add(pts[0, 0] * 1e-30)

        ms_b = device_ms(bstep, qc, K_hi=17)
        print(f"band_nn 256k: {ms_b:.3f} ms", flush=True)

        def nstep(q):
            idx, d2 = nearest_neighbors(q, tgt, tile=2048)
            return d2[0], q.at[0, 0].add(d2[0] * 1e-30)

        ms_n = device_ms(nstep, qry, K_hi=3)
        print(f"brute_nn 256k: {ms_n:.3f} ms  (band speedup "
              f"{ms_n / ms_b:.1f}x)", flush=True)
    except Exception:
        print("band NN FAILED:\n" + traceback.format_exc()[-1500:],
              flush=True)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
