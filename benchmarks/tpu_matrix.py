"""Real-chip verification matrix (VERDICT r1 missing #1).

Runs every kernel variant and the registration/BA stack COMPILED on the
default backend (the v5e chip under axon; CPU elsewhere), asserts
accuracy against ground truth / the pure-JAX reference paths, and
records median latency. Appends one JSON line per case to
benchmarks/tpu_matrix_r2.jsonl so partial results survive a timeout.

Every case is timed DEVICE-SIDE with a chained in-jit loop (see
``device_ms``): K serialized runs inside one dispatch, per-run =
(T(K)-T(1))/(K-1). The host->device round trip through the axon relay
is bimodal per process (0.07-45 ms, measured below as "null_dispatch"),
so host-side wall-clock numbers measure the transport, not the kernel;
the subtraction cancels it in either mode.

Run: nohup timeout 5400 python benchmarks/tpu_matrix.py > /tmp/tpu_matrix.log 2>&1 &
"""

import json
import os
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401  (sets jax_default_matmul_precision=highest)
from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack, spatial_quality_unwrap
from slr.kernels import (
    fused_decode_triangulate, quality_unwrap_pallas, quality_unwrap_tiled,
)
from slr.kernels.common import use_interpret
from slr.registration import (
    nearest_neighbors, icp_point_to_plane, pose_graph_optimize,
)
from slr.dist.ba import bundle_adjust_reference
from slr.geom.se3 import so3_exp, se3_compose, se3_inverse
from slr.synth import bumps_depth
from slr.synth.render import default_rig, render_scan, quantize_frames

OUT = os.path.join(os.path.dirname(__file__), "tpu_matrix_r5.jsonl")
CAM_W, CAM_H = 1280, 1024


def emit(case: str, **rec):
    rec = {"case": case, **rec,
           "platform": jax.devices()[0].platform,
           "interpret": use_interpret()}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def timed(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2], out


def device_ms(step, x0, K_hi=65, n=5):
    """Device-side per-iteration time via K serialized runs inside ONE
    dispatch: per-iter = (T(K_hi) - T(1)) / (K_hi - 1).

    ``step(x) -> (scalar, x_next)`` must chain its output into the next
    input so XLA cannot hoist or elide the loop body. The subtraction
    cancels the per-dispatch relay round trip, which in this rig is
    bimodal per process (0.07-45 ms) and otherwise dominates every
    host-side wall-clock number.

    Returns (ms, timing_ok). The r2 matrix committed a 0.0 ms row with
    ok:true because the relay mode flipped between the K=1 and K=K_hi
    dispatch groups and the clamp hid the negative delta (VERDICT r2
    weak #1). Now the T(1)/T(K) samples are INTERLEAVED (per-trial
    deltas survive a single mode flip), a non-positive median delta is
    re-measured once with 3x the chain length, and if still implausible
    the case reports timing_ok=False instead of a fake fast number.
    """
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

    def measure(K):
        run1, runk = make(1), make(K)
        jax.block_until_ready(run1(x0))
        jax.block_until_ready(runk(x0))
        deltas = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(run1(x0))
            t1 = time.perf_counter()
            jax.block_until_ready(runk(x0))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) * 1e3 / (K - 1))
        deltas.sort()
        return deltas[len(deltas) // 2]

    med = measure(K_hi)
    if med > 0.02:
        if med < 0.3 and K_hi < 257:
            # sub-ms rows carried +-30% run-to-run relay variance in r3
            # (one run implied super-speed-of-light HBM bandwidth). A
            # ~257-long chain amortizes the jitter to ~1% of the delta
            # (VERDICT r3 next #9).
            med2 = measure(257)
            if med2 > 0.02:
                return med2, True
        return med, True
    # delta implausibly small (< 20 us — nothing in this matrix is that
    # fast): the relay can flake so that T(K) ~ T(1) even interleaved
    # (observed once: a 19.6 ms/iter case measured 0.0004). Re-measure
    # with a 3x chain; accept only if the longer chain shows a plausible
    # time, or if both runs agree that the case is genuinely tiny.
    med2 = measure(3 * K_hi - 2)
    if med2 > 1e-5 and (med2 > 0.02
                        or (med > 1e-5 and 1 / 3 < med2 / med < 3)):
        return med2, True
    return max(med2, 1e-6), False


def rms_vs_truth(pts_3hw, mask_hw, scan):
    pts = np.moveaxis(np.asarray(pts_3hw), 0, -1)
    valid = np.asarray(mask_hw) > 0.5
    valid &= np.asarray(scan.mask_true)
    err = np.linalg.norm(pts - np.asarray(scan.points_true), axis=-1)[valid]
    return float(np.sqrt(np.mean(err ** 2))), int(valid.sum())


def kernel_case(name, frames, cam, proj, cfg, dec, scan, rms_bound):
    @jax.jit
    def one(f):
        o = fused_decode_triangulate(f, cam, proj, cfg, dec)
        return o.points, o.mask

    pts, mask = jax.block_until_ready(one(frames))
    rms, n = rms_vs_truth(pts, mask, scan)

    if jnp.issubdtype(frames.dtype, jnp.integer):
        def step(f):
            o = fused_decode_triangulate(f, cam, proj, cfg, dec)
            # chain via an int frame perturbation that the decode's
            # thresholded comparisons cannot feel (flip frame[0,0,0] LSB)
            f2 = f.at[0, 0, 0].set(
                (f[0, 0, 0] ^ (o.points[0, 0, 0] > -1e30).astype(f.dtype)))
            return o.points[0, 0, 0], f2
    else:
        def step(f):
            o = fused_decode_triangulate(f, cam, proj, cfg, dec)
            f2 = f.at[0, 0, 0].set(f[0, 0, 0] + o.points[0, 0, 0] * 1e-30)
            return o.points[0, 0, 0], f2

    ms, t_ok = device_ms(step, frames)
    px_s = frames.shape[1] * frames.shape[2] / (ms / 1e3)
    F = frames.shape[0]
    in_bytes = frames.dtype.itemsize
    gb_s = (F * in_bytes + 6 * 4) * frames.shape[1] * frames.shape[2] / (
        ms / 1e3) / 1e9
    emit(name, ms_per_scan=round(ms, 4), rms_mm=round(rms, 4),
         valid_points=n, points_per_s=round(n / (ms / 1e3)),
         pixels_per_s=round(px_s), gb_per_s=round(gb_s, 1),
         ok=bool(rms < rms_bound) and t_ok, timing_ok=t_ok,
         frames=F, dtype=str(frames.dtype), timing="device_chained_loop")


def main():
    open(OUT, "w").close()
    emit("env", devices=[str(d) for d in jax.devices()])

    # ---- relay dispatch overhead (null jit call) ----
    x = jnp.zeros((8, 128), jnp.float32)
    ms, _ = timed(jax.jit(lambda a: a + 1.0), x)
    emit("null_dispatch", ms=round(ms, 3))

    # ---- config-3 scene, f32 + uint8 kernel paths ----
    cam, proj = default_rig(cam_w=CAM_W, cam_h=CAM_H)
    cfg3 = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                         phase_steps=4)
    dec = DecodeConfig()
    depth = bumps_depth(CAM_H, CAM_W, base=480.0, amp=30.0)
    try:
        scan3 = render_scan(cam, proj, depth, cfg3, noise_std=0.005,
                            key=jax.random.PRNGKey(0))
        jax.block_until_ready(scan3.frames)
        kernel_case("fused_f32_column", scan3.frames, cam, proj, cfg3, dec,
                    scan3, rms_bound=1.0)
        kernel_case("fused_uint8_column", quantize_frames(scan3.frames),
                    cam, proj, cfg3, dec, scan3, rms_bound=1.0)
    except Exception:
        emit("fused_column", error=traceback.format_exc()[-1500:])

    # ---- config-1 Gray-only path ----
    try:
        cfg1 = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                             phase_steps=0)
        scan1 = render_scan(cam, proj, depth, cfg1)
        kernel_case("fused_gray_only", scan1.frames, cam, proj, cfg1, dec,
                    scan1, rms_bound=5.0)
    except Exception:
        emit("fused_gray_only", error=traceback.format_exc()[-1500:])

    # ---- row+column midpoint path (full projector distortion) ----
    try:
        cam_m, proj_m = default_rig(
            cam_w=CAM_W, cam_h=CAM_H,
            proj_dist=[-0.08, 0.02, 0.001, -0.001, 0.0])
        cfgm = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                             row_gray_bits=6, phase_steps=4)
        scanm = render_scan(cam_m, proj_m, depth, cfgm)
        kernel_case("fused_midpoint_rowcol", scanm.frames, cam_m, proj_m,
                    cfgm, dec, scanm, rms_bound=10.0)
    except Exception:
        emit("fused_midpoint_rowcol", error=traceback.format_exc()[-1500:])

    # ---- multifreq hierarchical phase coding (kernel variant) ----
    try:
        cfgmf = PatternConfig(proj_width=1024, proj_height=768,
                              coding="multifreq", phase_steps=4,
                              mf_levels=3, mf_ratio=8.0)
        scanmf = render_scan(cam, proj, depth, cfgmf, noise_std=0.005,
                             key=jax.random.PRNGKey(2))
        kernel_case("fused_multifreq", scanmf.frames, cam, proj, cfgmf, dec,
                    scanmf, rms_bound=1.0)
    except Exception:
        emit("fused_multifreq", error=traceback.format_exc()[-1500:])

    # ---- quality-guided unwrap kernels vs pure-JAX repair ----
    try:
        rng = np.random.default_rng(0)
        H, W = 1024, 1280
        Phi = np.linspace(0, 60, W)[None, :] + 0.1 * rng.normal(size=(H, W))
        bad = np.zeros((H, W), bool)
        bad[rng.integers(1, H - 1, 400), rng.integers(1, W - 1, 400)] = True
        q = np.where(bad, 0.05, 1.0).astype(np.float32)
        Phi_n = np.where(bad, Phi + 2 * np.pi * 3, Phi).astype(np.float32)
        Phi_n, q = jnp.asarray(Phi_n), jnp.asarray(q)
        mask = jnp.ones((H, W), bool)

        ref = jax.block_until_ready(
            jax.jit(lambda p, qq, m: spatial_quality_unwrap(p, qq, m, iters=6))(
                Phi_n, q, mask))
        ms_ref, _ = device_ms(
            lambda p: (spatial_quality_unwrap(p, q, mask, iters=6)[0, 0],
                       p.at[0, 0].add(p[0, 1] * 1e-30)), Phi_n)

        def unwrap_step(kern):
            def step(p):
                out = kern(p, q, mask, iters=6)
                return out[0, 0], p.at[0, 0].add(out[0, 0] * 1e-30)
            return step

        out_pal = jax.block_until_ready(
            jax.jit(lambda p, qq, m: quality_unwrap_pallas(p, qq, m, iters=6))(
                Phi_n, q, mask))
        ms_pal, tok = device_ms(unwrap_step(quality_unwrap_pallas), Phi_n)
        err = float(np.abs(np.asarray(out_pal) - np.asarray(ref)).max())
        emit("quality_unwrap_pallas", ms=round(ms_pal, 4),
             ms_pure_jax=round(ms_ref, 4), max_err_vs_jax=err,
             ok=bool(err < 1e-4) and tok, timing_ok=tok,
             timing="device_chained_loop")

        out_til = jax.block_until_ready(
            jax.jit(lambda p, qq, m: quality_unwrap_tiled(p, qq, m, iters=6))(
                Phi_n, q, mask))
        ms_til, tok = device_ms(unwrap_step(quality_unwrap_tiled), Phi_n)
        errt = float(np.abs(np.asarray(out_til) - np.asarray(ref)).max())
        emit("quality_unwrap_tiled", ms=round(ms_til, 4),
             max_err_vs_jax=errt, ok=bool(errt < 1e-4) and tok,
             timing_ok=tok, timing="device_chained_loop")

        # wavefront unwrap, r4: the VMEM Hillis-Steele kernel with the
        # 3-field monoid (slr/kernels/wavefront.py) replaces the pure-JAX
        # associative scan whose 32 full-grid HBM round trips cost
        # 75.6 ms in r3 (VERDICT r3 next #2: target < 15 ms)
        from slr.kernels.wavefront import wavefront_repair_pallas

        for name, kw, khi in (
                ("wavefront_unwrap",               # r3-parity heavy config
                 dict(levels=4, rounds_per_level=2), 9),
                ("wavefront_unwrap_light",         # repair-mode defaults
                 dict(), 17)):
            out_wf = jax.block_until_ready(jax.jit(
                lambda p, qq, m, kw=kw: wavefront_repair_pallas(
                    p, qq, m, **kw))(Phi_n, q, mask))
            ms_wf, tok = device_ms(
                lambda p, kw=kw: (
                    wavefront_repair_pallas(p, q, mask, **kw)[0, 0],
                    p.at[0, 0].add(p[0, 1] * 1e-30)), Phi_n, K_hi=khi)
            # wavefront repairs the same seeded blobs the voting kernels do
            errw = float(np.abs(np.asarray(out_wf) - np.asarray(ref)).max())
            emit(name, ms=round(ms_wf, 4),
                 max_err_vs_voting=errw,
                 ok=bool(errw < 1e-4) and tok,
                 timing_ok=tok, timing="device_chained_loop")
    except Exception:
        emit("quality_unwrap", error=traceback.format_exc()[-1500:])

    # ---- registration stack ----
    rng = np.random.default_rng(1)

    def bumpy(n, seed):
        r = np.random.default_rng(seed)
        xy = r.uniform(-100, 100, (n, 2))
        z = (500 + 20 * np.sin(xy[:, 0] / 25.0) * np.cos(xy[:, 1] / 30.0)
             + 8 * np.sin(xy[:, 1] / 12.0))
        return np.column_stack([xy, z]).astype(np.float32)

    try:
        tgt = jnp.asarray(rng.uniform(-50, 50, (16384, 3)), jnp.float32)
        qry = jnp.asarray(rng.uniform(-50, 50, (16384, 3)), jnp.float32)
        idx, d2 = jax.block_until_ready(
            jax.jit(lambda a, b: nearest_neighbors(a, b, tile=2048))(qry, tgt))
        ms, tok = device_ms(
            lambda a: (nearest_neighbors(a, tgt, tile=2048)[1][0],
                       a.at[0, 0].add(1e-30)), qry)
        # exactness spot check vs numpy brute force on 64 queries
        qn, tn = np.asarray(qry[:64]), np.asarray(tgt)
        ref_idx = np.argmin(
            ((qn[:, None] - tn[None]) ** 2).sum(-1), axis=1)
        ok = bool((np.asarray(idx[:64]) == ref_idx).all())
        emit("nearest_neighbors_16k", ms=round(ms, 3), ok=ok and tok,
             timing_ok=tok,
             pairs_per_s=round(16384 * 16384 / (ms / 1e3)),
             timing="device_chained_loop")
    except Exception:
        emit("nearest_neighbors_16k", error=traceback.format_exc()[-1500:])

    try:
        src_np = bumpy(8192, 0)
        src = jnp.asarray(src_np)
        rv = jnp.asarray([0.01, -0.02, 0.015], jnp.float32)
        R_true = so3_exp(rv)
        t_true = jnp.asarray([3.0, -2.0, 4.0], jnp.float32)
        tgt = src @ R_true.T + t_true
        gx = 20 * np.cos(src_np[:, 0] / 25.0) / 25.0 * np.cos(src_np[:, 1] / 30.0)
        gy = (-20 * np.sin(src_np[:, 0] / 25.0) * np.sin(src_np[:, 1] / 30.0) / 30.0
              + 8 * np.cos(src_np[:, 1] / 12.0) / 12.0)
        n0 = np.column_stack([-gx, -gy, np.ones_like(gx)])
        n0 /= np.linalg.norm(n0, axis=1, keepdims=True)
        n_tgt = jnp.asarray(n0, jnp.float32) @ R_true.T

        def run_icp(s):
            return icp_point_to_plane(s, tgt, n_tgt, iters=15,
                                      max_corr_dist=20.0, nn_tile=2048)

        res = jax.block_until_ready(jax.jit(run_icp)(src))

        def icp_step(s):
            r = run_icp(s)
            return r.rms, s.at[0, 0].add(r.rms * 1e-30)

        ms, tok = device_ms(icp_step, src, K_hi=9)
        rerr = float(np.abs(np.asarray(res.R) - np.asarray(R_true)).max())
        terr = float(np.abs(np.asarray(res.t) - np.asarray(t_true)).max())
        emit("icp_8k_15iter", ms=round(ms, 3), R_err=rerr, t_err=terr,
             rms=float(res.rms),
             ok=bool(rerr < 5e-3 and terr < 0.5) and tok, timing_ok=tok,
             timing="device_chained_loop")
    except Exception:
        emit("icp_8k_15iter", error=traceback.format_exc()[-1500:])

    try:
        r = np.random.default_rng(5)
        S = 16
        R_true, t_true = [jnp.eye(3)], [jnp.zeros(3)]
        for s in range(1, S):
            rv = jnp.asarray(r.uniform(-0.2, 0.2, 3), jnp.float32)
            tv = jnp.asarray(r.uniform(-20, 20, 3), jnp.float32)
            R, t = se3_compose(R_true[-1], t_true[-1], so3_exp(rv), tv)
            R_true.append(R); t_true.append(t)
        R_true, t_true = jnp.stack(R_true), jnp.stack(t_true)
        edges = [(s, s + 1) for s in range(S - 1)] + [(S - 1, 0), (0, S // 2)]
        ei = jnp.asarray([e[0] for e in edges])
        ej = jnp.asarray([e[1] for e in edges])
        Zr, Zt = [], []
        for (i, j) in edges:
            Ri, ti = se3_inverse(R_true[i], t_true[i])
            Rz, tz = se3_compose(Ri, ti, R_true[j], t_true[j])
            Zr.append(Rz); Zt.append(tz)
        Zr, Zt = jnp.stack(Zr), jnp.stack(Zt)
        noise = jax.vmap(so3_exp)(
            jnp.asarray(r.normal(0, 0.01, (S, 3)), jnp.float32))
        R0 = jnp.einsum("sij,sjk->sik", R_true, noise)
        t0 = t_true + jnp.asarray(r.normal(0, 1.0, (S, 3)), jnp.float32)
        res = jax.block_until_ready(jax.jit(
            lambda a, b: pose_graph_optimize(a, b, ei, ej, Zr, Zt,
                                             iters=20))(R0, t0))

        def pg_step(t_c):
            r = pose_graph_optimize(R0, t_c, ei, ej, Zr, Zt, iters=20)
            return r.rms, t_c.at[0, 0].add(r.rms * 1e-30)

        ms, tok = device_ms(pg_step, t0, K_hi=9)
        emit("pose_graph_S16_20iter", ms=round(ms, 3), rms=float(res.rms),
             ok=bool(float(res.rms) < 1e-4) and tok, timing_ok=tok,
             timing="device_chained_loop")
    except Exception:
        emit("pose_graph_S16_20iter", error=traceback.format_exc()[-1500:])

    try:
        r = np.random.default_rng(7)
        S, L, K = 6, 4096, 3
        R_true, t_true = [jnp.eye(3)], [jnp.zeros(3)]
        for s in range(1, S):
            R_true.append(so3_exp(jnp.asarray(r.uniform(-0.3, 0.3, 3),
                                              jnp.float32)))
            t_true.append(jnp.asarray(r.uniform(-50, 50, 3), jnp.float32))
        R_true, t_true = jnp.stack(R_true), jnp.stack(t_true)
        X_true = jnp.asarray(r.uniform(-100, 100, (L, 3)), jnp.float32)
        obs_s = jnp.asarray(r.integers(0, S, (L, K)), jnp.int32)
        Rs, ts = R_true[obs_s], t_true[obs_s]
        p = jnp.einsum("lkij,lki->lkj", Rs, X_true[:, None, :] - ts)
        p = p + jnp.asarray(r.normal(0, 0.01, p.shape), jnp.float32)
        obs_w = jnp.ones((L, K), jnp.float32)
        noise = jax.vmap(so3_exp)(
            jnp.asarray(r.normal(0, 0.02, (S, 3)), jnp.float32))
        R0 = jnp.einsum("sij,sjk->sik", R_true, noise)
        t0 = t_true + jnp.asarray(r.normal(0, 2.0, (S, 3)), jnp.float32)
        X0 = X_true + jnp.asarray(r.normal(0, 2.0, (L, 3)), jnp.float32)
        res = jax.block_until_ready(jax.jit(
            lambda a, b, c: bundle_adjust_reference(
                a, b, c, obs_s, p, obs_w, iters=10))(R0, t0, X0))

        def ba_step(t_c):
            r = bundle_adjust_reference(R0, t_c, X0, obs_s, p, obs_w,
                                        iters=10)
            return r.rms, t_c.at[0, 0].add(r.rms * 1e-30)

        ms, tok = device_ms(ba_step, t0, K_hi=5)
        emit("schur_ba_S6_L4096_10iter", ms=round(ms, 3),
             rms=float(res.rms), ok=bool(float(res.rms) < 0.05) and tok,
             timing_ok=tok, timing="device_chained_loop")
    except Exception:
        emit("schur_ba_S6_L4096_10iter", error=traceback.format_exc()[-1500:])

    # ---- two-camera projector-space rendezvous ----
    try:
        from slr.pipeline import reconstruct_two_camera
        from slr.synth import spheres_scene, two_camera_rig

        H2, W2 = 1024, 1280
        cfg2 = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                             row_gray_bits=6, phase_steps=4,
                             row_phase_steps=4)
        c1, c2, prj = two_camera_rig(cam_w=W2, cam_h=H2, proj_w=1024,
                                     proj_h=768)
        scans2 = []
        for i, c in enumerate((c1, c2)):
            d2 = spheres_scene(c, H2, W2)
            scans2.append(render_scan(c, prj, d2, cfg2, noise_std=0.003,
                                      key=jax.random.PRNGKey(20 + i),
                                      cast_shadows=True))
        sa, sb = scans2
        from slr.config import ReconstructConfig
        rec2 = ReconstructConfig(min_depth=300.0, max_depth=900.0)

        # projector-grid ground truth for the merge method (its organized
        # cloud lives on the projector grid; the projector is a Camera)
        from slr.geom.camera import pixel_to_ray
        d_pt = spheres_scene(prj, cfg2.proj_height, cfg2.proj_width)
        vg, ug = jnp.meshgrid(
            jnp.arange(cfg2.proj_height, dtype=jnp.float32),
            jnp.arange(cfg2.proj_width, dtype=jnp.float32), indexing="ij")
        o_p, d_p = pixel_to_ray(prj, ug, vg)
        dz_p = jnp.einsum("j,...j->...", prj.R[2], d_p)
        pts_true_p = np.asarray(o_p + (d_pt / dz_p)[..., None] * d_p)

        # K_hi stays SMALL for the search graph: chaining 17 copies
        # faults the TPU device intermittently (UNAVAILABLE — reproduced
        # again in r5, killing every later case of that run). K<=5 is
        # the documented stable range; the production API fences this
        # path (twocam.py unsafe_search).
        for meth, K_hi in (("merge", 17), ("search", 3), ("splat", 3)):
            cl = jax.block_until_ready(jax.jit(
                lambda a, b: reconstruct_two_camera(
                    a, b, c1, c2, cfg2, rec=rec2, method=meth,
                    unsafe_search=True))(
                sa.frames, sb.frames))
            if meth == "merge":
                m2 = np.asarray(cl.mask)
                e2 = np.linalg.norm(
                    np.asarray(cl.points) - pts_true_p, axis=-1)[m2]
                rms2, n2 = float(np.sqrt((e2 ** 2).mean())), int(m2.sum())
            else:
                rms2, n2 = rms_vs_truth(
                    jnp.moveaxis(cl.points, -1, 0), cl.mask, sa)

            def tc_step(f, meth=meth):
                o = reconstruct_two_camera(f, sb.frames, c1, c2, cfg2,
                                           rec=rec2, method=meth,
                                           unsafe_search=True)
                return o.points[0, 0, 0], f.at[0, 0, 0].add(
                    o.points[0, 0, 0] * 1e-30)

            ms, tok = device_ms(tc_step, sa.frames, K_hi=K_hi)
            emit(f"two_camera_{meth}", ms_per_scan=round(ms, 4),
                 rms_mm=round(rms2, 4), valid_points=n2,
                 points_per_s=round(n2 / (ms / 1e3)),
                 ok=bool(rms2 < 0.5) and tok, timing_ok=tok,
                 timing="device_chained_loop")

        # uint8 merge row (r5): production cameras deliver 8-bit frames
        # and the fused decode_only route then reads 1 B/px from HBM
        sa8 = quantize_frames(sa.frames)
        sb8 = quantize_frames(sb.frames)
        cl8 = jax.block_until_ready(jax.jit(
            lambda a, b: reconstruct_two_camera(
                a, b, c1, c2, cfg2, rec=rec2, method="merge"))(sa8, sb8))
        m8 = np.asarray(cl8.mask)
        e8 = np.linalg.norm(np.asarray(cl8.points) - pts_true_p,
                            axis=-1)[m8]
        rms8, n8 = float(np.sqrt((e8 ** 2).mean())), int(m8.sum())

        def tc8_step(f):
            o = reconstruct_two_camera(f, sb8, c1, c2, cfg2,
                                       rec=rec2, method="merge")
            f2 = f.at[0, 0, 0].set(
                f[0, 0, 0] ^ (o.points[0, 0, 0] > -1e30).astype(f.dtype))
            return o.points[0, 0, 0], f2

        ms8, tok8 = device_ms(tc8_step, sa8, K_hi=17)
        emit("two_camera_merge_uint8", ms_per_scan=round(ms8, 4),
             rms_mm=round(rms8, 4), valid_points=n8,
             points_per_s=round(n8 / (ms8 / 1e3)),
             ok=bool(rms8 < 0.5) and tok8, timing_ok=tok8,
             timing="device_chained_loop")
    except Exception:
        emit("two_camera_rendezvous", error=traceback.format_exc()[-1500:])

    # ---- row+column midpoint WITH sub-pixel row phase (VERDICT r3 next
    # #8: the Gray-only row decode undersold the mode at 0.745 mm) ----
    try:
        cam_m, proj_m = default_rig(
            cam_w=CAM_W, cam_h=CAM_H,
            proj_dist=[-0.08, 0.02, 0.001, -0.001, 0.0])
        cfgmp = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                              row_gray_bits=6, phase_steps=4,
                              row_phase_steps=4)
        scanmp = render_scan(cam_m, proj_m, depth, cfgmp)
        kernel_case("fused_midpoint_rowcol_phase", scanmp.frames, cam_m,
                    proj_m, cfgmp, dec, scanmp, rms_bound=0.5)
    except Exception:
        emit("fused_midpoint_rowcol_phase",
             error=traceback.format_exc()[-1500:])

    # ---- HDR exposure bracket through the fused kernel (r3 next #5) ----
    try:
        from slr.kernels.fused_scan import fused_decode_triangulate_hdr
        from slr.synth import checker_albedo

        # 21x albedo range: dark cells need the long exposure, which
        # saturates the bright cells — the capture scenario the bracket
        # exists for (a uniform-albedo scene would make E=3 pure waste).
        # Each exposure is an INDEPENDENT capture (r5): per-exposure
        # sensor noise is drawn separately — scaling one noisy stack by
        # the gains would correlate the noise across the bracket and
        # make phase fusion a provable no-op.
        albedo_h = checker_albedo(CAM_H, CAM_W, cells=8, lo=0.035,
                                  hi=0.75)
        scan_h = render_scan(cam, proj, depth, cfg3, noise_std=0.0,
                             albedo=albedo_h)
        hkeys = jax.random.split(jax.random.PRNGKey(9), 3)
        bracket = jnp.stack([
            quantize_frames(jnp.clip(
                scan_h.frames * g
                + 0.003 * jax.random.normal(k, scan_h.frames.shape),
                0.0, 1.0))
            for g, k in zip((1.0, 3.2, 10.0), hkeys)])

        for fuse in ("sum", "select"):
            @jax.jit
            def hdr_one(b, fuse=fuse):
                o = fused_decode_triangulate_hdr(b, cam, proj, cfg3, dec,
                                                 fuse=fuse)
                return o.points, o.mask

            pts_h, mask_h = jax.block_until_ready(hdr_one(bracket))
            rms_h, n_h = rms_vs_truth(pts_h, mask_h, scan_h)

            def hdr_step(b, fuse=fuse):
                o = fused_decode_triangulate_hdr(b, cam, proj, cfg3, dec,
                                                 fuse=fuse)
                b2 = b.at[0, 0, 0, 0].set(
                    (b[0, 0, 0, 0] ^ (o.points[0, 0, 0] > -1e30).astype(
                        b.dtype)))
                return o.points[0, 0, 0], b2

            ms_h, tok = device_ms(hdr_step, bracket, K_hi=33)
            emit(f"hdr_fused_e3_{fuse}", ms_per_scan=round(ms_h, 4),
                 rms_mm=round(rms_h, 4), valid_points=n_h,
                 frames=int(bracket.shape[0] * bracket.shape[1]),
                 dtype=str(bracket.dtype),
                 ok=bool(rms_h < 1.0) and tok, timing_ok=tok,
                 timing="device_chained_loop")
    except Exception:
        emit("hdr_fused_e3", error=traceback.format_exc()[-1500:])

    # ---- calibration on the chip (VERDICT r3 next #4) ----
    try:
        from slr.calib.zhang import calibrate_camera
        from slr.calib.stereo import stereo_calibrate
        from slr.geom.camera import make_camera, project
        from slr.geom.se3 import so3_exp as _so3

        rngc = np.random.default_rng(3)
        cols, rows_b, sq = 9, 6, 20.0
        xx, yy = np.meshgrid(np.arange(cols), np.arange(rows_b))
        obj = np.zeros((cols * rows_b, 3), np.float32)
        obj[:, 0] = xx.ravel() * sq
        obj[:, 1] = yy.ravel() * sq
        obj_j = jnp.asarray(obj)
        cam_t = make_camera(1400.0, 1395.0, 640.0, 512.0,
                            dist=[-0.12, 0.05, 0.001, -0.001, 0.0])
        proj_t = make_camera(1750.0, 1745.0, 512.0, 700.0,
                             dist=[-0.06, 0.02, 0.0, 0.0, 0.0])
        R_cp = np.asarray(_so3(jnp.asarray([0.0, -0.28, 0.0],
                                           jnp.float32)))
        t_cp = np.asarray([180.0, 6.0, 40.0], np.float32)
        V = 24
        cam_uv, proj_uv = [], []
        for vi in range(V):
            rv = jnp.asarray(rngc.uniform(-0.35, 0.35, 3), jnp.float32)
            tv = jnp.asarray(
                [rngc.uniform(-60, 60), rngc.uniform(-50, 50),
                 rngc.uniform(420, 640)], jnp.float32)
            Rb = _so3(rv)
            pts_w = obj_j @ Rb.T + tv
            uv_c, _ = project(cam_t, pts_w)
            pts_p = pts_w @ jnp.asarray(R_cp).T + jnp.asarray(t_cp)
            uv_p, _ = project(proj_t, pts_p)
            cam_uv.append(uv_c + rngc.normal(0, 0.1, uv_c.shape))
            proj_uv.append(uv_p + rngc.normal(0, 0.1, uv_p.shape))
        cam_uv = jnp.asarray(np.stack(cam_uv), jnp.float32)
        proj_uv = jnp.asarray(np.stack(proj_uv), jnp.float32)

        res_c = jax.block_until_ready(
            jax.jit(lambda u: calibrate_camera(obj_j, u))(cam_uv))
        fx_err = abs(float(res_c.camera.fx) - 1400.0) / 1400.0

        def zh_step(u):
            r = calibrate_camera(obj_j, u)
            return r.rms, u.at[0, 0, 0].add(r.rms * 1e-30)

        ms_z, tok = device_ms(zh_step, cam_uv, K_hi=9)
        emit("calib_zhang_v24", ms=round(ms_z, 3),
             rms_px=round(float(res_c.rms), 4),
             fx_rel_err=round(fx_err, 5),
             ok=bool(fx_err < 5e-3 and float(res_c.rms) < 0.3) and tok,
             timing_ok=tok, timing="device_chained_loop", views=V)

        res_p = jax.block_until_ready(
            jax.jit(lambda u: calibrate_camera(obj_j, u))(proj_uv))

        def st_step(u):
            r = stereo_calibrate(obj_j, u, proj_uv, res_c, res_p)
            return r.rms, u.at[0, 0, 0].add(r.rms * 1e-30)

        res_s = jax.block_until_ready(jax.jit(
            lambda u: stereo_calibrate(obj_j, u, proj_uv, res_c,
                                       res_p))(cam_uv))
        ms_s, tok = device_ms(st_step, cam_uv, K_hi=5)
        t_err = float(jnp.linalg.norm(res_s.proj.t - jnp.asarray(t_cp)))
        emit("calib_stereo_v24", ms=round(ms_s, 3),
             rms_px=round(float(res_s.rms), 4),
             t_rel_err_mm=round(t_err, 3),
             ok=bool(t_err < 1.0 and float(res_s.rms) < 0.3) and tok,
             timing_ok=tok, timing="device_chained_loop", views=V)
    except Exception:
        emit("calib", error=traceback.format_exc()[-1500:])

    # ---- large-N ICP on the voxel-hash NN route (r3 next #6) ----
    try:
        src_np = bumpy(65536, 3)
        src64 = jnp.asarray(src_np)
        rv = jnp.asarray([0.01, -0.02, 0.015], jnp.float32)
        R_true = so3_exp(rv)
        t_true = jnp.asarray([3.0, -2.0, 4.0], jnp.float32)
        tgt64 = src64 @ R_true.T + t_true
        gx = (20 * np.cos(src_np[:, 0] / 25.0) / 25.0
              * np.cos(src_np[:, 1] / 30.0))
        gy = (-20 * np.sin(src_np[:, 0] / 25.0)
              * np.sin(src_np[:, 1] / 30.0) / 30.0
              + 8 * np.cos(src_np[:, 1] / 12.0) / 12.0)
        n0 = np.column_stack([-gx, -gy, np.ones_like(gx)])
        n0 /= np.linalg.norm(n0, axis=1, keepdims=True)
        n_tgt64 = jnp.asarray(n0, jnp.float32) @ R_true.T

        def run_icp64(s):
            return icp_point_to_plane(s, tgt64, n_tgt64, iters=15,
                                      max_corr_dist=15.0,
                                      nn_method="voxel")

        res64 = jax.block_until_ready(jax.jit(run_icp64)(src64))

        def icp64_step(s):
            r = run_icp64(s)
            return r.rms, s.at[0, 0].add(r.rms * 1e-30)

        ms64, tok = device_ms(icp64_step, src64, K_hi=5)
        rerr = float(jnp.abs(res64.R - R_true).max())
        terr = float(jnp.abs(res64.t - t_true).max())
        emit("icp_64k_voxel_15iter", ms=round(ms64, 3), R_err=rerr,
             t_err=terr, rms=float(res64.rms),
             ok=bool(rerr < 5e-3 and terr < 0.5) and tok, timing_ok=tok,
             timing="device_chained_loop")
    except Exception:
        emit("icp_64k_voxel_15iter", error=traceback.format_exc()[-1500:])

    # ---- streaming executor vs sequential dispatch (r3 next #7) ----
    try:
        from slr.pipeline.stream import reconstruct_stream

        n_scans = 8
        stacks_np = [np.asarray(quantize_frames(scan3.frames))
                     for _ in range(n_scans)]

        # warm the kernel once
        from slr.pipeline.reconstruct import reconstruct_dense
        from slr.config import ReconstructConfig as _RC
        rc0 = _RC()
        jax.block_until_ready(reconstruct_dense(
            jnp.asarray(stacks_np[0]), cam, proj, cfg3, dec, rc0).points)

        def run_seq():
            outs = []
            for s in stacks_np:
                f = jax.device_put(jnp.asarray(s))
                cl = reconstruct_dense(f, cam, proj, cfg3, dec, rc0)
                jax.block_until_ready(cl.points)   # no overlap
                outs.append(cl.mask)
            return outs

        def run_stream():
            outs = []
            for cl in reconstruct_stream((jnp.asarray(s)
                                          for s in stacks_np),
                                         cam, proj, cfg3, dec, rc0,
                                         prefetch=3):
                outs.append(cl.mask)
            jax.block_until_ready(outs[-1])
            return outs

        t_seq = timed(lambda: run_seq()[-1], n=3)[0]
        t_str = timed(lambda: run_stream()[-1], n=3)[0]
        emit("stream_8scans", seq_ms_total=round(t_seq, 2),
             stream_ms_total=round(t_str, 2),
             speedup=round(t_seq / t_str, 2),
             ok=True, timing="host_wall",
             note="host wall incl. relay transfers; speedup = overlap win")
    except Exception:
        emit("stream_8scans", error=traceback.format_exc()[-1500:])

    # =====================================================================
    # Round-5 additions: E5 evidence (feature stage, fusion tail, one
    # end-to-end config-4 number) + the sorted-band NN (VERDICT r4 next
    # #1/#3). Production sizes throughout.
    # =====================================================================

    # ---- FPFH + RANSAC coarse alignment on-chip (VERDICT r4 missing #1)
    try:
        from slr.registration import fpfh_features, ransac_align
        from slr.geom.se3 import so3_exp as _so3e

        rng = np.random.default_rng(11)
        n_kp = 4096
        src_f = jnp.asarray(bumpy(n_kp, 8))
        gx = (20 * np.cos(np.asarray(src_f[:, 0]) / 25.0) / 25.0
              * np.cos(np.asarray(src_f[:, 1]) / 30.0))
        gy = (-20 * np.sin(np.asarray(src_f[:, 0]) / 25.0)
              * np.sin(np.asarray(src_f[:, 1]) / 30.0) / 30.0
              + 8 * np.cos(np.asarray(src_f[:, 1]) / 12.0) / 12.0)
        n0 = np.column_stack([-gx, -gy, np.ones_like(gx)])
        n0 /= np.linalg.norm(n0, axis=1, keepdims=True)
        nrm_f = jnp.asarray(n0, jnp.float32)
        R_big = _so3e(jnp.asarray([0.1, 0.15, 0.5], jnp.float32))  # ~32 deg
        t_big = jnp.asarray([40.0, -30.0, 20.0], jnp.float32)
        tgt_f = src_f @ R_big.T + t_big
        ntgt_f = nrm_f @ R_big.T

        feats = jax.jit(lambda p, n: fpfh_features(p, n, k=16))
        f_src = jax.block_until_ready(feats(src_f, nrm_f))
        f_tgt = jax.block_until_ready(feats(tgt_f, ntgt_f))

        def fp_step(p):
            f = fpfh_features(p, nrm_f, k=16)
            return f[0, 0], p.at[0, 0].add(f[0, 0] * 1e-30)

        ms_f, tok_f = device_ms(fp_step, src_f, K_hi=17)

        ra = jax.jit(lambda a, fa, b, fb: ransac_align(
            a, fa, b, fb, n_iters=256, inlier_dist=5.0))
        R_est, t_est, inl = jax.block_until_ready(
            ra(src_f, f_src, tgt_f, f_tgt))
        rot_err = float(np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(R_est).T @ np.asarray(R_big)) - 1) / 2,
            -1, 1))))
        t_err = float(jnp.linalg.norm(t_est - t_big))

        def ra_step(p):
            R2, t2, _ = ransac_align(p, f_src, tgt_f, f_tgt,
                                     n_iters=256, inlier_dist=5.0)
            return t2[0], p.at[0, 0].add(t2[0] * 1e-30)

        ms_r, tok_r = device_ms(ra_step, src_f, K_hi=17)
        emit("fpfh_4096_k16", ms=round(ms_f, 3),
             ok=tok_f, timing_ok=tok_f, timing="device_chained_loop")
        emit("ransac_align_4096_i256", ms=round(ms_r, 3),
             rot_err_deg=round(rot_err, 3), t_err=round(t_err, 3),
             inlier_frac=round(float(inl), 3),
             ok=bool(rot_err < 5.0 and t_err < 8.0) and tok_r,
             timing_ok=tok_r, timing="device_chained_loop",
             note="~32 deg + 50 mm motion recovered (coarse stage: "
                  "ICP owns the fine alignment)")
    except Exception:
        emit("fpfh_ransac", error=traceback.format_exc()[-1500:])

    # ---- sorted-band NN at 256k + ICP on the band route (r4 next #3)
    try:
        from slr.registration import nearest_neighbors as _nn_exact
        from slr.registration.band import (band_nn_sorted,
                                           build_band_target,
                                           suggest_b_max)

        rng = np.random.default_rng(13)
        n_big = 262144
        xy = rng.uniform(-250, 250, (n_big, 2))
        z = (500 + 20 * np.sin(xy[:, 0] / 25.0) * np.cos(xy[:, 1] / 30.0)
             + 8 * np.sin(xy[:, 1] / 12.0))
        tgt_b = jnp.asarray(np.column_stack([xy, z]), jnp.float32)
        qry_b = tgt_b + jnp.asarray(rng.normal(0, 1.0, (n_big, 3)),
                                    jnp.float32)
        r_corr = 8.0
        bmax = suggest_b_max(qry_b, tgt_b, r_corr)
        bt = build_band_target(tgt_b)
        key_b = qry_b @ bt.axis
        ops = jax.lax.sort([key_b] + [qry_b[:, i] for i in range(3)],
                           num_keys=1)
        qc_b = jnp.stack(ops[1:4])
        qv_b = jnp.ones((qc_b.shape[1],), bool)
        d2_b = jax.block_until_ready(jax.jit(
            lambda q: band_nn_sorted(q, qv_b, bt, r_corr, bmax)[0])(qc_b))
        miss = float(jnp.mean(jnp.isinf(d2_b)))

        def b_step(q):
            d2, p2, n2, _ = band_nn_sorted(q, qv_b, bt, r_corr, bmax)
            return p2[0, 0], q.at[0, 0].add(p2[0, 0] * 1e-30)

        ms_b, tok = device_ms(b_step, qc_b, K_hi=17)

        def e_step(q):
            idx, d2 = _nn_exact(q, tgt_b, tile=2048)
            return d2[0], q.at[0, 0].add(d2[0] * 1e-30)

        ms_e, tok_e = device_ms(e_step, qry_b, K_hi=3)
        emit("band_nn_256k", ms=round(ms_b, 3),
             brute_ms=round(ms_e, 3),
             speedup=round(ms_e / ms_b, 2), b_max_tiles=int(bmax),
             n_tiles=int(bt.tlo.shape[0]), miss_frac=round(miss, 5),
             ok=bool(miss < 0.01) and tok and tok_e, timing_ok=tok,
             timing="device_chained_loop",
             note="exact within 8 mm radius; 500 mm scan-sized cloud")

        # full ICP on the band route at 256k
        gxb = (20 * np.cos(np.asarray(tgt_b[:, 0]) / 25.0) / 25.0
               * np.cos(np.asarray(tgt_b[:, 1]) / 30.0))
        gyb = (-20 * np.sin(np.asarray(tgt_b[:, 0]) / 25.0)
               * np.sin(np.asarray(tgt_b[:, 1]) / 30.0) / 30.0
               + 8 * np.cos(np.asarray(tgt_b[:, 1]) / 12.0) / 12.0)
        nb = np.column_stack([-gxb, -gyb, np.ones_like(gxb)])
        nb /= np.linalg.norm(nb, axis=1, keepdims=True)
        R_true_b = so3_exp(jnp.asarray([0.004, -0.006, 0.005], jnp.float32))
        t_true_b = jnp.asarray([1.5, -1.0, 2.0], jnp.float32)
        src_icp = tgt_b
        tgt_icp = src_icp @ R_true_b.T + t_true_b
        n_icp = jnp.asarray(nb, jnp.float32) @ R_true_b.T

        # band cap precomputed eagerly: the chained device timing jits
        # around the call and suggest_b_max's host sync cannot trace
        bmax_icp = suggest_b_max(src_icp, tgt_icp, 8.0)

        def run_band_icp(s):
            return icp_point_to_plane(s, tgt_icp, n_icp, iters=15,
                                      max_corr_dist=8.0,
                                      nn_method="band",
                                      band_b_max=bmax_icp)

        res_b = jax.block_until_ready(run_band_icp(src_icp))

        def icp_b_step(s):
            r = run_band_icp(s)
            return r.rms, s.at[0, 0].add(r.rms * 1e-30)

        ms_ib, tok = device_ms(icp_b_step, src_icp, K_hi=3)
        rerr = float(jnp.abs(res_b.R - R_true_b).max())
        terr = float(jnp.abs(res_b.t - t_true_b).max())
        emit("icp_256k_band_15iter", ms=round(ms_ib, 3), R_err=rerr,
             t_err=terr, rms=float(res_b.rms),
             ok=bool(rerr < 5e-3 and terr < 0.5) and tok, timing_ok=tok,
             timing="device_chained_loop")
    except Exception:
        emit("band_nn_256k", error=traceback.format_exc()[-1500:])

    # ---- fusion tail on-chip: TSDF integrate + mesh, voxel fuse
    # (VERDICT r4 missing #2)
    try:
        from slr.pipeline.tsdf import (_active_cubes, _march_tets,
                                       extract_mesh, fuse_tsdf,
                                       make_volume, tsdf_integrate)
        from slr.pipeline.reconstruct import reconstruct_dense
        from slr.config import ReconstructConfig as _RC

        cloud_t = reconstruct_dense(quantize_frames(scan3.frames), cam,
                                    proj, cfg3, dec, _RC())
        jax.block_until_ready(cloud_t.points)
        p0 = np.asarray(cloud_t.points)[np.asarray(cloud_t.mask)]
        lo = p0.min(axis=0) - 10.0
        vol = make_volume(lo, size_vox=(128, 128, 128), voxel=2.5)
        R_id = jnp.eye(3, dtype=jnp.float32)
        t_id = jnp.zeros(3, jnp.float32)
        vol1 = jax.block_until_ready(
            tsdf_integrate(vol, cloud_t, cam, R_id, t_id))

        def tsdf_step(w):
            v2 = tsdf_integrate(vol._replace(weight=w), cloud_t, cam,
                                R_id, t_id)
            return v2.tsdf[0, 0, 0], v2.weight
        ms_t, tok = device_ms(tsdf_step, vol.weight, K_hi=17)
        vox_s = 128 ** 3 / (ms_t / 1e3)
        emit("tsdf_integrate_128", ms_per_scan=round(ms_t, 3),
             voxels_per_s=round(vox_s),
             ok=bool(float(jnp.sum(vol1.weight > 0)) > 1e4) and tok,
             timing_ok=tok, timing="device_chained_loop")

        # mesh extraction: device mask+tets vs host compaction split.
        # Warm both jits first — _march_tets compiles per active-cube
        # capacity and a cold call times the RELAY compile, not the work
        # (the first r5 run recorded 34 s of compile as "extraction")
        jax.block_until_ready(_active_cubes(vol1))
        extract_mesh(vol1)
        t0 = time.perf_counter()
        act = jax.block_until_ready(_active_cubes(vol1))
        t_dev_mask = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        verts, faces = extract_mesh(vol1)
        t_total = (time.perf_counter() - t0) * 1e3
        emit("tsdf_extract_mesh_128", total_ms=round(t_total, 2),
             active_mask_ms=round(t_dev_mask, 2),
             n_faces=int(faces.shape[0]),
             ok=bool(faces.shape[0] > 1000), timing="host_wall",
             note="device active-mask + tet pass; host compacts indices "
                  "(export-level per SURVEY build plan)")
    except Exception:
        emit("tsdf_128", error=traceback.format_exc()[-1500:])

    # ---- end-to-end config-4/5: 8 scans -> registered, BA-refined,
    # fused cloud (VERDICT r4 missing #3). Host wall on the chip: this
    # is the number a user experiences, host glue and relay included.
    try:
        from slr.pipeline.registerfuse import (ba_refine, fuse_scans,
                                               register_scans_batched)
        from slr.pipeline.reconstruct import reconstruct_dense
        from slr.config import (ReconstructConfig as _RC,
                                RegistrationConfig as _RG)
        from slr.synth import rocks_scene
        from slr.synth.render import move_rig

        # rocks_scene, not spheres_scene: at the far end of this orbit
        # the spheres leave the inter-scan overlap and the remaining
        # plane leaves tangential motion unconstrained for point-to-
        # plane alignment (measured: scans 6-7 slide 3.8 deg / 6 mm
        # while the fused surface stays at 0.066 mm RMS — a degenerate
        # SCENE, not a solver failure; rocks pin every direction)
        S_e2e = 8
        rng = np.random.default_rng(17)
        stacks, poses_m, truths = [], [], []
        for s in range(S_e2e):
            rv = jnp.asarray([0.0, 0.025 * s, 0.008 * s], jnp.float32)
            tv = jnp.asarray([7.0 * s, -3.0 * s, 0.0], jnp.float32)
            R_m, t_m = so3_exp(rv), tv
            cam_s, proj_s = move_rig(cam, proj, R_m, t_m)
            d_s = rocks_scene(cam_s, CAM_H, CAM_W)
            sc = render_scan(cam_s, proj_s, d_s, cfg3, noise_std=0.003,
                             key=jax.random.PRNGKey(40 + s))
            stacks.append(quantize_frames(sc.frames))
            poses_m.append((R_m, t_m))
            truths.append((sc.points_true, sc.mask_true))
        jax.block_until_ready(stacks[-1])
        rc = _RC()
        rg = _RG(icp_sample_points=4096)

        def full_pipeline():
            clouds = [reconstruct_dense(f, cam, proj, cfg3, dec, rc)
                      for f in stacks]
            reg = register_scans_batched(clouds, rg, use_features=True,
                                         cam=cam)
            reg = ba_refine(clouds, reg, n_landmarks=512, iters=8)
            pts, val, col, n_vox = fuse_scans(clouds, reg,
                                              _RG(voxel_size=2.0),
                                              capacity=1 << 20)
            return clouds, reg, pts, val, n_vox

        clouds, reg, pts_f, val_f, n_vox = full_pipeline()  # warm compile
        jax.block_until_ready(pts_f)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = full_pipeline()
            jax.block_until_ready(out[2])
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        ms_e2e = ts[len(ts) // 2]

        # accuracy: pose error vs rig motion + fused-surface RMS vs the
        # union of ground-truth clouds
        rot_errs, t_errs = [], []
        for s, (R_m, t_m) in enumerate(poses_m):
            rot_errs.append(float(np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(reg.R[s]).T @ np.asarray(R_m)) - 1)
                / 2, -1, 1)))))
            t_errs.append(float(jnp.linalg.norm(reg.t[s] - t_m)))
        gt = jnp.concatenate([t[0].reshape(-1, 3) for t in truths])
        gt_valid = jnp.concatenate([c.mask.reshape(-1) for c in clouds])
        sel = jnp.where(val_f)[0][:8192]
        _, d2f = nearest_neighbors(pts_f[sel], gt, gt_valid, tile=4096)
        rms_f = float(jnp.sqrt(jnp.mean(d2f)))
        emit("e2e_config4_8scans", total_ms=round(ms_e2e, 1),
             ms_per_scan=round(ms_e2e / S_e2e, 1),
             n_voxels=int(n_vox),
             max_rot_err_deg=round(max(rot_errs), 4),
             max_t_err_mm=round(max(t_errs), 4),
             fused_rms_mm=round(rms_f, 3),
             ok=bool(max(rot_errs) < 0.5 and max(t_errs) < 2.0
                     and rms_f < 2.5),
             timing="host_wall",
             note="8x 1280x1024 uint8 scans -> decode + coarse/fine "
                  "registration + pose graph + BA + voxel fuse; host "
                  "glue and relay dispatch included")
    except Exception:
        emit("e2e_config4_8scans", error=traceback.format_exc()[-1500:])

    emit("done")


if __name__ == "__main__":
    main()
