"""Real-chip validation of the r4 kernels: crossing pass, full
two-camera merge scan, wavefront unwrap. Timings via chained in-jit
loops (relay round trips cancel)."""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401


def device_ms(step, x0, K_hi=33, n=5):
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
        return med, True
    med2 = measure(3 * K_hi - 2)
    if med2 > 1e-5 and (med2 > 0.02 or (med > 1e-5 and 1/3 < med2/med < 3)):
        return med2, True
    return max(med2, 1e-6), False


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- 1. crossing_bin_sum production shape ----
    try:
        from slr.kernels.crossing import (
            crossing_bin_sum, crossing_bin_sum_reference)
        R, U, N, K = 1024, 1280, 16, 1024
        rng = np.random.default_rng(0)
        code = np.cumsum(rng.uniform(0.5, 1.1, (R, U)), 1).astype(np.float32)
        cl = jnp.asarray(code[:, :-1])
        ch = jnp.asarray(code[:, 1:])
        pay = jnp.asarray(
            rng.uniform(-1, 1, (R, U - 1, N)).astype(np.float32)
        ).astype(jnp.bfloat16)

        out = jax.block_until_ready(jax.jit(
            lambda a, b, p: crossing_bin_sum(a, b, p, K))(cl, ch, pay))
        ref = jax.block_until_ready(jax.jit(
            lambda a, b, p: crossing_bin_sum_reference(a, b, p, K))(
            cl[:64], ch[:64], pay[:64]))
        err = float(jnp.abs(out[:64] - ref).max())

        def step(c):
            o = crossing_bin_sum(c, ch, pay, K)
            return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)

        ms, ok = device_ms(step, cl)
        print(f"crossing_bin_sum 1024x1280xN16->K1024: {ms:.3f} ms, "
              f"max err vs ref {err:.2e}, timing_ok={ok}", flush=True)
    except Exception:
        print("crossing FAIL\n", traceback.format_exc()[-1500:], flush=True)

    # ---- 2. full two-camera merge scan at 1280x1024 ----
    try:
        from slr.config import PatternConfig
        from slr.pipeline import reconstruct_two_camera
        from slr.synth import render_scan, spheres_scene, two_camera_rig
        from slr.geom.camera import pixel_to_ray

        H2, W2 = 1024, 1280
        cfg2 = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                             row_gray_bits=6, phase_steps=4,
                             row_phase_steps=4)
        c1, c2, prj = two_camera_rig(cam_w=W2, cam_h=H2, proj_w=1024,
                                     proj_h=768)
        scans = []
        for i, c in enumerate((c1, c2)):
            d2 = spheres_scene(c, H2, W2)
            scans.append(render_scan(c, prj, d2, cfg2, noise_std=0.003,
                                     key=jax.random.PRNGKey(20 + i),
                                     cast_shadows=True))
        sa, sb = scans
        cl_ = jax.block_until_ready(jax.jit(
            lambda a, b: reconstruct_two_camera(a, b, c1, c2, cfg2))(
            sa.frames, sb.frames))
        # accuracy vs projector-grid truth
        depth_p = spheres_scene(prj, cfg2.proj_height, cfg2.proj_width)
        v, u = jnp.meshgrid(
            jnp.arange(cfg2.proj_height, dtype=jnp.float32),
            jnp.arange(cfg2.proj_width, dtype=jnp.float32), indexing="ij")
        o, d = pixel_to_ray(prj, u, v)
        dz = jnp.einsum("j,...j->...", prj.R[2], d)
        pts_true = np.asarray(o + (depth_p / dz)[..., None] * d)
        mask = np.asarray(cl_.mask)
        err = np.linalg.norm(np.asarray(cl_.points) - pts_true,
                             axis=-1)[mask]
        rms = float(np.sqrt((err ** 2).mean()))

        def tc_step(f):
            o = reconstruct_two_camera(f, sb.frames, c1, c2, cfg2)
            return o.points[0, 0, 0], f.at[0, 0, 0].add(
                o.points[0, 0, 0] * 1e-30)

        ms, ok = device_ms(tc_step, sa.frames, K_hi=17)
        print(f"two_camera_merge 1280x1024: {ms:.3f} ms/scan, "
              f"rms {rms:.4f} mm, n {mask.sum()}, timing_ok={ok}",
              flush=True)
    except Exception:
        print("merge FAIL\n", traceback.format_exc()[-1500:], flush=True)

    # ---- 3. wavefront unwrap kernel ----
    try:
        from slr.kernels.wavefront import wavefront_repair_pallas
        from slr.codec import quality_guided_repair

        rng = np.random.default_rng(0)
        H, W = 1024, 1280
        Phi = (np.linspace(0, 60, W)[None, :]
               + 0.1 * rng.normal(size=(H, W)))
        bad = np.zeros((H, W), bool)
        bad[rng.integers(1, H - 1, 400), rng.integers(1, W - 1, 400)] = True
        q = jnp.asarray(np.where(bad, 0.05, 1.0).astype(np.float32))
        Phi_n = jnp.asarray(
            np.where(bad, Phi + 2 * np.pi * 3, Phi).astype(np.float32))
        mask = jnp.ones((H, W), bool)

        ref = jax.block_until_ready(jax.jit(
            lambda p: quality_guided_repair(p, q, mask,
                                            rounds_per_level=2))(Phi_n))
        # light (default) kernel config
        out = jax.block_until_ready(jax.jit(
            lambda p: wavefront_repair_pallas(p, q, mask))(Phi_n))
        err = float(jnp.abs(out - ref).max())

        def wf_step(p):
            o = wavefront_repair_pallas(p, q, mask)
            return o[0, 0], p.at[0, 0].add(o[0, 0] * 1e-30)

        ms, ok = device_ms(wf_step, Phi_n, K_hi=17)
        print(f"wavefront_repair_pallas light 1024x1280: {ms:.3f} ms, "
              f"max err vs heavy pure-jax {err:.2e}, timing_ok={ok}",
              flush=True)

        # heavy config (parity with the pure-JAX benched case)
        def wf_heavy(p):
            o = wavefront_repair_pallas(p, q, mask, levels=4,
                                        rounds_per_level=2)
            return o[0, 0], p.at[0, 0].add(o[0, 0] * 1e-30)
        out_h = jax.block_until_ready(jax.jit(
            lambda p: wavefront_repair_pallas(p, q, mask, levels=4,
                                              rounds_per_level=2))(Phi_n))
        err_h = float(jnp.abs(out_h - ref).max())
        ms_h, ok_h = device_ms(wf_heavy, Phi_n, K_hi=9)
        print(f"wavefront_repair_pallas heavy 1024x1280: {ms_h:.3f} ms, "
              f"max err {err_h:.2e}, timing_ok={ok_h}", flush=True)
    except Exception:
        print("wavefront FAIL\n", traceback.format_exc()[-1500:], flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
