"""Merge-path perf decomposition + crossing-kernel tile sweep on the
real chip (run after the excess-precision fix)."""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack
from slr.pipeline import reconstruct_two_camera
from slr.pipeline.twocam import _code_edge_mask, invert_to_projector
from slr.pipeline.reconstruct import _white_color
from slr.synth import render_scan, spheres_scene, two_camera_rig
from slr.geom.camera import pixel_to_ray


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


H2, W2 = 1024, 1280
cfg2 = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                     row_gray_bits=6, phase_steps=4, row_phase_steps=4)
c1, c2, prj = two_camera_rig(cam_w=W2, cam_h=H2, proj_w=1024, proj_h=768)
dec = DecodeConfig()


def main():
    print("devices:", jax.devices(), flush=True)
    fa = jnp.asarray(np.load("/tmp/frames_a.npy"))
    fb = jnp.asarray(np.load("/tmp/frames_b.npy"))

    # ---- full merge scan: accuracy + latency ----
    try:
        cl_ = jax.block_until_ready(jax.jit(
            lambda a, b: reconstruct_two_camera(a, b, c1, c2, cfg2))(fa, fb))
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
            o_ = reconstruct_two_camera(f, fb, c1, c2, cfg2)
            return o_.points[0, 0, 0], f.at[0, 0, 0].add(
                o_.points[0, 0, 0] * 1e-30)

        ms, ok = device_ms(tc_step, fa, K_hi=17)
        print(f"MERGE full: {ms:.3f} ms/scan, rms {rms:.4f} mm, "
              f"n {mask.sum()}, timing_ok={ok}", flush=True)
    except Exception:
        print("merge FAIL\n", traceback.format_exc()[-1200:], flush=True)

    # ---- stage decomposition ----
    try:
        def dec_step(f):
            r = decode_stack(f, cfg2, dec)
            return r.x_p[0, 0], f.at[0, 0, 0].add(r.x_p[0, 0] * 1e-30)
        ms, ok = device_ms(dec_step, fa, K_hi=17)
        print(f"decode_stack (pure JAX): {ms:.3f} ms, ok={ok}", flush=True)

        r1j = jax.jit(lambda f: decode_stack(f, cfg2, dec))(fa)
        edge1 = jax.jit(lambda: _code_edge_mask(r1j.x_p, r1j.y_p, r1j.mask,
                                                3.0))()
        w1 = _white_color(fa)

        def inv_step(xp):
            m = invert_to_projector(xp, r1j.y_p, r1j.mask & edge1,
                                    r1j.quality, w1, 1024, 768)
            return m[1][0, 0], xp.at[0, 0].add(m[1][0, 0] * 1e-30)
        ms, ok = device_ms(inv_step, r1j.x_p, K_hi=17)
        print(f"invert_to_projector (2 passes): {ms:.3f} ms, ok={ok}",
              flush=True)
    except Exception:
        print("stages FAIL\n", traceback.format_exc()[-1200:], flush=True)

    # ---- crossing tile sweep ----
    try:
        from slr.kernels.crossing import crossing_bin_sum
        R, U, N, K = 1024, 1280, 16, 1024
        rng = np.random.default_rng(0)
        code = np.cumsum(rng.uniform(0.5, 1.1, (R, U)), 1).astype(
            np.float32)
        cl = jnp.asarray(code[:, :-1])
        ch = jnp.asarray(code[:, 1:])
        pay = jnp.asarray(
            rng.uniform(-1, 1, (R, U - 1, N)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for (ut, kt, rt) in ((256, 128, 16), (256, 256, 16),
                             (256, 128, 32), (128, 128, 16),
                             (512, 128, 16), (1280, 128, 8),
                             (256, 512, 16)):
            try:
                def step(c, ut=ut, kt=kt, rt=rt):
                    o = crossing_bin_sum(c, ch, pay, K, utile=ut,
                                         ktile=kt, rt=rt)
                    return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
                ms, ok = device_ms(step, cl, K_hi=17)
                print(f"crossing ut={ut} kt={kt} rt={rt}: {ms:.3f} ms, "
                      f"ok={ok}", flush=True)
            except Exception:
                print(f"crossing ut={ut} kt={kt} rt={rt}: FAIL "
                      + traceback.format_exc()[-300:], flush=True)
    except Exception:
        print("sweep FAIL\n", traceback.format_exc()[-1200:], flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
