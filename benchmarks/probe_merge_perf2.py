"""Where do invert_to_projector's 25 ms go? Time wrapper pieces."""

import time

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack
from slr.kernels.crossing import (build_payload, crossing_bin_sum,
                                  crossing_interp)
from slr.synth import two_camera_rig


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
    if med <= 0.02:
        med = measure(3 * K_hi - 2)
    return med


def main():
    print("devices:", jax.devices(), flush=True)
    cfg2 = PatternConfig(proj_width=1024, proj_height=768, gray_bits=7,
                         row_gray_bits=6, phase_steps=4, row_phase_steps=4)
    c1, c2, prj = two_camera_rig(cam_w=1280, cam_h=1024, proj_w=1024,
                                 proj_h=768)
    fa = jnp.asarray(np.load("/tmp/frames_a.npy"))
    r = jax.jit(lambda f: decode_stack(f, cfg2, DecodeConfig()))(fa)
    H, W = 1024, 1280
    v_i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u_i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    white = fa[0]
    channels = jnp.stack([u_i, r.y_p, r.quality, white])

    # 1. ONE crossing_interp pass (wrapper + kernel)
    def p1(xp):
        cnt, vals = crossing_interp(xp, r.mask, channels, 1024,
                                    interp=(True, True, False, False))
        return vals[0][0, 0], xp.at[0, 0].add(vals[0][0, 0] * 1e-30)
    print(f"crossing_interp 1 pass: {device_ms(p1, r.x_p, 17):.3f} ms",
          flush=True)

    # 2. build_payload alone (split + stack, no kernel)
    cl = r.x_p[:, :-1]
    ch = r.x_p[:, 1:]
    d = ch - cl
    pv = (r.mask[:, :-1] & r.mask[:, 1:] & (d > 0.125) & (d < 2.5))

    def bp(xp):
        pay, _ = build_payload(pv, xp[:, :-1],
                               channels[:, :, :-1], channels[:, :, 1:],
                               d, (True, True, False, False))
        s = pay[0, 0, 0].astype(jnp.float32)
        return s, xp.at[0, 0].add(s * 1e-30)
    print(f"build_payload alone: {device_ms(bp, r.x_p, 17):.3f} ms",
          flush=True)

    # 3. kernel with prebuilt inputs, best tile combos
    pay = jax.jit(lambda: build_payload(
        pv, cl, channels[:, :, :-1], channels[:, :, 1:], d,
        (True, True, False, False))[0])()
    clz = jnp.where(pv, cl, -1.0)
    chz = jnp.where(pv, ch, -1.0)
    for (ut, kt, rt) in ((256, 512, 16), (1280, 512, 8), (256, 1024, 16),
                         (512, 512, 16), (1280, 256, 8), (1280, 1024, 8)):
        try:
            def ks(c, ut=ut, kt=kt, rt=rt):
                o = crossing_bin_sum(c, chz, pay, 1024, utile=ut,
                                     ktile=kt, rt=rt)
                return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
            print(f"kernel ut={ut} kt={kt} rt={rt}: "
                  f"{device_ms(ks, clz, 17):.3f} ms", flush=True)
        except Exception as e:
            print(f"kernel ut={ut} kt={kt} rt={rt}: FAIL {str(e)[:200]}",
                  flush=True)

    from slr.pipeline import reconstruct_two_camera
    fb = jnp.asarray(np.load("/tmp/frames_b.npy"))

    def tc_step(f):
        o_ = reconstruct_two_camera(f, fb, c1, c2, cfg2)
        return o_.points[0, 0, 0], f.at[0, 0, 0].add(
            o_.points[0, 0, 0] * 1e-30)
    print(f"MERGE full: {device_ms(tc_step, fa, 17):.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
