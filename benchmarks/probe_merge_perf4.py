"""Decisive wrapper-vs-kernel split: time crossing_interp with the real
kernel vs a dummy kernel, then the full merge at best tiles."""

import time

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
import slr.kernels.crossing as cr
from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack
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
    u_i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    channels = jnp.stack([u_i, r.y_p, r.quality, fa[0]])

    # 1. crossing_interp with the REAL kernel (new default tiles)
    def p1(xp):
        cnt, vals = cr.crossing_interp.__wrapped__(
            xp, r.mask, channels, 1024,
            interp=(True, True, False, False))
        return vals[0][0, 0] + cnt[0, 0], xp.at[0, 0].add(
            vals[0][0, 0] * 1e-30)
    print(f"interp+kernel (best tiles): {device_ms(p1, r.x_p, 17):.3f} ms",
          flush=True)

    # 2. same wrapper with a DUMMY kernel (isolates wrapper cost): the
    #    dummy consumes the same inputs so nothing gets DCE'd upstream
    real = cr.crossing_bin_sum

    def dummy(cl, ch, pay, num_bins, **kw):
        base = (jnp.sum(cl) + jnp.sum(ch)
                + jnp.sum(pay.astype(jnp.float32)))
        return jnp.full((cl.shape[0], num_bins, pay.shape[-1]),
                        1.0, jnp.float32) * (1.0 + base * 1e-30)

    cr.crossing_bin_sum = dummy
    try:
        def p2(xp):
            cnt, vals = cr.crossing_interp.__wrapped__(
                xp, r.mask, channels, 1024,
                interp=(True, True, False, False))
            return vals[0][0, 0] + cnt[0, 0], xp.at[0, 0].add(
                vals[0][0, 0] * 1e-30)
        print(f"interp+DUMMY kernel: {device_ms(p2, r.x_p, 17):.3f} ms",
              flush=True)
    finally:
        cr.crossing_bin_sum = real

    # 3. full merge at best tiles
    from slr.pipeline import reconstruct_two_camera
    fb = jnp.asarray(np.load("/tmp/frames_b.npy"))

    def tc_step(f):
        o_ = reconstruct_two_camera(f, fb, c1, c2, cfg2)
        return o_.points[0, 0, 0], f.at[0, 0, 0].add(
            o_.points[0, 0, 0] * 1e-30)
    print(f"MERGE full (best tiles): {device_ms(tc_step, fa, 17):.3f} ms",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
