"""Round-5 probe D: where does invert's remaining glue go?"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import DecodeConfig, PatternConfig
from slr.synth import spheres_scene, two_camera_rig
from slr.synth.render import render_scan


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
    d = spheres_scene(c1, H, W)
    sa = render_scan(c1, prj, d, cfg, noise_std=0.003,
                     key=jax.random.PRNGKey(20), cast_shadows=True)

    from slr.codec import decode_stack
    from slr.kernels.crossing import crossing_interp_fused
    from slr.pipeline.twocam import _code_edge_mask

    r1 = jax.block_until_ready(jax.jit(
        lambda f: decode_stack(f, cfg, dec))(sa.frames))
    edge1 = _code_edge_mask(r1.x_p, r1.y_p, r1.mask, 3.0)
    m1 = r1.mask & edge1
    u_i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ch1 = jax.block_until_ready(
        jnp.stack([u_i, r1.y_p, r1.quality, jnp.ones_like(r1.x_p)]))

    # 1. pass-1 fused kernel alone (incl. its channel moveaxis)
    try:
        def p1_step(x):
            cnt1, v1 = crossing_interp_fused(
                x, m1, ch1, 1024, interp=(True, True, False, False),
                gates=((1, 2.5),), dmax=2.5)
            return v1[0][0, 0], x.at[0, 0].add(v1[0][0, 0] * 1e-30)

        ms1 = device_ms(p1_step, r1.x_p)
        print(f"pass1 fused standalone: {ms1:.3f} ms", flush=True)
    except Exception:
        print("p1 FAILED:\n" + traceback.format_exc()[-800:], flush=True)

    # 2. transpose bundle: the 5 pass-1 outputs flipped to column-major
    try:
        cnt1, v1 = jax.block_until_ready(jax.jit(
            lambda x: crossing_interp_fused(
                x, m1, ch1, 1024, interp=(True, True, False, False),
                gates=((1, 2.5),), dmax=2.5))(r1.x_p))

        def tr_step(c):
            outs = [a.T for a in (c, v1[0], v1[1], v1[2], v1[3])]
            s = outs[0][0, 0] + outs[1][0, 0]
            return s, c.at[0, 0].add(s * 1e-30)

        ms_t = device_ms(tr_step, cnt1)
        print(f"5x (1024,1024) transposes: {ms_t:.3f} ms", flush=True)

        def trb_step(c):
            stk = jnp.stack([c, v1[0], v1[1], v1[2], v1[3]])
            out = jnp.swapaxes(stk, 1, 2)
            s = out[0, 0, 0] + out[1, 0, 0]
            return s, c.at[0, 0].add(s * 1e-30)

        ms_tb = device_ms(trb_step, cnt1)
        print(f"stacked (5,R,K)->swap transpose: {ms_tb:.3f} ms", flush=True)
    except Exception:
        print("transpose FAILED:\n" + traceback.format_exc()[-800:], flush=True)

    # 3. edge mask + channel stack + gates prologue
    try:
        def pre_step(x):
            e = _code_edge_mask(x, r1.y_p, r1.mask, 3.0)
            ch = jnp.stack([u_i, r1.y_p, r1.quality, jnp.ones_like(x)])
            chr_ = jnp.moveaxis(ch, 0, 1)
            s = chr_[0, 0, 0] + e.astype(jnp.float32)[0, 0]
            return s, x.at[0, 0].add(s * 1e-30)

        ms_p = device_ms(pre_step, r1.x_p)
        print(f"edge+stack+moveaxis prologue: {ms_p:.3f} ms", flush=True)
    except Exception:
        print("pre FAILED:\n" + traceback.format_exc()[-800:], flush=True)
    print("probe d done", flush=True)


if __name__ == "__main__":
    main()
