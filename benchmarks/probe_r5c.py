"""Round-5 probe C: merge with the fully-fused crossing kernel."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import slr  # noqa: F401
from slr.config import DecodeConfig, PatternConfig, ReconstructConfig
from slr.synth import spheres_scene, two_camera_rig
from slr.synth.render import render_scan, quantize_frames


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
    from slr.pipeline import reconstruct_two_camera

    for name, fa, fb in (
            ("f32", sa.frames, sb.frames),
            ("uint8", quantize_frames(sa.frames), quantize_frames(sb.frames))):
        try:
            cl_out = jax.block_until_ready(jax.jit(
                lambda a, b: reconstruct_two_camera(
                    a, b, c1, c2, cfg, rec=rec2, method="merge"))(fa, fb))
            n_pts = int(jnp.sum(cl_out.mask))

            def tc_step(f, fb=fb):
                o = reconstruct_two_camera(f, fb, c1, c2, cfg,
                                           rec=rec2, method="merge")
                if jnp.issubdtype(f.dtype, jnp.integer):
                    f2 = f.at[0, 0, 0].set(
                        f[0, 0, 0] ^ (o.points[0, 0, 0] > -1e30).astype(f.dtype))
                else:
                    f2 = f.at[0, 0, 0].add(o.points[0, 0, 0] * 1e-30)
                return o.points[0, 0, 0], f2

            ms = device_ms(tc_step, fa, K_hi=17)
            print(f"merge fused-crossing [{name}]: {ms:.3f} ms/scan, "
                  f"{n_pts} pts", flush=True)
        except Exception:
            print(f"merge {name} FAILED:\n" + traceback.format_exc()[-1500:],
                  flush=True)

    # invert alone with fused kernel
    try:
        from slr.pipeline.twocam import invert_to_projector, _code_edge_mask
        from slr.codec import decode_stack

        r1 = jax.block_until_ready(jax.jit(
            lambda f: decode_stack(f, cfg, dec))(sa.frames))
        edge1 = _code_edge_mask(r1.x_p, r1.y_p, r1.mask, 3.0)
        m1 = r1.mask & edge1

        def inv_step(x):
            out = invert_to_projector(x, r1.y_p, m1, r1.quality,
                                      jnp.ones_like(x), 1024, 768)
            return out[1][0, 0], x.at[0, 0].add(out[1][0, 0] * 1e-30)

        ms_i = device_ms(inv_step, r1.x_p, K_hi=17)
        print(f"invert_to_projector fused: {ms_i:.3f} ms", flush=True)
    except Exception:
        print("invert FAILED:\n" + traceback.format_exc()[-1000:], flush=True)
    print("probe c done", flush=True)


if __name__ == "__main__":
    main()
