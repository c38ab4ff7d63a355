"""Pin down the crossing wrapper cost: force-materialized sub-piece
timings + an all-planar NT-dot kernel variant."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import slr  # noqa: F401
from slr.kernels.common import use_interpret
from slr.config import DecodeConfig, PatternConfig
from slr.codec import decode_stack
from slr.kernels.crossing import build_payload, _split3
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
    white = fa[0]
    channels = jnp.stack([u_i, r.y_p, r.quality, white])
    cl = r.x_p[:, :-1]
    ch = r.x_p[:, 1:]
    d = ch - cl
    pv = (r.mask[:, :-1] & r.mask[:, 1:] & (d > 0.125) & (d < 2.5))

    # A. payload build with FULL materialization (sum forces it)
    def bp(xp):
        pay, _ = build_payload(pv, xp[:, :-1],
                               channels[:, :, :-1], channels[:, :, 1:],
                               d, (True, True, False, False))
        s = jnp.sum(pay.astype(jnp.float32))
        return s, xp.at[0, 0].add(s * 1e-30)
    print(f"A build_payload (materialized): {device_ms(bp, r.x_p):.3f} ms",
          flush=True)

    # B. same channels but PLANAR (N, R, U) output — no interleave
    def bp_planar(xp):
        clq = xp[:, :-1]
        d_safe = jnp.where(pv, d, 1.0)
        terms = [pv.astype(jnp.float32)]
        for c in range(4):
            if c < 2:
                g = (channels[c, :, 1:] - channels[c, :, :-1]) / d_safe
                a = channels[c, :, :-1] - clq * g
                terms.extend(_split3(jnp.where(pv, a, 0.0)))
                terms.extend(_split3(jnp.where(pv, g, 0.0)))
            else:
                terms.append(jnp.where(pv, channels[c, :, :-1], 0.0))
        pay = jnp.stack(terms, axis=0).astype(jnp.bfloat16)  # (15, R, U)
        s = jnp.sum(pay.astype(jnp.float32))
        return s, xp.at[0, 0].add(s * 1e-30)
    print(f"B planar build (materialized): "
          f"{device_ms(bp_planar, r.x_p):.3f} ms", flush=True)

    # C. pure layout cost: planar (16,R,U) -> (R,U,16)
    pay16 = jax.jit(lambda: jnp.zeros((16, H, W), jnp.bfloat16)
                    .at[0, 0, 0].set(1))()

    def relayout(p):
        q = jnp.moveaxis(p, 0, -1)
        s = jnp.sum(q.astype(jnp.float32))
        return s, p.at[0, 0, 0].add((s * 1e-30).astype(p.dtype))
    print(f"C (16,R,U)->(R,U,16) moveaxis: "
          f"{device_ms(relayout, pay16):.3f} ms", flush=True)

    # D. NT-planar kernel: payload (N,R,U), out (N,R,K)
    N, K, UT, KT, RT = 16, 1024, 256, 512, 16
    Up = 1280
    rng = np.random.default_rng(0)
    code = np.cumsum(rng.uniform(0.5, 1.1, (H, Up)), 1).astype(np.float32)
    clz = jnp.asarray(code[:, :-1])
    clz = jnp.pad(clz, ((0, 0), (0, 1)), constant_values=-1.0)
    chz = jnp.asarray(code[:, 1:])
    chz = jnp.pad(chz, ((0, 0), (0, 1)), constant_values=-1.0)
    payp = jnp.asarray(rng.uniform(-1, 1, (N, H, Up)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    nbr = H // RT
    T = Up // UT

    def kern(act_ref, cl_ref, ch_ref, pay_ref, out_ref):
        kt = pl.program_id(1)
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        act = act_ref[pl.program_id(0), t, kt]

        @pl.when(act != 0)
        def _go():
            k0 = (kt * KT).astype(jnp.float32)

            def row(rr, acc):
                clr = cl_ref[pl.ds(rr, 1), :]
                chr_ = ch_ref[pl.ds(rr, 1), :]
                p = pay_ref[:, pl.ds(rr, 1), :][:, 0, :]   # (N, UT)
                kio = jax.lax.broadcasted_iota(jnp.int32, (KT, UT), 0)
                kv = k0 + kio.astype(jnp.float32)
                oh = ((clr <= kv) & (chr_ > kv)).astype(jnp.float32)
                acc_o = jax.lax.dot_general(
                    p.astype(jnp.float32), oh, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)   # (N, KT)
                out_ref[:, pl.ds(rr, 1), :] += acc_o[:, None, :]
                return acc
            jax.lax.fori_loop(0, RT, row, 0)

    firing = chz > clz
    cmin = jnp.where(firing, clz, 3e38).reshape(nbr, RT, T, UT).min((1, 3))
    cmax = jnp.where(firing, chz, -3e38).reshape(nbr, RT, T, UT).max((1, 3))
    klo = jnp.arange(K // KT, dtype=jnp.float32) * KT
    act = ((cmin[..., None] <= klo + (KT - 1))
           & (cmax[..., None] > klo)).astype(jnp.int32)

    @jax.jit
    def run(c):
        return pl.pallas_call(
            kern,
            grid=(nbr, K // KT, T),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((RT, UT), lambda r, k, t: (r, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, UT), lambda r, k, t: (r, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, RT, UT), lambda r, k, t: (0, r, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, RT, KT), lambda r, k, t: (0, r, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H, K), jnp.float32),
            interpret=use_interpret(),
        )(act, c, chz, payp)

    out = jax.block_until_ready(run(clz))
    cnt = np.asarray(out[0])

    def ks(c):
        o = run(c)
        return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
    print(f"D NT-planar kernel ut={UT} kt={KT} rt={RT}: "
          f"{device_ms(ks, clz, 17):.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
