"""Race the payload-materialization strategies:
  e2: XLA builds (R, N, U) row-granular planar payload (5 KB runs)
  c:  NT-form kernel consuming (R, N, U) directly, planar (R, N, K) out
  e1: pallas prep kernel interleaving planar -> (R, U, N) in VMEM
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import slr  # noqa: F401
from slr.kernels.common import use_interpret


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


R, U, N, K = 1024, 1280, 16, 1024
KT, RT = 512, 8


def consume_kernel(x_ref, o_ref):
    o_ref[0, 0] = jnp.sum(x_ref[:].astype(jnp.float32))


def force(x):
    """Force x to materialize with custom-call layout constraints."""
    return pl.pallas_call(
        consume_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=use_interpret(),
    )(x)[0, 0]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    chans = jnp.asarray(rng.uniform(-1, 1, (N, R, U)).astype(np.float32))

    # e2: stack on axis 1 -> (R, N, U), materialized into a pallas call
    def e2(c):
        pay = jnp.stack([chans[i] + c * 0 for i in range(N)], axis=1
                        ).astype(jnp.bfloat16)          # (R, N, U)
        s = force(pay)
        return s, c.at[0, 0].add(s * 1e-30)
    x0 = jnp.zeros((R, U), jnp.float32)
    try:
        print(f"e2 (R,N,U) stack->pallas: {device_ms(e2, x0):.3f} ms",
              flush=True)
    except Exception as e:
        print("e2 FAIL:", str(e)[-200:], flush=True)

    # e2b: same but (R, U, N) — the known-slow element interleave
    def e2b(c):
        pay = jnp.stack([chans[i] + c * 0 for i in range(N)], axis=-1
                        ).astype(jnp.bfloat16)          # (R, U, N)
        s = force(pay)
        return s, c.at[0, 0].add(s * 1e-30)
    try:
        print(f"e2b (R,U,N) stack->pallas: {device_ms(e2b, x0):.3f} ms",
              flush=True)
    except Exception as e:
        print("e2b FAIL (expected: VMEM lane pad):", str(e)[-120:],
              flush=True)

    # c: NT kernel on (R, N, U) payload, planar (R, N, K) out
    code = np.cumsum(rng.uniform(0.5, 1.1, (R, U + 1)), 1).astype(
        np.float32)
    clz = jnp.asarray(code[:, :-1])
    chz = jnp.asarray(code[:, 1:])

    def nt_kernel(cl_ref, ch_ref, pay_ref, out_ref):
        kt = pl.program_id(1)
        k0 = (kt * KT).astype(jnp.float32)

        def row(r, acc):
            cl = cl_ref[pl.ds(r, 1), :]
            ch = ch_ref[pl.ds(r, 1), :]
            p = pay_ref[pl.ds(r, 1), :, :][0].astype(jnp.float32)  # (N,U)
            kio = jax.lax.broadcasted_iota(jnp.int32, (KT, U), 0)
            kv = k0 + kio.astype(jnp.float32)
            oh = ((cl <= kv) & (ch > kv)).astype(jnp.float32)
            acc_o = jax.lax.dot_general(
                p, oh, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)                # (N,KT)
            out_ref[pl.ds(r, 1), :, :] = acc_o[None]
            return acc
        jax.lax.fori_loop(0, RT, row, 0)

    @jax.jit
    def run_nt(c):
        pay = jnp.stack([chans[i] + c * 0 for i in range(N)], axis=1
                        ).astype(jnp.bfloat16)
        return pl.pallas_call(
            nt_kernel,
            grid=(R // RT, K // KT),
            in_specs=[
                pl.BlockSpec((RT, U), lambda r, k: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, U), lambda r, k: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, N, U), lambda r, k: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RT, N, KT), lambda r, k: (r, 0, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, N, K), jnp.float32),
            interpret=use_interpret(),
        )(c, chz, pay)

    try:
        out = jax.block_until_ready(run_nt(clz))
        # correctness: channel 0 of payload everywhere ~uniform; check
        # against the one-hot property cnt-like sums being finite
        print("  nt out[0,0,:4]:", np.asarray(out[0, 0, :4]), flush=True)

        def cstep(c):
            o = run_nt(c)
            return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
        print(f"c NT kernel full pipeline: {device_ms(cstep, clz):.3f} ms",
              flush=True)
    except Exception as e:
        print("c NT kernel FAIL:", str(e)[-400:], flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
