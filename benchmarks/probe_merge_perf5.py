"""Operand-layout hypothesis: the crossing kernel costs 1.9 ms with
device-constant inputs but 8.5 ms when its payload is produced in-graph.
Confirm (trivial in-graph producer) and race layout variants."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import slr  # noqa: F401
from slr.kernels.common import use_interpret
from slr.kernels.crossing import crossing_bin_sum


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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    code = np.cumsum(rng.uniform(0.5, 1.1, (R, U + 1)), 1).astype(
        np.float32)
    clz = jnp.asarray(code[:, :-1])
    chz = jnp.asarray(code[:, 1:])
    pay_c = jnp.asarray(rng.uniform(-1, 1, (R, U, N)).astype(np.float32)
                        ).astype(jnp.bfloat16)

    # A. constant payload (baseline — expect ~1.9 ms)
    def a(c):
        o = crossing_bin_sum(c, chz, pay_c, K)
        return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
    print(f"A constant payload: {device_ms(a, clz):.3f} ms", flush=True)

    # B. trivially-produced payload in-graph (tests the layout-copy
    # theory: same bytes, but the producer decides the layout)
    def b(c):
        pay = pay_c * jnp.bfloat16(1.0) + (c[0, 0] * 1e-30).astype(
            jnp.bfloat16)
        o = crossing_bin_sum(c, chz, pay, K)
        return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
    print(f"B in-graph payload (same shape): {device_ms(b, clz):.3f} ms",
          flush=True)

    # C. in-graph payload built from planar channels (the real shape of
    # the problem: interleave + feed)
    chans = jnp.asarray(rng.uniform(-1, 1, (N, R, U)).astype(np.float32))

    def c_(c):
        pay = jnp.stack([chans[i] + c * 0 for i in range(N)], axis=-1
                        ).astype(jnp.bfloat16)
        o = crossing_bin_sum(c, chz, pay, K)
        return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
    print(f"C in-graph interleaved build: {device_ms(c_, clz):.3f} ms",
          flush=True)

    # D. f32 payload in-graph (is it bf16-specific?)
    def d(c):
        pay = jnp.stack([chans[i] + c * 0 for i in range(N)], axis=-1)
        o = crossing_bin_sum(c, chz, pay, K)
        return o[0, 0, 0], c.at[0, 0].add(o[0, 0, 0] * 1e-30)
    print(f"D in-graph f32 payload: {device_ms(d, clz):.3f} ms",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
