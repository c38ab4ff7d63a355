"""Mosaic capability probes for the crossing-interp kernel design.

Each probe is independent (try/except): we learn which layout the
two-camera merge kernel can use on THIS toolchain before committing to a
design. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site nohup timeout 1200 \
      python benchmarks/probe_mosaic.py > /tmp/probe_mosaic.log 2>&1 &
"""

import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import slr  # noqa: F401
from slr.kernels.common import use_interpret


def report(name, fn):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        dt = time.perf_counter() - t0
        print(f"PROBE {name}: OK ({dt:.1f}s)", flush=True)
        return out
    except Exception:
        print(f"PROBE {name}: FAIL\n{traceback.format_exc()[-2000:]}",
              flush=True)
        return None


R, U, K, N = 8, 1280, 1024, 48


# 1. onehot (K_t, U) from sublane-iota compares, dot with (U, N) payload
#    block read from an (R, U, N) HBM array with N = 48 (narrow lane dim).
def probe_dot_narrow():
    def kern(code_lo_ref, code_hi_ref, pay_ref, out_ref):
        def row(r, _):
            cl = code_lo_ref[r][None, :]            # (1, U)
            ch = code_hi_ref[r][None, :]
            kio = jax.lax.broadcasted_iota(jnp.int32, (K, U), 0).astype(
                jnp.float32)
            oh = ((cl <= kio) & (ch > kio)).astype(jnp.bfloat16)
            p = pay_ref[r].astype(jnp.bfloat16)     # (U, N)
            out_ref[r] = jax.lax.dot_general(
                oh, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return _
        jax.lax.fori_loop(0, R, row, 0)

    code = jnp.cumsum(jnp.ones((R, U), jnp.float32) * 0.8, axis=1)
    pay = jnp.ones((R, U, N), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, K, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(code, code + 0.8, pay)
    return out


# 2. dynamic_slice on the sublane dim of a VMEM value, start computed
#    in-kernel from data.
def probe_dynslice():
    def kern(x_ref, out_ref):
        x = x_ref[:]                                 # (U, 128)
        start = jnp.sum((x[:, 0] < 100.0).astype(jnp.int32))
        start = jnp.clip((start // 8) * 8, 0, U - 256)
        out_ref[:] = jax.lax.dynamic_slice(x, (start, 0), (256, 128))

    x = jnp.arange(U * 128, dtype=jnp.float32).reshape(U, 128)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(x)


# 3. 2D transposes in-kernel.
def probe_transpose():
    def kern(x_ref, out_ref):
        out_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    x = jnp.arange(8 * 1280, dtype=jnp.float32).reshape(8, 1280)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1280, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(x)


# 4. f32 dot inside the kernel (what precision does Mosaic give / cost).
def probe_dot_f32():
    def kern(a_ref, b_ref, out_ref):
        out_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                             preferred_element_type=jnp.float32)

    a = jnp.full((256, 1280), 1.0001, jnp.float32)
    b = jnp.full((1280, 256), 1.0001, jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(a, b)
    exact = 1280 * 1.0001 * 1.0001
    print("  f32 dot rel err:", abs(float(out[0, 0]) - exact) / exact,
          flush=True)
    return out


# 5. grid + scratch accumulate + timing of the real-shape dot loop:
#    per grid step, 8 rows x dot((K,512-window)@(512,N)).
def probe_windowed_timing():
    W_WIN = 512

    def kern(code_lo_ref, code_hi_ref, pay_ref, out_ref):
        kt = pl.program_id(1)
        k0 = kt * 128

        def row(r, _):
            cl_full = code_lo_ref[r]                 # (U,)
            ch_full = code_hi_ref[r]
            below = (ch_full <= k0).astype(jnp.int32)
            start = jnp.sum(below) - 16
            start = jnp.clip((start // 8) * 8, 0, U - W_WIN)
            cl = jax.lax.dynamic_slice(cl_full[None, :], (0, start),
                                       (1, W_WIN))
            ch = jax.lax.dynamic_slice(ch_full[None, :], (0, start),
                                       (1, W_WIN))
            p = jax.lax.dynamic_slice(pay_ref[r], (start, 0), (W_WIN, N))
            kio = k0 + jax.lax.broadcasted_iota(jnp.int32, (128, W_WIN), 0)
            kio = kio.astype(jnp.float32)
            oh = ((cl <= kio) & (ch > kio)).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                oh, p.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[r] = acc
            return _
        jax.lax.fori_loop(0, R, row, 0)

    code = jnp.cumsum(jnp.full((1024, U), 0.8, jnp.float32), axis=1)
    pay = jnp.ones((1024, U, N), jnp.float32)

    @jax.jit
    def run(code, pay):
        return pl.pallas_call(
            kern,
            grid=(1024 // R, K // 128),
            in_specs=[
                pl.BlockSpec((R, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, U, N), lambda r, t: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128, N), lambda r, t: (r, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1024, K, N), jnp.float32),
            interpret=use_interpret(),
        )(code, code + 0.8, pay)

    out = jax.block_until_ready(run(code, pay))
    # device-side chained timing
    @jax.jit
    def chain(c):
        def body(i, carry):
            c_c, acc = carry
            o = run(c_c, pay)
            return (c_c + o[0, 0, 0] * 1e-30, acc + o[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, 16, body, (c, jnp.float32(0)))
        return acc
    jax.block_until_ready(chain(code))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(code))
    t1 = time.perf_counter()
    print(f"  windowed pass (1024 rows, K=1024, N=48): "
          f"{(t1 - t0) * 1e3 / 16:.3f} ms/pass", flush=True)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    report("dot_narrow_N48", probe_dot_narrow)
    report("dynslice_sublane", probe_dynslice)
    report("transpose_2d", probe_transpose)
    report("dot_f32", probe_dot_f32)
    report("windowed_timing", probe_windowed_timing)
    print("ALL PROBES DONE", flush=True)
