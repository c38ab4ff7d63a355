"""Mosaic probe round 2: bf16 dot forms, pl.load windowing, timings."""

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
        print(f"PROBE {name}: OK ({time.perf_counter() - t0:.1f}s)",
              flush=True)
        return out
    except Exception:
        print(f"PROBE {name}: FAIL\n{traceback.format_exc()[-1200:]}",
              flush=True)
        return None


def simple(kern, out_shape, *args):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(*args)


# 1. plain bf16 jnp.dot
def probe_bf16_dot():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)
    a = jnp.ones((128, 512), jnp.bfloat16)
    b = jnp.ones((512, 128), jnp.bfloat16)
    return simple(kern, jax.ShapeDtypeStruct((128, 128), jnp.float32), a, b)


# 2. bf16 dot where both operands are BUILT in-kernel (cast from f32)
def probe_bf16_cast_dot():
    def kern(a_ref, b_ref, o_ref):
        a = (a_ref[:] > 0.5).astype(jnp.bfloat16)
        b = b_ref[:].astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a = jnp.ones((128, 512), jnp.float32)
    b = jnp.ones((512, 128), jnp.float32)
    return simple(kern, jax.ShapeDtypeStruct((128, 128), jnp.float32), a, b)


# 3. pl.load with data-dependent pl.dslice start (sublane dim)
def probe_plload_window():
    def kern(x_ref, o_ref):
        start = jnp.sum((x_ref[0, :] < 100.0).astype(jnp.int32))
        start = jnp.clip((start // 128) * 128, 0, 1280 - 256)
        o_ref[:] = x_ref[pl.ds(start, 256), :]
    x = jnp.arange(1280 * 128, dtype=jnp.float32).reshape(1280, 128)
    return simple(kern, jax.ShapeDtypeStruct((256, 128), jnp.float32), x)


# 3b. pl.load with data-dependent start on the LANE dim
def probe_plload_lane():
    def kern(x_ref, o_ref):
        start = jnp.sum((x_ref[:, 0] < 100.0).astype(jnp.int32))
        start = jnp.clip((start // 128) * 128, 0, 1280 - 256)
        o_ref[:] = x_ref[:, pl.ds(start, 256)]
    x = jnp.arange(8 * 1280, dtype=jnp.float32).reshape(8, 1280)
    return simple(kern, jax.ShapeDtypeStruct((8, 256), jnp.float32), x)


# 4. dynamic ROW index into a ref inside fori (no window)
def probe_dyn_row():
    def kern(x_ref, o_ref):
        def body(r, acc):
            row = x_ref[pl.ds(r, 1), :]
            o_ref[pl.ds(r, 1), :] = row * 2.0
            return acc
        jax.lax.fori_loop(0, 8, body, 0)
    x = jnp.ones((8, 1280), jnp.float32)
    return simple(kern, jax.ShapeDtypeStruct((8, 1280), jnp.float32), x)


def timed_pass(run, x, n_chain=8):
    out = jax.block_until_ready(run(x))

    @jax.jit
    def chain(c):
        def body(i, carry):
            c_c, acc = carry
            o = run(c_c)
            return (c_c + o[0, 0, 0] * 1e-30, acc + o[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, n_chain, body, (c, jnp.float32(0)))
        return acc

    jax.block_until_ready(chain(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(x))
    t1 = time.perf_counter()
    jax.block_until_ready(chain(x))
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1) * 1e3 / n_chain, out


# 5. FULL-PASS TIMING, f32 dot, no window: 1024 rows x
#    dot((128k,1280)@(1280,8)) x 8 k-tiles — grid (128, 8), r_tile 8.
def probe_f32_pass(N=8):
    R, U, K = 1024, 1280, 1024
    rt = 8

    def kern(cl_ref, ch_ref, pay_ref, out_ref):
        kt = pl.program_id(1)

        def row(r, acc):
            cl = cl_ref[pl.ds(r, 1), :]
            ch = ch_ref[pl.ds(r, 1), :]
            p = pay_ref[pl.ds(r, 1), :, :][0]
            kio = jax.lax.broadcasted_iota(jnp.int32, (128, U), 0)
            kv = (kt * 128 + kio).astype(jnp.float32)
            oh = ((cl <= kv) & (ch > kv)).astype(jnp.float32)
            acc_o = jax.lax.dot_general(
                oh, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[pl.ds(r, 1), :, :] = acc_o[None]
            return acc
        jax.lax.fori_loop(0, rt, row, 0)

    code = jnp.cumsum(jnp.full((R, U), 0.8, jnp.float32), axis=1)
    pay = jnp.ones((R, U, N), jnp.float32)

    @jax.jit
    def run(c):
        return pl.pallas_call(
            kern,
            grid=(R // rt, K // 128),
            in_specs=[
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U, N), lambda r, t: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rt, 128, N), lambda r, t: (r, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K, N), jnp.float32),
            interpret=use_interpret(),
        )(c, c + 0.8, pay)

    ms, out = timed_pass(run, code)
    print(f"  f32 full pass N={N}: {ms:.3f} ms", flush=True)
    return out


# 6. same with pl.load WINDOW (if probe 3 passes) — f32, win=512
def probe_f32_windowed_pass(N=8):
    R, U, K = 1024, 1280, 1024
    rt, WIN = 8, 512

    def kern(loc_ref, cl_ref, ch_ref, pay_ref, out_ref):
        kt = pl.program_id(1)
        k0 = (kt * 128).astype(jnp.float32)

        def row(r, acc):
            loc = loc_ref[pl.ds(r, 1), :]
            start = jnp.sum((loc <= k0).astype(jnp.int32)) - 16
            start = jnp.clip((start // 128) * 128, 0, U - WIN)
            cl = cl_ref[pl.ds(r, 1), pl.ds(start, WIN)]
            ch = ch_ref[pl.ds(r, 1), pl.ds(start, WIN)]
            p = pay_ref[pl.ds(r, 1), pl.ds(start, WIN), :][0]
            kio = jax.lax.broadcasted_iota(jnp.int32, (128, WIN), 0)
            kv = k0 + kio.astype(jnp.float32)
            oh = ((cl <= kv) & (ch > kv)).astype(jnp.float32)
            acc_o = jax.lax.dot_general(
                oh, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[pl.ds(r, 1), :, :] = acc_o[None]
            return acc
        jax.lax.fori_loop(0, rt, row, 0)

    code = jnp.cumsum(jnp.full((R, U), 0.8, jnp.float32), axis=1)
    pay = jnp.ones((R, U, N), jnp.float32)

    @jax.jit
    def run(c):
        return pl.pallas_call(
            kern,
            grid=(R // rt, K // 128),
            in_specs=[
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U, N), lambda r, t: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rt, 128, N), lambda r, t: (r, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K, N), jnp.float32),
            interpret=use_interpret(),
        )(c, c, c + 0.8, pay)

    ms, out = timed_pass(run, code)
    print(f"  f32 windowed pass N={N}: {ms:.3f} ms", flush=True)
    # sanity: gradient 0.8 -> every bin has exactly one crossing
    import numpy as np
    cnt = np.asarray(out[..., 0])
    print("  windowed cnt min/max over interior:",
          cnt[:, 8:-8].min(), cnt[:, 8:-8].max(), flush=True)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    report("bf16_dot", probe_bf16_dot)
    report("bf16_cast_dot", probe_bf16_cast_dot)
    report("plload_window_sublane", probe_plload_window)
    report("plload_window_lane", probe_plload_lane)
    report("dyn_row_ref", probe_dyn_row)
    report("f32_pass_N8", lambda: probe_f32_pass(8))
    report("f32_windowed_pass_N8", lambda: probe_f32_windowed_pass(8))
    print("ALL PROBES DONE", flush=True)
