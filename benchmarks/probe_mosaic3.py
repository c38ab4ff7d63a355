"""Mosaic probe round 3: dot precision modes, TN-form dots, and the
payload-embedded windowed pass."""

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


def timed_pass(run, x, n_chain=16):
    out = jax.block_until_ready(run(x))

    @jax.jit
    def chain(c):
        def body(i, carry):
            c_c, acc = carry
            o = run(c_c)
            return (c_c + o[(0,) * o.ndim] * 1e-30, acc + o[(0,) * o.ndim])
        _, acc = jax.lax.fori_loop(0, n_chain, body, (c, jnp.float32(0)))
        return acc

    jax.block_until_ready(chain(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(x))
    t1 = time.perf_counter()
    jax.block_until_ready(chain(x))
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1) * 1e3 / n_chain, out


# 1/2. f32 dot with explicit precision, timed at (1024,1280)@(1280,1024)
def probe_precision(prec_name, prec):
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

    a = jnp.full((1024, 1280), 1.0001, jnp.float32)
    b = jnp.full((1280, 1024), 1.0001, jnp.float32)

    @jax.jit
    def run(a):
        return simple(kern, jax.ShapeDtypeStruct((1024, 1024), jnp.float32),
                      a, b)

    ms, out = timed_pass(run, a)
    exact = 1280 * 1.0001 * 1.0001
    rel = abs(float(out[0, 0]) - exact) / exact
    print(f"  dot f32 {prec_name}: {ms:.3f} ms, rel err {rel:.2e}",
          flush=True)
    return out


# 3. TN-form dot: contract dim 0 of both operands.
def probe_tn_dot():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    a = jnp.ones((512, 128), jnp.float32)   # (u, k)
    b = jnp.ones((512, 32), jnp.float32)    # (u, n)
    out = simple(kern, jax.ShapeDtypeStruct((128, 32), jnp.float32), a, b)
    print("  tn dot [0,0]:", float(out[0, 0]), flush=True)
    return out


# 4. THE REAL KERNEL SHAPE: windowed pass, payload-embedded codes,
#    TN dot at DEFAULT precision, N channels.
def probe_final_pass(N=32, WIN=512, prec=None):
    import numpy as np
    R, U, K = 1024, 1280, 1024
    rt = 8
    prec = prec or jax.lax.Precision.DEFAULT

    def kern(loc_ref, pay_ref, out_ref):
        kt = pl.program_id(1)
        k0 = (kt * 128).astype(jnp.float32)

        def row(r, acc):
            loc = loc_ref[pl.ds(r, 1), :]
            start = jnp.sum((loc <= k0).astype(jnp.int32)) - 16
            start = jnp.clip((start // 128) * 128, 0, U - WIN)
            p = pay_ref[pl.ds(r, 1), pl.ds(start, WIN), :][0]  # (WIN, N)
            cl = p[:, 0:1]                                      # (WIN, 1)
            ch = p[:, 1:2]
            kio = jax.lax.broadcasted_iota(jnp.int32, (WIN, 128), 1)
            kv = k0 + kio.astype(jnp.float32)
            oh = ((cl <= kv) & (ch > kv)).astype(jnp.float32)   # (WIN, 128)
            acc_o = jax.lax.dot_general(
                oh, p, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            out_ref[pl.ds(r, 1), :, :] = acc_o[None]
            return acc
        jax.lax.fori_loop(0, rt, row, 0)

    code = jnp.cumsum(jnp.full((R, U), 0.8, jnp.float32), axis=1)
    payload = jnp.concatenate(
        [code[..., None], code[..., None] + 0.8,
         jnp.ones((R, U, N - 2), jnp.float32)], axis=-1)

    @jax.jit
    def run(c):
        pay = jnp.concatenate(
            [c[..., None], c[..., None] + 0.8,
             jnp.ones((R, U, N - 2), jnp.float32)], axis=-1)
        return pl.pallas_call(
            kern,
            grid=(R // rt, K // 128),
            in_specs=[
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U, N), lambda r, t: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rt, 128, N), lambda r, t: (r, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K, N), jnp.float32),
            interpret=use_interpret(),
        )(c, pay)

    ms, out = timed_pass(run, code)
    cnt = np.asarray(out[..., 2])
    print(f"  final pass N={N} win={WIN}: {ms:.3f} ms, interior cnt "
          f"min/max {cnt[:, 8:-8].min()}/{cnt[:, 8:-8].max()}", flush=True)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    report("dot_default", lambda: probe_precision(
        "DEFAULT", jax.lax.Precision.DEFAULT))
    report("dot_high", lambda: probe_precision(
        "HIGH", jax.lax.Precision.HIGH))
    report("tn_dot", probe_tn_dot)
    report("final_pass_N32", lambda: probe_final_pass(32))
    report("final_pass_N8", lambda: probe_final_pass(8))
    print("ALL PROBES DONE", flush=True)
