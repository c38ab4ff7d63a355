"""Mosaic probe round 4: the production crossing-pass shape — NN-form
dot at DEFAULT precision, full-width contraction, no TN transposes."""

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
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / n_chain, out


def probe_nn_pass(N=16, rt=8, ktile=128):
    import numpy as np
    R, U, K = 1024, 1280, 1024

    def kern(cl_ref, ch_ref, pay_ref, out_ref):
        kt = pl.program_id(1)
        k0 = kt * ktile

        def row(r, acc):
            cl = cl_ref[pl.ds(r, 1), :]                     # (1, U)
            ch = ch_ref[pl.ds(r, 1), :]
            p = pay_ref[pl.ds(r, 1), :, :][0]               # (U, N)
            kio = jax.lax.broadcasted_iota(jnp.int32, (ktile, U), 0)
            kv = (k0 + kio).astype(jnp.float32)
            oh = ((cl <= kv) & (ch > kv)).astype(jnp.float32)
            acc_o = jax.lax.dot_general(
                oh, p, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            out_ref[pl.ds(r, 1), :, :] = acc_o[None]
            return acc
        jax.lax.fori_loop(0, rt, row, 0)

    code = jnp.cumsum(jnp.full((R, U), 0.8, jnp.float32), axis=1)

    @jax.jit
    def run(c):
        pay = jnp.concatenate(
            [jnp.ones((R, U, 1), jnp.float32),
             jnp.broadcast_to(c[..., None], (R, U, N - 1))], axis=-1)
        return pl.pallas_call(
            kern,
            grid=(R // rt, K // ktile),
            in_specs=[
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U), lambda r, t: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, U, N), lambda r, t: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rt, ktile, N), lambda r, t: (r, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K, N), jnp.float32),
            interpret=use_interpret(),
        )(c, c + 0.8, pay)

    ms, out = timed_pass(run, code)
    cnt = np.asarray(out[..., 0])
    print(f"  nn pass N={N} rt={rt} ktile={ktile}: {ms:.3f} ms, "
          f"cnt {cnt[:, 8:-8].min()}/{cnt[:, 8:-8].max()}", flush=True)
    return out


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    report("nn_N16_rt8_kt128", lambda: probe_nn_pass(16, 8, 128))
    report("nn_N16_rt16_kt256", lambda: probe_nn_pass(16, 16, 256))
    report("nn_N16_rt32_kt512", lambda: probe_nn_pass(16, 32, 512))
    print("ALL PROBES DONE", flush=True)
