"""Quality-guided wavefront unwrap as a VMEM-resident Pallas scan.

VERDICT r3 next #2: the pure-JAX wavefront (slr.codec.unwrap.
quality_guided_unwrap) costs 75.6 ms on-chip at 1024x1280 — almost
exactly the HBM bill of 32 full-grid lax.associative_scans (each scan
step round-trips 4 monoid fields through HBM: ~22 steps x 4 fields x
5.2 MB x 2 x 32 passes ~ 60 GB at 820 GB/s). The math is cheap; the
memory system is the cost. This kernel runs the whole directional pass
— monoid construction, log-depth Hillis-Steele scan, wavefront update —
in VMEM: HBM traffic per pass drops to 6 maps read + 2 written.

The monoid is also compressed from 4 fields to 3: the original CHAIN
state (ps, pe, c) applies as  out = pe + 2pi*(round((x - ps)/2pi) + c),
and since round((v - ps)/2pi) + c = round((v - ps)/2pi + c) for integer
c, the pair (pe, c) collapses into pv = pe + 2pi*c:

    CHAIN(ps, pv)(x) = pv + 2pi*round((x - ps)/2pi)
    compose(x, y CHAIN) = (tag_x, ps_x if x CHAIN else ps_y,
                           pv_y + 2pi*round((pv_x - ps_y)/2pi))
    compose(x, y CONST/KILL) = y

(identical closure argument as slr/codec/unwrap.py:174; exact because
the absorbed c is an integer). Scan directions are realized by flips /
transposes OUTSIDE the kernel (XLA relayouts, ~60 us each) so one
lane-axis kernel serves all four directions.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slr.kernels.common import round_up, use_interpret

TWO_PI = 2.0 * math.pi


def _compose(tx, psx, pvx, ty, psy, pvy):
    """3-field wavefront monoid: 'x then y' (y downstream)."""
    y_chain = ty == 1.0
    pv_c = pvy + TWO_PI * jnp.round((pvx - psy) / TWO_PI)
    tag = jnp.where(y_chain, tx, ty)
    ps = jnp.where(y_chain & (tx == 1.0), psx, psy)
    pv = jnp.where(y_chain, jnp.where(tx == 0.0, pvy, pv_c), pvy)
    return tag, ps, pv


def _scan_kernel(phi_ref, elig_ref, Phi_ref, done_ref, Phi_out, done_out,
                 *, width: int):
    """One directional growth pass, scan along lanes (left-to-right)."""
    phi = phi_ref[:]
    elig = elig_ref[:] > 0.5
    Phi = Phi_ref[:]
    done = done_ref[:] > 0.5

    tag = jnp.where(done, 2.0, jnp.where(elig, 1.0, 0.0))
    ps = phi
    pv = jnp.where(done, Phi, phi)

    lanes = jax.lax.broadcasted_iota(jnp.int32, phi.shape, 1)
    s = 1
    while s < width:
        t2 = pltpu.roll(tag, s, 1)
        p2 = pltpu.roll(ps, s, 1)
        v2 = pltpu.roll(pv, s, 1)
        tc, pc, vc = _compose(t2, p2, v2, tag, ps, pv)
        keep = lanes < s          # no upstream at distance s: identity
        tag = jnp.where(keep, tag, tc)
        ps = jnp.where(keep, ps, pc)
        pv = jnp.where(keep, pv, vc)
        s <<= 1

    reached = elig & (~done) & (tag == 2.0)
    Phi_out[:] = jnp.where(reached, pv, Phi)
    done_out[:] = (done | reached).astype(jnp.float32)


@partial(jax.jit, static_argnames=("tile_h",))
def _pass_rows(phi, elig, Phi, done, tile_h: int = 256):
    H, W = phi.shape
    Hp, Wp = round_up(H, tile_h), round_up(W, 128)
    args = []
    for a in (phi, elig, Phi, done):
        if (Hp, Wp) != (H, W):
            a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)))
        args.append(a)
    Phi_o, done_o = pl.pallas_call(
        partial(_scan_kernel, width=Wp),
        grid=(Hp // tile_h,),
        in_specs=[pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=40 * int(math.log2(Wp)) * Hp * Wp,
            bytes_accessed=6 * Hp * Wp * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(*args)
    return Phi_o[:H, :W], done_o[:H, :W]


def _directional(phi, elig, Phi, done, axis: int, reverse: bool):
    ops = (phi, elig, Phi, done)
    if axis == 0:
        ops = tuple(a.T for a in ops)
    if reverse:
        ops = tuple(a[:, ::-1] for a in ops)
    Phi_o, done_o = _pass_rows(*ops)
    if reverse:
        Phi_o, done_o = Phi_o[:, ::-1], done_o[:, ::-1]
    if axis == 0:
        Phi_o, done_o = Phi_o.T, done_o.T
    return Phi_o, done_o


@partial(jax.jit, static_argnames=("levels", "rounds_per_level"))
def wavefront_unwrap_pallas(phi, quality, mask, Phi_init=None, trust=None,
                            levels: int = 4, rounds_per_level: int = 2):
    """Drop-in kernel version of slr.codec.unwrap.quality_guided_unwrap
    (phase-only and repair modes; same seed/threshold semantics)."""
    phi = phi.astype(jnp.float32)
    q = jnp.where(mask, quality, 0.0).astype(jnp.float32)
    if Phi_init is None:
        flat = jnp.argmax(jnp.where(mask, q, -1.0))
        done = jnp.zeros(phi.shape, bool).reshape(-1).at[flat].set(True)
        done = done.reshape(phi.shape) & mask
        Phi = phi
    else:
        assert trust is not None, "repair mode needs a trust mask"
        done = trust & mask
        Phi = Phi_init.astype(jnp.float32)

    qs = jnp.nanquantile(
        jnp.where(mask, q, jnp.nan),
        jnp.linspace(1.0 - 1.0 / levels, 0.0, levels),
    )
    done = done.astype(jnp.float32)
    # the level loop is data-dependent only through the threshold value,
    # so it stays a python loop over STATIC structure (64 pallas calls
    # max) — each pass's eligible map is a fresh elementwise compare
    for li in range(levels):
        elig = (mask & (q >= qs[li])).astype(jnp.float32)
        for _ in range(rounds_per_level):
            for axis, rev in ((1, False), (1, True), (0, False), (0, True)):
                Phi, done = _directional(phi, elig, Phi, done, axis, rev)
    return Phi, done > 0.5


@partial(jax.jit, static_argnames=("trust_quantile", "levels",
                                   "rounds_per_level"))
def wavefront_repair_pallas(Phi, quality, mask, trust_quantile: float = 0.5,
                            levels: int = 2, rounds_per_level: int = 1):
    """Kernel version of quality_guided_repair. Repair-mode defaults are
    lighter than the phase-only mode (levels=2, rounds=1): trusted
    sources are dense, so order-error blobs are reached within one round
    at two thresholds — 8 directional passes instead of 32."""
    phi = jnp.mod(Phi, TWO_PI)
    qn = jnp.where(mask, quality, jnp.nan)
    thr = jnp.nanquantile(qn, trust_quantile)
    trust = mask & (quality >= thr)
    out, _ = wavefront_unwrap_pallas(
        phi, quality, mask, Phi_init=Phi, trust=trust,
        levels=levels, rounds_per_level=rounds_per_level,
    )
    return out
