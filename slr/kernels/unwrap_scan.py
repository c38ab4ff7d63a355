"""Quality-guided spatial unwrap as a Pallas VMEM-resident scan.

SURVEY.md component 8: the reference's sequential priority-queue flood
fill, reformulated as fixed-iteration label propagation ("vectorized
quality-guided unwrapping as a Pallas scan" [B:5]). The whole phase map
lives in VMEM scratch for all iterations — one HBM read and one write
total, vs. 2 round trips *per iteration* for the op-by-op jnp version.

A megapixel f32 map is ~5 MB; Phi + q + mask fit comfortably in 16 MB
VMEM. Larger maps fall back to the jnp path (slr.codec.unwrap) — or run
pixel-tile-sharded under shard_map with halo exchange (slr.dist).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slr.codec.unwrap import propagation_step, spatial_quality_unwrap
from slr.kernels.common import round_up, use_interpret

_VMEM_BUDGET = 12 * 1024 * 1024


def _tpu_roll(a, shift, axis):
    # pltpu.roll requires a non-negative shift
    return pltpu.roll(a, shift=shift % a.shape[axis], axis=axis)


def _kernel(phi_ref, q_ref, mask_ref, out_ref, *, iters: int):
    mask = mask_ref[:] > 0.5

    def body(_, state):
        return propagation_step(state[0], state[1], mask, roll_fn=_tpu_roll)

    Phi, _ = jax.lax.fori_loop(
        0, iters, body, (phi_ref[:], jnp.where(mask, q_ref[:], 0.0))
    )
    out_ref[:] = Phi


def _tiled_kernel(phi_m, phi_c, phi_p, q_m, q_c, q_p, m_m, m_c, m_p,
                  out_ref, *, iters: int, halo: int):
    """One row tile with halos assembled in-register from the previous /
    current / next blocks (all auto-pipelined by Pallas), all sweeps in
    VMEM, interior rows written back."""
    tile_h = out_ref.shape[0]

    def halo_block(prev, cur, nxt):
        return jnp.concatenate(
            [prev[tile_h - halo:], cur[:], nxt[:halo]], axis=0)

    phi = halo_block(phi_m, phi_c, phi_p)
    q = halo_block(q_m, q_c, q_p)
    mask = halo_block(m_m, m_c, m_p) > 0.5

    def body(_, state):
        return propagation_step(state[0], state[1], mask, roll_fn=_tpu_roll)

    Phi, _ = jax.lax.fori_loop(
        0, iters, body, (phi, jnp.where(mask, q, 0.0))
    )
    out_ref[:] = Phi[halo:halo + tile_h]


@partial(jax.jit, static_argnames=("iters", "tile_h", "halo"))
def quality_unwrap_tiled(Phi, quality, mask, iters: int = 8,
                         tile_h: int = 128, halo: int | None = None):
    """Tiled-grid variant of quality_unwrap_pallas with in-kernel halos.

    The image is swept one row tile at a time. Each grid step sees the
    previous, current and next row blocks of each input (the same array
    passed with three shifted index maps — Pallas double-buffers the
    block DMAs automatically, unlike a hand-rolled HBM->VMEM copy which
    serializes against the compute), assembles the halo'd block
    in-register, runs all ``iters`` sweeps in VMEM and writes back the
    interior. With halo >= iters the result is EXACTLY the unsharded
    repair (information travels one row per sweep), while VMEM holds
    only a tile — this is the path for maps too large for the
    whole-image VMEM kernel, and the single-chip analog of the shard_map
    halo-exchange pipeline (slr/dist/sharded.py).
    """
    if halo is None:
        halo = iters
    # Mosaic requires in-register row slices to be sublane-aligned
    # (8 rows for f32): round the halo up — extra halo rows only widen
    # the exact-repair margin (halo >= iters).
    halo = int(round_up(max(halo, 1), 8))
    assert halo <= tile_h, (halo, tile_h)
    H, W = Phi.shape
    Wp = round_up(W, 128)
    Hp = round_up(H, tile_h)
    fmask = mask.astype(jnp.float32)
    # one full tile of padding top+bottom: block i-1 / i+1 always exist
    pad = ((tile_h, Hp - H + tile_h), (0, Wp - W))
    phi_p = jnp.pad(Phi.astype(jnp.float32), pad)
    q_p = jnp.pad(quality.astype(jnp.float32), pad)
    m_p = jnp.pad(fmask, pad)

    def spec(off):
        return pl.BlockSpec((tile_h, Wp), lambda i, o=off: (i + o, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_tiled_kernel, iters=iters, halo=halo),
        grid=(Hp // tile_h,),
        in_specs=[spec(o) for a in range(3) for o in (0, 1, 2)],
        out_specs=pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=40 * iters * Hp * Wp,
            bytes_accessed=10 * Hp * Wp * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(phi_p, phi_p, phi_p, q_p, q_p, q_p, m_p, m_p, m_p)
    return out[:H, :W]


@partial(jax.jit, static_argnames=("iters",))
def quality_unwrap_pallas(Phi, quality, mask, iters: int = 8):
    """Drop-in Pallas version of slr.codec.spatial_quality_unwrap."""
    H, W = Phi.shape
    Hp, Wp = round_up(H, 8), round_up(W, 128)
    if 3 * Hp * Wp * 4 > _VMEM_BUDGET:
        # too big for whole-image VMEM residency: run the tiled-grid
        # halo variant (exact for halo == iters)
        return quality_unwrap_tiled(Phi, quality, mask, iters=iters)
    fmask = mask.astype(jnp.float32)
    if (Hp, Wp) != (H, W):
        Phi = jnp.pad(Phi, ((0, Hp - H), (0, Wp - W)))
        quality = jnp.pad(quality, ((0, Hp - H), (0, Wp - W)))
        fmask = jnp.pad(fmask, ((0, Hp - H), (0, Wp - W)))
    out = pl.pallas_call(
        partial(_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=40 * iters * Hp * Wp,
            bytes_accessed=4 * Hp * Wp * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(Phi.astype(jnp.float32), quality.astype(jnp.float32), fmask)
    return out[:H, :W]
