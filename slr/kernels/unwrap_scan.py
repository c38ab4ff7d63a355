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


def _tiled_kernel(phi_hbm, q_hbm, m_hbm, out_ref, s_phi, s_q, s_m, sems,
                  *, iters: int, tile_h: int, halo: int):
    """One row tile: DMA a halo'd block HBM->VMEM, run all sweeps in
    VMEM, write back the interior rows only."""
    i = pl.program_id(0)
    size = tile_h + 2 * halo
    # inputs are pre-padded by `halo` rows top+bottom, so the halo'd
    # block of tile i starts at row i*tile_h in padded coordinates
    cp = [
        pltpu.make_async_copy(src.at[pl.ds(i * tile_h, size)], dst,
                              sems.at[k])
        for k, (src, dst) in enumerate(
            ((phi_hbm, s_phi), (q_hbm, s_q), (m_hbm, s_m)))
    ]
    for c in cp:
        c.start()
    for c in cp:
        c.wait()

    mask = s_m[:] > 0.5

    def body(_, state):
        return propagation_step(state[0], state[1], mask, roll_fn=_tpu_roll)

    Phi, _ = jax.lax.fori_loop(
        0, iters, body, (s_phi[:], jnp.where(mask, s_q[:], 0.0))
    )
    out_ref[:] = Phi[halo:halo + tile_h]


@partial(jax.jit, static_argnames=("iters", "tile_h", "halo"))
def quality_unwrap_tiled(Phi, quality, mask, iters: int = 8,
                         tile_h: int = 128, halo: int | None = None):
    """Tiled-grid variant of quality_unwrap_pallas with in-kernel halos.

    The image is swept one row tile at a time; each tile DMAs
    ``tile_h + 2*halo`` rows into VMEM, runs all ``iters`` sweeps there,
    and writes back the interior. With halo >= iters the result is
    EXACTLY the unsharded repair (information travels one row per
    sweep), while VMEM holds only a tile — this is the path for maps too
    large for the whole-image VMEM kernel, and the single-chip analog of
    the shard_map halo-exchange pipeline (slr/dist/sharded.py).
    """
    if halo is None:
        halo = iters
    # Mosaic requires HBM->VMEM DMA slice lengths and in-register row
    # slices to be sublane-aligned (8 rows for f32): round the halo up —
    # extra halo rows only widen the exact-repair margin (halo >= iters).
    halo = int(round_up(max(halo, 1), 8))
    H, W = Phi.shape
    Wp = round_up(W, 128)
    Hp = round_up(H, tile_h)
    fmask = mask.astype(jnp.float32)
    pad = ((halo, Hp - H + halo), (0, Wp - W))
    phi_p = jnp.pad(Phi.astype(jnp.float32), pad)
    q_p = jnp.pad(quality.astype(jnp.float32), pad)
    m_p = jnp.pad(fmask, pad)
    size = tile_h + 2 * halo
    out = pl.pallas_call(
        partial(_tiled_kernel, iters=iters, tile_h=tile_h, halo=halo),
        grid=(Hp // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((size, Wp), jnp.float32),
            pltpu.VMEM((size, Wp), jnp.float32),
            pltpu.VMEM((size, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * iters * Hp * Wp,
            bytes_accessed=4 * Hp * Wp * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(phi_p, q_p, m_p)
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
