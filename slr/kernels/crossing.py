"""Monotone-crossing interpolation: the MXU primitive behind the
two-camera "merge" correspondence (VERDICT r3 missing #1 / next #1).

Problem: along each row of a decoded map, the projector code x_p(u) is a
(noisy) monotone sequence; we need the *inverse* sampled on the integer
projector grid — for every integer code k, the sub-pixel position u*(k)
where the code crosses k, plus any other per-pixel quantity linearly
interpolated at that crossing. The reference-class solution walks each
epipolar line sequentially; the two TPU-hostile alternatives shipped in
r3 bottom out in scatter (0.59 s/scan) or ~70 full-frame gathers
(4.0 s/scan) because XLA executes random access near-serially on TPU.

TPU-first formulation: a crossing of bin k at pair (u, u+1) is the
indicator  onehot[k, u] = (code_lo[u] <= k) & (code_hi[u] > k),
and every "find + interpolate" becomes ONE matmul per row:

    out[n, k] = sum_u payload[n, u] * onehot[k, u]

with payload channels carrying the interpolation coefficients. Linear
interpolation at the crossing is EXACT through the matmul because the
crossing value of any channel q is affine in k:

    q*(k) = q[u] + (k - code_lo[u]) * g,  g = (q[u+1] - q[u]) / d
          = (q[u] - code_lo[u] * g) + k * g  =  a + k * b

so two payload channels (a, b) per interpolated channel reconstruct
q*(k) = (A[k] + k * B[k]) / cnt[k] after the contraction.

Numerics on this Mosaic toolchain (probed, benchmarks/probe_mosaic*.py):
bf16 dots are rejected outright ("Bad lhs type"); f32 dots at DEFAULT
precision run as ONE MXU pass with bf16-rounded operands and f32
accumulation. So payload channels are split into three f32-stored,
bf16-REPRESENTABLE terms (x = h1+h2+h3 exactly) — the in-MXU rounding
is then the identity and the contraction is f32-exact — while the
one-hot comparisons stay full-precision f32 on the VPU. The channel
dimension pads to an MXU tile anyway, so split channels are free.

Layout law (probe_merge_perf5/8): every array that crosses the pallas
boundary keeps the PAIR axis innermost — payload (R, N, U), output
(R, N, K). Materializing channel-innermost (R, U, N) tensors makes XLA
emit 2-byte-strided stores (16 ms for 42 MB vs 1.4 ms row-granular) and
pads VMEM lanes 16->128; the matching kernel contraction is the NT-form
dot (contract the lane axes of payload and one-hot), which Mosaic
lowers at full MXU speed (2.46 ms/pass pipeline vs 8.5 ms for the
NN-form + interleaved operand).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slr.kernels.common import round_up, use_interpret

# Tile defaults from the on-chip sweeps (r4 + r5): one grid step per
# row-block (grid-level k/u tiling re-fetched operand blocks per step
# and lost to DMA traffic — the r4 finding). The r5 rewrite moved the
# (u-subtile x k-subtile) skip decision INSIDE the kernel (static loops
# + pl.when over an SMEM activity table, zero refetch cost), but the
# production sweep ruled against engaging it: at merge shapes the
# active fraction is 0.2-0.5 and the branch + small-dot overhead eats
# the saving (pass 1: 0.716 ms at usub=640/ksub=512 vs 0.772 unpruned;
# every finer config SLOWER; pass 2 unpruned 0.606 ms beats all pruned
# configs — benchmarks/probe_r5.py, probe_r5b.py on the v5e). Defaults
# therefore run ONE full-width dot per row (usub >= row width, ksub >=
# num_bins, clamped so K never pads past num_bins); the subtile
# machinery stays available for unusual shapes via the kwargs.
_UTILE = 2560       # pairs per row-unit (>= row width = no u-tiling)
_RT = 8             # rows per grid block
_USUB = 2560        # pair sub-tile (>= width = no subtiling)
_KSUB = 1024        # bin sub-tile (clamped to round_up(num_bins, 128))


def _round_bf16(x):
    """Round f32 to the nearest bf16-representable value WITHOUT using
    the bf16 dtype: XLA:TPU's excess-precision rule elides lossy
    f32->bf16->f32 convert pairs inside a fused computation, which
    silently destroyed the split (the r4 debug story: CPU exact, TPU
    2.3 mm RMS with identical code). Integer bit math cannot be elided.
    Round-to-nearest-even on the dropped 16 mantissa bits; finite
    inputs only."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1)))
    r = r & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def _split3(x):
    """x (f32) as three bf16-representable f32 terms summing exactly."""
    h1 = _round_bf16(x)
    r1 = x - h1
    h2 = _round_bf16(r1)
    h3 = r1 - h2
    return h1, h2, h3


def build_payload(pair_valid, code_lo, channels_lo, channels_hi, d,
                  interp: tuple):
    """Pack the crossing payload: channel 0 = pair validity (the count),
    then per input channel either (a, b) x 3 split terms (linear
    interpolation) or one nearest-value term (low precision fine).

    Returns (payload (R, N, U) bf16 — channel axis SECOND, pair axis
    innermost, see module docstring — and unpack) where
    unpack(out_f32 (R, N, K), kgrid) -> (cnt, [vals...]).
    """
    pv = pair_valid.astype(jnp.float32)
    terms = [pv]
    layout = []
    d_safe = jnp.where(pair_valid, d, 1.0)
    for c in range(channels_lo.shape[0]):
        if interp[c]:
            g = (channels_hi[c] - channels_lo[c]) / d_safe
            a = channels_lo[c] - code_lo * g
            i0 = len(terms)
            terms.extend(_split3(jnp.where(pair_valid, a, 0.0)))
            terms.extend(_split3(jnp.where(pair_valid, g, 0.0)))
            layout.append(("interp", i0))
        else:
            i0 = len(terms)
            terms.append(jnp.where(pair_valid, channels_lo[c], 0.0))
            layout.append(("nearest", i0))
    payload = jnp.stack(terms, axis=1).astype(jnp.bfloat16)  # (R, N, U)
    N = round_up(payload.shape[1], 8)
    if payload.shape[1] != N:
        payload = jnp.pad(payload,
                          ((0, 0), (0, N - payload.shape[1]), (0, 0)))

    def unpack(out, kgrid):
        cnt = out[:, 0, :]
        safe = jnp.maximum(cnt, 1e-9)
        vals = []
        for kind, i0 in layout:
            if kind == "interp":
                A = out[:, i0, :] + out[:, i0 + 1, :] + out[:, i0 + 2, :]
                B = out[:, i0 + 3, :] + out[:, i0 + 4, :] + out[:, i0 + 5, :]
                vals.append((A + kgrid * B) / safe)
            else:
                vals.append(out[:, i0, :] / safe)
        return cnt, vals

    return payload, unpack


def _kernel(act_ref, cl_ref, ch_ref, pay_ref, out_ref, *, rt: int,
            utile: int, Kp: int, usub: int, ksub: int):
    t = pl.program_id(1)
    blk = pl.program_id(0)
    n_usub = utile // usub
    n_ksub = Kp // ksub

    @pl.when(t == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    for us in range(n_usub):
        for ks in range(n_ksub):
            @pl.when(act_ref[blk, t, us, ks] != 0)
            def _compute(us=us, ks=ks):
                k0 = jnp.float32(ks * ksub)
                ulo, uhi = us * usub, (us + 1) * usub
                klo, khi = ks * ksub, (ks + 1) * ksub

                def row(r, acc):
                    cl = cl_ref[pl.ds(r, 1), ulo:uhi]      # (1, usub)
                    ch = ch_ref[pl.ds(r, 1), ulo:uhi]
                    p = pay_ref[pl.ds(r, 1), :, ulo:uhi][0].astype(
                        jnp.float32)                       # (N, usub)
                    kio = jax.lax.broadcasted_iota(
                        jnp.int32, (ksub, usub), 0)
                    kv = k0 + kio.astype(jnp.float32)
                    oh = ((cl <= kv) & (ch > kv)).astype(jnp.float32)
                    acc_o = jax.lax.dot_general(
                        p, oh, (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)  # (N, ksub)
                    out_ref[pl.ds(r, 1), :, klo:khi] += acc_o[None]
                    return acc

                jax.lax.fori_loop(0, rt, row, 0)


@partial(jax.jit, static_argnames=("num_bins", "utile", "rt", "usub",
                                   "ksub", "ktile"))
def crossing_bin_sum(code_lo, code_hi, payload, num_bins: int,
                     utile: int = _UTILE, rt: int = _RT,
                     usub: int = _USUB, ksub: int = _KSUB,
                     ktile: int | None = None):
    """out[r, n, k] = sum_u [code_lo[r,u] <= k < code_hi[r,u]] payload[r,n,u]
    for integer bins k in [0, num_bins). Invalid pairs must arrive with
    code_lo == code_hi (never fire) and zero payload.

    code_lo/hi (R, U) f32; payload (R, N, U) bf16-storage (values are
    what the MXU sees — see module docstring). Output (R, N, num_bins)
    f32, exact for bf16-representable payloads. ``usub``/``ksub`` set
    the in-kernel activity-pruning granularity (see _UTILE note above).
    """
    if ktile is not None:      # r4-era kwarg: grid-level bin tiling is
        ksub = ktile           # gone; the in-kernel subtile subsumes it
    R, U = code_lo.shape
    N = payload.shape[1]
    assert payload.shape[0] == R and payload.shape[2] == U, (
        "payload must be (R, N, U) — channel axis SECOND, pair axis "
        f"innermost (got {payload.shape} for codes {code_lo.shape})")
    usub = min(usub, round_up(U, 128))
    utile = min(utile, round_up(U, usub))
    utile = round_up(utile, usub)
    ksub = min(ksub, round_up(num_bins, 128))
    Kp = round_up(num_bins, ksub)
    Up = round_up(U, utile)
    Rp = round_up(R, rt)
    if (Rp, Up) != (R, U):
        pr, pu = Rp - R, Up - U
        code_lo = jnp.pad(code_lo, ((0, pr), (0, pu)),
                          constant_values=-1.0)
        code_hi = jnp.pad(code_hi, ((0, pr), (0, pu)),
                          constant_values=-1.0)
        payload = jnp.pad(payload, ((0, pr), (0, 0), (0, pu)))
    T = Up // utile
    nbr = Rp // rt
    n_usub = utile // usub
    n_ksub = Kp // ksub

    # activity table (nbr, T, n_usub, n_ksub): a (row-block, u-subtile,
    # bin-subtile) combination is active iff any of its rows' [min cl,
    # max ch) ranges overlaps the subtile's bin range; invalid
    # zero-width pairs are masked out of the min/max. Subtiling happens
    # INSIDE the kernel (static loops + pl.when), so skipping costs no
    # block refetch — the whole payload block stays in VMEM.
    firing = code_hi > code_lo
    cmin = jnp.where(firing, code_lo, jnp.float32(3e38)).reshape(
        nbr, rt, T, n_usub, usub).min(axis=(1, 4))
    cmax = jnp.where(firing, code_hi, jnp.float32(-3e38)).reshape(
        nbr, rt, T, n_usub, usub).max(axis=(1, 4))
    klo = jnp.arange(n_ksub, dtype=jnp.float32) * ksub
    act = ((cmin[..., None] <= klo + (ksub - 1))
           & (cmax[..., None] > klo)).astype(jnp.int32)

    out = pl.pallas_call(
        partial(_kernel, rt=rt, utile=utile, Kp=Kp, usub=usub, ksub=ksub),
        grid=(nbr, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rt, utile), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, utile), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, N, utile),
                         lambda r, t: (r, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, N, Kp), lambda r, t: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, N, Kp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * Kp * Up * 32,
            bytes_accessed=(2 * 4 + N * 2) * Rp * Up + 4 * Rp * Kp * N,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(act, code_lo, code_hi, payload)
    return out[:R, :, :num_bins]


def _fused_kernel(code_ref, val_ref, ch_ref, cnt_ref, out_ref, pay_s,
                  cl_s, chz_s, *, rt: int, U: int, Kp: int, C: int,
                  interp: tuple, gates: tuple, dmin: float, dmax: float):
    """Build payload + one-hot contraction + crossing interpolation for
    one row-block, entirely in VMEM (see crossing_interp_fused).

    Two phases: the payload terms are built VECTORIZED over all rt rows
    of the block into scratch (full sublane occupancy — the first cut
    built them inside the per-row loop and each (1, U) op used 1 of 8
    sublanes, doubling the pass: 1.50 vs 0.77 ms, probe_r5d); the
    per-row one-hot dot + interpolation then reads scratch."""
    NP = U - 1

    # --- phase 1: block-wide payload build into scratch ---
    crow = code_ref[:, :]                                  # (rt, U)
    v = val_ref[:, :]
    cl = crow[:, :NP]
    chh = crow[:, 1:]
    d = chh - cl
    pv = ((v[:, :NP] > 0.5) & (v[:, 1:] > 0.5)
          & (d > dmin) & (d < dmax))
    for c, thr in gates:
        q = ch_ref[:, c, :]
        pv = pv & (jnp.abs(q[:, 1:] - q[:, :NP]) < thr)
    d_safe = jnp.where(pv, d, 1.0)
    pay_s[:, 0, :] = pv.astype(jnp.float32)
    idx = 1
    layout = []
    for c in range(C):
        q = ch_ref[:, c, :]
        lo = q[:, :NP]
        hi = q[:, 1:]
        if interp[c]:
            g = (hi - lo) / d_safe
            a = lo - cl * g
            h1, h2, h3 = _split3(jnp.where(pv, a, 0.0))
            pay_s[:, idx, :] = h1
            pay_s[:, idx + 1, :] = h2
            pay_s[:, idx + 2, :] = h3
            g1, g2, g3 = _split3(jnp.where(pv, g, 0.0))
            pay_s[:, idx + 3, :] = g1
            pay_s[:, idx + 4, :] = g2
            pay_s[:, idx + 5, :] = g3
            layout.append(("interp", idx))
            idx += 6
        else:
            pay_s[:, idx, :] = jnp.where(pv, lo, 0.0)
            layout.append(("nearest", idx))
            idx += 1
    cl_s[:, :] = jnp.where(pv, cl, -1.0)
    chz_s[:, :] = jnp.where(pv, chh, -1.0)

    # --- phase 2: per-row one-hot dot + interpolation ---
    def row(r, acc):
        p = pay_s[pl.ds(r, 1), :, :][0]                    # (N, NP)
        clz = cl_s[pl.ds(r, 1), :]
        chz = chz_s[pl.ds(r, 1), :]
        kio = jax.lax.broadcasted_iota(jnp.int32, (Kp, NP), 0)
        kv = kio.astype(jnp.float32)
        oh = ((clz <= kv) & (chz > kv)).astype(jnp.float32)
        sums = jax.lax.dot_general(
            p, oh, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)            # (N, Kp)
        cnt = sums[0:1, :]
        safe = jnp.maximum(cnt, 1e-9)
        kg = jax.lax.broadcasted_iota(
            jnp.int32, (1, Kp), 1).astype(jnp.float32)
        cnt_ref[pl.ds(r, 1), :] = cnt
        for c, (kind, i0) in enumerate(layout):
            if kind == "interp":
                A = sums[i0:i0 + 1] + sums[i0 + 1:i0 + 2] \
                    + sums[i0 + 2:i0 + 3]
                B = sums[i0 + 3:i0 + 4] + sums[i0 + 4:i0 + 5] \
                    + sums[i0 + 5:i0 + 6]
                out_ref[pl.ds(r, 1), c, :] = (A + kg * B) / safe
            else:
                out_ref[pl.ds(r, 1), c, :] = sums[i0:i0 + 1] / safe
        return acc

    jax.lax.fori_loop(0, rt, row, 0)


@partial(jax.jit, static_argnames=("num_bins", "interp", "gates", "dmin",
                                   "dmax", "rt"))
def crossing_interp_fused(code, valid, channels, num_bins: int,
                          interp: tuple, gates: tuple = (),
                          dmin: float = 0.125, dmax: float = 4.0,
                          rt: int = _RT):
    """crossing_interp with payload build, one-hot MXU contraction AND
    crossing interpolation fused into ONE kernel (VERDICT r4 next #2's
    named lever): the (R, N, U) payload and the raw (R, N, K) bin sums
    never exist in HBM — per row the kernel builds the bf16-exact
    3-split payload in registers, does the one full-width dot, and
    emits the interpolated channel values directly. vs the unfused
    route this removes ~2 XLA passes and ~100 MB of HBM traffic per
    inversion (measured: invert_to_projector 3.8 ms -> see matrix row).

    ``gates``: static tuple of (channel_index, max_jump) continuity
    vetoes on CARRIED channels — the in-kernel equivalent of
    crossing_interp's ``pair_gate`` (a pair whose carried value jumps
    more than max_jump straddles a silhouette; interpolating across it
    would bridge two surfaces with phantom points).

    Requires the full row width in one block (cameras wider than
    ~2560 px should use crossing_interp's tiled route). Returns
    (cnt (R, num_bins), vals (C, R, num_bins)), exactly as
    crossing_interp.
    """
    code = code.astype(jnp.float32)
    R, U = code.shape
    C = channels.shape[0]
    for c, _ in gates:
        assert 0 <= c < C, (c, C)
    Rp = round_up(R, rt)
    # lane width: pairs = U-1; pad code/valid to Up+1 so the kernel's
    # (U-1)-wide pair math lands on a 128-multiple
    Up = round_up(U - 1, 128)
    pr, pu = Rp - R, Up + 1 - U
    if pr or pu:
        code = jnp.pad(code, ((0, pr), (0, pu)))
        valid = jnp.pad(valid, ((0, pr), (0, pu)))
        channels = jnp.pad(channels, ((0, 0), (0, pr), (0, pu)))
    valid = valid.astype(jnp.float32)
    chans_rcu = jnp.moveaxis(channels, 0, 1)     # (R, C, U) pair-innermost
    Kp = round_up(num_bins, 128)
    nbr = Rp // rt
    n_terms = 1 + sum(6 if i else 1 for i in interp)

    cnt, vals = pl.pallas_call(
        partial(_fused_kernel, rt=rt, U=Up + 1, Kp=Kp, C=C,
                interp=interp, gates=gates, dmin=dmin, dmax=dmax),
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((rt, Up + 1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, Up + 1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, C, Up + 1), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rt, n_terms, Up), jnp.float32),
            pltpu.VMEM((rt, Up), jnp.float32),
            pltpu.VMEM((rt, Up), jnp.float32),
        ],
        out_specs=(
            pl.BlockSpec((rt, Kp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, C, Kp), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, C, Kp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * Kp * Up * 32,
            bytes_accessed=(2 + C) * 4 * Rp * Up
            + (1 + C) * 4 * Rp * Kp,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(code, valid, chans_rcu)
    return (cnt[:R, :num_bins],
            jnp.moveaxis(vals, 1, 0)[:, :R, :num_bins])


def crossing_bin_sum_reference(code_lo, code_hi, payload, num_bins: int,
                               chunk: int = 128):
    """Pure-JAX oracle: same contraction, materialized one-hot, chunked
    over bins. For tests and CPU-sized problems."""
    R, U = code_lo.shape
    Kp = round_up(num_bins, chunk)
    payload = payload.astype(jnp.float32)

    def one_chunk(k0):
        k = k0 + jnp.arange(chunk, dtype=jnp.float32)
        oh = ((code_lo[:, None, :] <= k[None, :, None])
              & (code_hi[:, None, :] > k[None, :, None]))
        return jnp.einsum("rku,rnu->rnk", oh.astype(jnp.float32), payload)

    outs = jax.lax.map(one_chunk,
                       jnp.arange(0, Kp, chunk, dtype=jnp.float32))
    out = jnp.moveaxis(outs, 0, 2).reshape(R, payload.shape[1], Kp)
    return out[:, :, :num_bins]


@partial(jax.jit, static_argnames=("num_bins", "interp", "use_kernel"))
def crossing_interp(code, valid, channels, num_bins: int,
                    interp: tuple, dmin: float = 0.125, dmax: float = 4.0,
                    use_kernel: bool = True, pair_gate=None):
    """Invert a per-row monotone code sequence onto the integer bin grid.

    code (R, U) f32; valid (R, U) bool; channels (C, R, U) f32 values to
    carry to the crossings; interp: per-channel, linear interpolation at
    the crossing vs left-endpoint value. A pair (u, u+1) contributes only
    when both pixels are valid and the code step d is in (dmin, dmax):
    the lower gate keeps 1/d bounded (interpolation precision), the upper
    gate drops silhouette/occlusion jumps whose "crossings" interpolate
    across two different surfaces.

    ``pair_gate`` (R, U-1) bool optionally vetoes pairs beyond the code
    gates — e.g. continuity of a CARRIED channel. A pair can step
    smoothly in the binned code yet jump in a carried quantity (a
    shallow silhouette whose depth jump maps to < dmax code bins but
    many pixels of disparity); interpolating across it would bridge two
    surfaces with phantom points no downstream gate can see.

    Returns (cnt (R, K), vals (C, R, K)): crossings found per bin and
    the channel values linearly interpolated there (averaged if a noisy
    wiggle yields several crossings; 0 where cnt == 0).
    """
    code = code.astype(jnp.float32)
    cl = code[:, :-1]
    ch = code[:, 1:]
    d = ch - cl
    pv = (valid[:, :-1] & valid[:, 1:] & (d > dmin) & (d < dmax))
    if pair_gate is not None:
        pv = pv & pair_gate
    payload, unpack = build_payload(
        pv, cl, channels[:, :, :-1], channels[:, :, 1:], d, interp)
    cl = jnp.where(pv, cl, -1.0)
    ch = jnp.where(pv, ch, -1.0)
    if use_kernel:
        out = crossing_bin_sum(cl, ch, payload, num_bins)
    else:
        out = crossing_bin_sum_reference(cl, ch, payload, num_bins)
    kgrid = jnp.arange(num_bins, dtype=jnp.float32)[None, :]
    cnt, vals = unpack(out, kgrid)
    return cnt, jnp.stack(vals)
