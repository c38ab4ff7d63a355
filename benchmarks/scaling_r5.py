"""Round-5 scaling evidence (VERDICT r4 next #4 + weak #2).

Same method as scaling_r4.py (measured on-chip compute + exact collective
byte/launch accounting + projection over ICI/DCN; CPU-mesh proxy for
structural validation) with the r5 halo-FUSED pixel-tile unwrap: a halo
of width h carries h propagation sweeps per exchange and the three
arrays (phase, quality, mask) ride ONE ppermute payload
(slr/dist/sharded.py::_halo_unwrap), so an 8-iteration unwrap issues
2 exchanges x 2 directions = 4 collectives instead of 48. Byte volume
is unchanged (h rows x iters/h exchanges); the price is redundant
border-row compute, accounted below as (rows_local + 2h)/rows_local.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 \
         python benchmarks/scaling_r5.py
Appends JSON lines to benchmarks/scaling_r5.jsonl.
"""

import json
import math
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "scaling_r5.jsonl")


def emit(case, **rec):
    rec = {"case": case, **rec}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def matrix_rows():
    for name in ("tpu_matrix_r5.jsonl", "tpu_matrix_r4.jsonl"):
        p = os.path.join(os.path.dirname(__file__), name)
        if os.path.exists(p):
            rows = {}
            with open(p) as f:
                for line in f:
                    r = json.loads(line)
                    rows[r.get("case")] = r
            if rows:
                return name, rows
    return None, {}


def projections():
    from slr.observability import (
        ICI_GBPS, DCN_GBPS, comm_halo_bytes, comm_schur_bytes,
        scaling_projection,
    )

    src, rows = matrix_rows()
    emit("sources", matrix_artifact=src)

    # ---- pixel-tile scan + spatial unwrap, halo-FUSED (r5) ----
    scan = rows.get("fused_uint8_column") or rows.get("fused_f32_column")
    unwrap = rows.get("quality_unwrap_pallas")
    if scan and unwrap:
        t1 = scan["ms_per_scan"] + unwrap["ms"]
        iters, W, H, h = 8, 1280, 1024, 4
        exchanges = math.ceil(iters / h)
        n_coll = 2 * exchanges          # one packed payload, up + down
        n_coll_r4 = 2 * 3 * iters       # r4: 3 arrays x 2 dirs x iters
        vol = comm_halo_bytes(W, halo=h, n_arrays=3, iters=exchanges)
        for gbps, lat, net in ((ICI_GBPS, 1.0, "ici"),
                               (DCN_GBPS, 50.0, "dcn")):
            for n in (2, 4, 8):
                rows_local = H // n
                overlap = (rows_local + 2 * h) / rows_local
                pr = scaling_projection(t1 / n * overlap, vol, n_coll,
                                        gbps, latency_us=lat)
                emit("proj_pixel_tile_scan", n_devices=n, network=net,
                     t1_ms=t1, latency_us=lat, halo_fused=h,
                     collectives_per_scan=n_coll,
                     collectives_per_scan_r4=n_coll_r4,
                     redundant_compute_factor=round(overlap, 4), **pr)

    # ---- distributed Schur BA (unchanged mechanics, r5 numbers) ----
    ba = rows.get("schur_ba_S6_L4096_10iter")
    if ba:
        iters, S = 10, 6
        vol = comm_schur_bytes(S, iters=iters)
        for gbps, lat, net in ((ICI_GBPS, 1.0, "ici"),
                               (DCN_GBPS, 50.0, "dcn")):
            for n in (2, 4, 8):
                pr = scaling_projection(ba["ms"] / n, vol, 4 * iters,
                                        gbps, latency_us=lat)
                emit("proj_schur_ba", n_devices=n, network=net,
                     t1_ms=ba["ms"], latency_us=lat, **pr)

    # ---- DP scan batch: zero cross-device traffic ----
    if scan:
        for n in (2, 4, 8):
            emit("proj_dp_batch", n_devices=n, network="any",
                 t1_ms=scan["ms_per_scan"], comm_bytes_per_dev=0,
                 efficiency=1.0,
                 note="batch axis sharded, no collectives in the graph")


def cpu_mesh_proxy():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        emit("cpu_mesh_proxy", skipped=True,
             reason=f"need 8 cpu devices, have {len(jax.devices())} "
                    f"{jax.default_backend()}")
        return
    from slr.dist import make_mesh
    from slr.dist.sharded import sharded_unwrap
    from slr.codec import spatial_quality_unwrap

    H, W = 1024, 1280
    rng = np.random.default_rng(0)
    Phi = jnp.asarray(np.linspace(0, 60, W)[None, :]
                      + 0.1 * rng.normal(size=(H, W)), jnp.float32)
    q = jnp.ones((H, W), jnp.float32)
    mask = jnp.ones((H, W), bool)

    def timeit(fn, *a):
        jax.block_until_ready(fn(*a))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    t_single = timeit(jax.jit(
        lambda p: spatial_quality_unwrap(p, q, mask, iters=8)), Phi)
    for n in (2, 4, 8):
        mesh = make_mesh(pixel_tiles=n, map_blocks=1,
                         devices=jax.devices()[:n])
        for ee in (1, 4):
            t_n = timeit(jax.jit(
                lambda p, ee=ee, mesh=mesh: sharded_unwrap(
                    p, q, mask, mesh, iters=8, exchange_every=ee)), Phi)
            emit("cpu_mesh_proxy_unwrap", n_devices=n, exchange_every=ee,
                 t_single_ms=round(t_single, 2),
                 t_sharded_ms=round(t_n, 2),
                 note="2-core host oversubscribed; structural check only")


if __name__ == "__main__":
    open(OUT, "w").close()
    projections()
    cpu_mesh_proxy()
    emit("done")
