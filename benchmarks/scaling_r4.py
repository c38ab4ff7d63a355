"""Scaling evidence for the multi-host contract (VERDICT r3 next #3).

A 1-chip rig cannot MEASURE multi-chip efficiency, so this artifact makes
the only honest argument available and makes every number auditable:

1. **Measured compute**: per-stage on-chip times from the committed TPU
   matrix (benchmarks/tpu_matrix_r4.jsonl; falls back to r3). Nothing
   here is simulated.
2. **Exact comm volume**: every collective in the engine moves a
   statically-known number of bytes per iteration
   (slr.observability.comm_*_bytes) — halo ppermutes move 2*halo*W rows
   x 3 arrays per unwrap sweep, the distributed Schur BA psums one
   (6S)^2+6S system per GN iteration, the DP scan batch moves nothing.
3. **Projection**: eff(N) = (T1/N) / (T1/N + comm_bytes/BW + n_coll*lat)
   over v5e ICI (intra-host) and a conservative DCN figure (cross-host).
4. **CPU-mesh proxy measurements**: strong-scaling wall times on the
   8-virtual-device CPU mesh and compute:comm wall split of the sharded
   stages — labeled cpu_mesh_proxy; they validate that the sharded
   graphs scale structurally (no hidden serialization), NOT silicon
   efficiency (an 8-way mesh oversubscribed onto 2 cores cannot show
   speedup).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 \
         python benchmarks/scaling_r4.py
Appends JSON lines to benchmarks/scaling_r4.jsonl.
"""

import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "scaling_r4.jsonl")


def emit(case, **rec):
    rec = {"case": case, **rec}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def matrix_rows():
    for name in ("tpu_matrix_r4.jsonl", "tpu_matrix_r3.jsonl"):
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

    # ---- pixel-tile scan + spatial unwrap (config 5 reconstruction) ----
    scan = rows.get("fused_uint8_column") or rows.get("fused_f32_column")
    unwrap = rows.get("quality_unwrap_pallas")
    if scan and unwrap:
        t1 = scan["ms_per_scan"] + unwrap["ms"]
        iters, W = 8, 1280
        vol = comm_halo_bytes(W, halo=1, n_arrays=3, iters=iters)
        # per-collective launch latency: ~1 us on ICI, ~50 us for a
        # cross-host DCN collective (conservative figures; both recorded
        # in the artifact rows)
        for gbps, lat, net in ((ICI_GBPS, 1.0, "ici"),
                               (DCN_GBPS, 50.0, "dcn")):
            for n in (2, 4, 8):
                pr = scaling_projection(t1 / n, vol, 2 * 3 * iters, gbps,
                                        latency_us=lat)
                emit("proj_pixel_tile_scan", n_devices=n, network=net,
                     t1_ms=t1, latency_us=lat, **pr)

    # ---- distributed Schur BA ----
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
        t_n = timeit(jax.jit(
            lambda p: sharded_unwrap(p, q, mask, mesh, iters=8)), Phi)
        emit("cpu_mesh_proxy_unwrap", n_devices=n,
             t_single_ms=round(t_single, 2), t_sharded_ms=round(t_n, 2),
             note="2-core host oversubscribed; structural check only")


if __name__ == "__main__":
    open(OUT, "w").close()
    projections()
    cpu_mesh_proxy()
    emit("done")
