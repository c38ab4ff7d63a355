"""Elastic recovery for distributed BA (SURVEY.md section 7 "failure
detection / elastic recovery / fault injection").

Map blocks are independent — landmarks and observations shard freely —
so recovery from a lost host is: reload the surviving fragments from the
stage checkpoint, re-shard onto the remaining mesh, and resume pose-graph
iteration from the last checkpointed poses. This module provides the
re-shard + resume step; the fault-injection test
(tests/test_aux.py::test_ba_elastic_recovery) drops a block
mid-run and asserts convergence.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from slr.dist.ba import BAResult, distributed_bundle_adjust
from slr.io.checkpoint import load_ba_state, save_ba_state


def reshard_fragments(X, obs_s, obs_p, obs_w, keep_mask, n_blocks: int):
    """Drop lost landmarks (keep_mask False = lived on the dead host) and
    pad the survivors to a multiple of n_blocks (zero-weight padding rows
    contribute nothing to the Schur sums)."""
    keep = np.asarray(keep_mask)
    Xs = np.asarray(X)[keep]
    ss = np.asarray(obs_s)[keep]
    ps = np.asarray(obs_p)[keep]
    ws = np.asarray(obs_w)[keep]
    L = Xs.shape[0]
    pad = (-L) % n_blocks
    if pad:
        Xs = np.concatenate([Xs, np.zeros((pad, 3), Xs.dtype)])
        ss = np.concatenate([ss, np.zeros((pad,) + ss.shape[1:], ss.dtype)])
        ps = np.concatenate([ps, np.zeros((pad,) + ps.shape[1:], ps.dtype)])
        ws = np.concatenate([ws, np.zeros((pad,) + ws.shape[1:], ws.dtype)])
    return (jnp.asarray(Xs), jnp.asarray(ss), jnp.asarray(ps),
            jnp.asarray(ws))


def resume_ba(checkpoint_path, obs_s, obs_p, obs_w, X, keep_mask,
              mesh: Mesh, iters: int = 10, damping: float = 1e-6) -> BAResult:
    """Resume a BA run after losing the fragments marked False in
    keep_mask: reload poses from the checkpoint, re-shard the surviving
    structure over the (new, possibly smaller) mesh, continue iterating."""
    R, t, _, it0, cost0 = load_ba_state(checkpoint_path)
    n_blocks = mesh.shape["map_block"]
    Xs, ss, ps, ws = reshard_fragments(X, obs_s, obs_p, obs_w, keep_mask,
                                       n_blocks)
    return distributed_bundle_adjust(
        jnp.asarray(R), jnp.asarray(t), Xs, ss, ps, ws, mesh,
        iters=iters, damping=damping,
    )
