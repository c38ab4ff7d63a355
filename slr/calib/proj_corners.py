"""Projector corner coordinates from decoded structured light.

Closes the decode -> projector-calibration loop (SURVEY.md components
9-10, dependency "5-7,9"; VERDICT r1 missing #2): the pattern stack is
rendered ON the calibration board, decoded per camera pixel into
projector coords (x_p, y_p), and each detected chessboard corner is
mapped into the projector via a LOCAL HOMOGRAPHY fitted over the valid
decoded pixels around it (Moreno & Taubin's trick — robust to the masked
low-albedo pixels on the dark-square side of every corner, and to the
sub-pixel corner position falling between decoded samples).

All corners solve in one vmapped batch: per corner a weighted 9x9 DLT
normal matrix is assembled over a (2*patch+1)^2 window and its smallest
eigenvector is the homography.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("patch",))
def projector_corners_from_decode(x_p, y_p, mask, quality, corners,
                                  patch: int = 10):
    """Map sub-pixel image corners into projector coordinates.

    x_p, y_p: (H, W) decoded projector coords; mask (H, W) bool;
    quality (H, W) modulation; corners (N, 2) sub-pixel (x, y).
    Returns (proj_xy (N, 2), ok (N,) bool — enough valid support).
    """
    H, W = x_p.shape
    P = 2 * patch + 1
    off = jnp.arange(-patch, patch + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")

    def one(c):
        cx = jnp.clip(jnp.round(c[0]).astype(jnp.int32), patch, W - patch - 1)
        cy = jnp.clip(jnp.round(c[1]).astype(jnp.int32), patch, H - patch - 1)
        start = (cy - patch, cx - patch)
        xp = jax.lax.dynamic_slice(x_p, start, (P, P))
        yp = jax.lax.dynamic_slice(y_p, start, (P, P))
        m = jax.lax.dynamic_slice(mask.astype(jnp.float32), start, (P, P))
        q = jax.lax.dynamic_slice(quality, start, (P, P))
        # pixel coords relative to the (sub-pixel) corner, unit = patch
        du = (cx.astype(jnp.float32) + ox - c[0]) / patch
        dv = (cy.astype(jnp.float32) + oy - c[1]) / patch
        w = m * q * jnp.exp(-(du ** 2 + dv ** 2))
        wsum = jnp.sum(w) + 1e-12
        # normalize projector coords for conditioning
        xm = jnp.sum(w * xp) / wsum
        ym = jnp.sum(w * yp) / wsum
        s = jnp.sqrt(jnp.sum(w * ((xp - xm) ** 2 + (yp - ym) ** 2)) / wsum)
        s = jnp.maximum(s, 1e-3)
        dxp = (xp - xm) / s
        dyp = (yp - ym) / s

        du_f, dv_f = du.reshape(-1), dv.reshape(-1)
        dx_f, dy_f = dxp.reshape(-1), dyp.reshape(-1)
        w_f = w.reshape(-1)
        one_ = jnp.ones_like(du_f)
        zero = jnp.zeros_like(du_f)
        # DLT rows: [u v 1 0 0 0 -x'u -x'v -x'] and the y' counterpart
        a1 = jnp.stack([du_f, dv_f, one_, zero, zero, zero,
                        -dx_f * du_f, -dx_f * dv_f, -dx_f], axis=-1)
        a2 = jnp.stack([zero, zero, zero, du_f, dv_f, one_,
                        -dy_f * du_f, -dy_f * dv_f, -dy_f], axis=-1)
        M = (a1 * w_f[:, None]).T @ a1 + (a2 * w_f[:, None]).T @ a2
        _, vecs = jnp.linalg.eigh(M)
        h = vecs[:, 0]
        h8 = jnp.where(jnp.abs(h[8]) < 1e-12, 1e-12, h[8])
        # homography evaluated at the corner itself: du = dv = 0
        px = h[2] / h8 * s + xm
        py = h[5] / h8 * s + ym
        # support check: valid pixels on several sides of the corner
        nvalid = jnp.sum(m)
        ok = nvalid > 0.25 * P * P
        return jnp.stack([px, py]), ok

    return jax.vmap(one)(corners.astype(jnp.float32))
