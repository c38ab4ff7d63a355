"""SO(3)/SE(3) Lie-group utilities, pure JAX.

Used by the stereo extrinsics solve, ICP Gauss-Newton updates and the
pose-graph / BA optimizer (SURVEY.md components 11, 15, 16). Poses are
represented as ``(R, t)`` with ``R: (...,3,3)``, ``t: (...,3)``; tangent
vectors are ``(...,6)`` ordered ``[rho (trans), phi (rot)]``.

All functions broadcast over leading batch dims so optimizers can ``vmap``
them; small-angle branches use Taylor series selected with ``jnp.where`` so
they are jit-safe and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _hat(w):
    """(...,3) -> (...,3,3) skew-symmetric cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi):
    """Rodrigues: (...,3) rotation vector -> (...,3,3) rotation matrix."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks near 0
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = _hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R):
    """(...,3,3) rotation matrix -> (...,3) rotation vector.

    atan2-based and differentiable at the identity (optimizers hit exactly
    log(I) whenever a residual is zero; an arccos formulation has an
    infinite derivative there and NaN-poisons jacfwd). The unselected
    branch of each `where` is NaN-free so reverse/forward-mode stays clean.
    NOTE: theta ~ pi needs the symmetric-part treatment; scan-to-scan
    relative poses stay far from it.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # w = vee(R - R^T), |w| = 2 sin(theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    w2 = jnp.sum(w * w, axis=-1)
    small = w2 < 1e-12
    w2_safe = jnp.where(small, 1.0, w2)
    nw = jnp.sqrt(w2_safe)                      # = 2 sin(theta), grad-safe
    theta = jnp.arctan2(nw, trace - 1.0)        # smooth away from theta=pi
    # log = theta/(2 sin theta) * w = (theta/nw) * w; Taylor near 0:
    # 1/2 + theta^2/12 with theta^2 ~ 3 - trace
    scale = jnp.where(small, 0.5 + (3.0 - trace) / 12.0, theta / nw)
    return scale[..., None] * w


def _so3_left_jacobian(phi):
    """Left Jacobian J of SO(3): (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    K = _hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * (K @ K)


def _so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = theta * 0.5
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))) / theta2,
    )
    K = _hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot[..., None, None] * (K @ K)


def se3_exp(xi):
    """(...,6) twist [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    J = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return R, t


def se3_log(R, t):
    """(R, t) -> (...,6) twist [rho, phi]."""
    phi = so3_log(R)
    Jinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype=dtype)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) @ (Rb,tb): apply b first, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, pts):
    """Transform points: (...,3,3),(...,3) applied to (...,N,3) or (...,3)."""
    if pts.ndim == R.ndim - 1:  # single point per batch element
        return jnp.einsum("...ij,...j->...i", R, pts) + t
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
