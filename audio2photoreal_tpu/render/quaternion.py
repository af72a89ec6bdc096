"""Batched quaternion algebra, (x, y, z, w) convention.

JAX port of the static helpers in the reference's Quaternion class
(visualize/ca_body/utils/quaternion.py) — only the ops the LBS path uses:
mul, rotate, invert, from-Euler-XYZ, to-matrix.  All functions broadcast over
arbitrary leading batch dims; quaternions live in the trailing dim of size 4.
"""

from __future__ import annotations

import jax.numpy as jnp


def mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (reference batchMul)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def invert(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-quaternion inverse = conjugate (reference batchInvert)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v by quaternions q (reference batchRot):
    v' = v + 2·qv × (qv × v + w·v)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def from_xyz(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler XYZ (intrinsic, radians) → quaternion (reference batchFromXYZ):
    q = qz ⊗ qy ⊗ qx applied as R = Rz·Ry·Rx? — the reference composes
    q = mul(qz, mul(qy, qx)) with half-angle construction per axis."""
    half = euler * 0.5
    cx, cy, cz = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sx, sy, sz = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    zeros = jnp.zeros_like(cx)
    qx = jnp.stack([sx, zeros, zeros, cx], axis=-1)
    qy = jnp.stack([zeros, sy, zeros, cy], axis=-1)
    qz = jnp.stack([zeros, zeros, sz, cz], axis=-1)
    return mul(qz, mul(qy, qx))


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] → [..., 3, 3] rotation matrix (column-vector convention)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
