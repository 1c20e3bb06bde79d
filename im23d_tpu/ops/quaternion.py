"""Quaternion algebra (wxyz convention), fully batched and jit-safe.

Capability parity with the reference quaternion stack
(``code/quaternions/operations.py``, ``code/quaternions/points_quaternions.py``,
``code/rendering/utils.py:36-64``, ``code/quaternions/blender_camera_quaternions.py``)
but written as pure jnp elementwise math: no per-call object construction, no
dynamic shapes, broadcastable over arbitrary leading dims.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def qnormalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    return q / jnp.maximum(norm, eps)


def qmul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2. Shapes broadcast; last axis is (w, x, y, z).

    Parity: reference ``QuaternionOperations.quaternion_multiplication``
    (``code/quaternions/operations.py:68-97``) and ``qmul``
    (``code/rendering/utils.py:48-64``).
    """
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def qadd(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Componentwise quaternion addition (reference ``operations.py:15-42``)."""
    return q1 + q2


def qsub(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Componentwise quaternion subtraction (reference ``operations.py:44-66``)."""
    return q1 - q2


def qsquare(q: jnp.ndarray) -> jnp.ndarray:
    """q*q via the closed form (reference ``operations.py:99-118``)."""
    w = q[..., :1]
    vec = q[..., 1:]
    w2 = w * w - jnp.sum(vec * vec, axis=-1, keepdims=True)
    return jnp.concatenate([w2, 2.0 * w * vec], axis=-1)


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (w, -x, -y, -z).

    Parity: ``QuaternionOperations.quaternion_conjugate``
    (``code/quaternions/operations.py:120-136``).
    """
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` (..., N, 3) by unit quaternions ``q`` (..., 4).

    Uses the cross-product form v + 2*(w*(u x v) + u x (u x v)) — cheaper on
    the VPU than the full q*p*q̄ sandwich. Parity: reference ``qrot``
    (``code/rendering/utils.py:36-46``). ``q`` must already be unit length.
    """
    u = q[..., None, 1:4]
    w = q[..., None, :1]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def qrot_points(points: jnp.ndarray, q: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Rotate point clouds (..., N, 3) by (possibly unnormalized) quats (..., 4).

    Normalizes q first, matching the reference
    ``PointsQuaternionsRotator.rotate_points``
    (``code/quaternions/points_quaternions.py:40-81``), which computes the
    full sandwich q * (0, p) * q̄ after F.normalize.
    """
    qn = qnormalize(q)
    if inverse:
        qn = qconj(qn)
    return qrot(qn, points)


def quaternion_angle_loss(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angular difference loss 1 - Re(q1 * q2̄ / ||q1 * q2̄||)^2 per element.

    This is the pose-student loss of the reference ``UnsupervisedLoss``
    (``code/models/unsupervised_part.py:128-136``): the real part of the
    normalized relative rotation, squared, subtracted from 1.
    """
    rel = qnormalize(qmul(q1, qconj(q2)))
    return 1.0 - rel[..., 0] ** 2


def _euler_yzx_to_quat(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """Extrinsic Euler 'yzx' (scipy lowercase convention) to wxyz quaternion.

    Equivalent to scipy ``Rotation.from_euler("yzx", [yaw, pitch, roll])``
    used by the reference (``code/quaternions/blender_camera_quaternions.py:46-52``)
    without a scipy dependency: extrinsic composition
    q = qx(roll) * qz(pitch) * qy(yaw).
    """
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    cz, sz = math.cos(pitch / 2), math.sin(pitch / 2)
    cx, sx = math.cos(roll / 2), math.sin(roll / 2)
    qy = np.array([cy, 0.0, sy, 0.0])
    qz = np.array([cz, 0.0, 0.0, sz])
    qx = np.array([cx, sx, 0.0, 0.0])

    def mul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
                w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            ]
        )

    return mul(mul(qx, qz), qy)


def blender_camera_to_quaternion(position) -> np.ndarray:
    """Blender camera world position -> wxyz view quaternion (host-side).

    Parity with the reference
    ``blender_camera_position_to_torch_tensor_quaternion``
    (``code/quaternions/blender_camera_quaternions.py:16-56``): derive yaw
    from the horizontal direction, pitch from elevation, roll = 0, then the
    'yzx' Euler composition. Returns float32 numpy (host precompute — camera
    metadata is parsed once per dataset item on the CPU input pipeline).
    """
    x, y, z = (float(v) for v in np.asarray(position).reshape(-1)[:3])
    d = math.sqrt(x * x + y * y + z * z)
    x, y, z = x / d, y / d, z / d
    d2 = math.sqrt(x * x + y * y)
    x2, y2 = x / d2, y / d2
    yaw = math.acos(np.clip(x2, -1.0, 1.0))
    if y2 > 0:
        yaw = 2 * math.pi - yaw
    pitch = math.asin(np.clip(z, -1.0, 1.0))
    yaw = yaw + math.pi
    q = _euler_yzx_to_quat(yaw, pitch, 0.0)
    return q.astype(np.float32)
