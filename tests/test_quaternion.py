import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.ops import (
    blender_camera_to_quaternion,
    qconj,
    qmul,
    qnormalize,
    qrot,
    qrot_points,
    quaternion_angle_loss,
)


def rot_matrix_from_quat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_qmul_identity():
    rng = np.random.RandomState(0)
    q = rng.randn(5, 4).astype(np.float32)
    ident = np.tile(np.array([1.0, 0, 0, 0], np.float32), (5, 1))
    np.testing.assert_allclose(qmul(jnp.array(ident), jnp.array(q)), q, atol=1e-6)
    np.testing.assert_allclose(qmul(jnp.array(q), jnp.array(ident)), q, atol=1e-6)


def test_qmul_conjugate_gives_norm():
    rng = np.random.RandomState(1)
    q = rng.randn(7, 4).astype(np.float32)
    prod = np.asarray(qmul(jnp.array(q), qconj(jnp.array(q))))
    norms = (q**2).sum(-1)
    np.testing.assert_allclose(prod[:, 0], norms, rtol=1e-5)
    np.testing.assert_allclose(prod[:, 1:], 0.0, atol=1e-4)


def test_qrot_matches_rotation_matrix():
    rng = np.random.RandomState(2)
    q = rng.randn(4).astype(np.float32)
    q = q / np.linalg.norm(q)
    v = rng.randn(10, 3).astype(np.float32)
    out = np.asarray(qrot(jnp.array(q)[None], jnp.array(v)[None]))[0]
    expected = v @ rot_matrix_from_quat(q).T
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_qrot_points_normalizes():
    rng = np.random.RandomState(3)
    q = (rng.randn(2, 4) * 3).astype(np.float32)
    v = rng.randn(2, 6, 3).astype(np.float32)
    out = np.asarray(qrot_points(jnp.array(v), jnp.array(q)))
    for b in range(2):
        qn = q[b] / np.linalg.norm(q[b])
        expected = v[b] @ rot_matrix_from_quat(qn).T
        np.testing.assert_allclose(out[b], expected, atol=1e-5)


def test_qrot_points_inverse_roundtrip():
    rng = np.random.RandomState(4)
    q = rng.randn(3, 4).astype(np.float32)
    v = rng.randn(3, 5, 3).astype(np.float32)
    fwd = qrot_points(jnp.array(v), jnp.array(q))
    back = qrot_points(fwd, jnp.array(q), inverse=True)
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_angle_loss_zero_for_same_rotation():
    rng = np.random.RandomState(5)
    q = rng.randn(6, 4).astype(np.float32)
    qn = np.asarray(qnormalize(jnp.array(q)))
    loss = np.asarray(quaternion_angle_loss(jnp.array(qn), jnp.array(qn)))
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)
    # -q is the same rotation
    loss2 = np.asarray(quaternion_angle_loss(jnp.array(qn), jnp.array(-qn)))
    np.testing.assert_allclose(loss2, 0.0, atol=1e-5)


def test_angle_loss_max_for_orthogonal():
    q1 = jnp.array([[1.0, 0, 0, 0]])
    q2 = jnp.array([[0.0, 1.0, 0, 0]])  # 180 deg about x
    loss = np.asarray(quaternion_angle_loss(q1, q2))
    np.testing.assert_allclose(loss, 1.0, atol=1e-6)


def test_blender_camera_quaternion_matches_scipy():
    scipy = pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation as R
    import math

    rng = np.random.RandomState(6)
    for _ in range(20):
        pos = rng.randn(3) * 2.0
        if abs(np.linalg.norm(pos[:2])) < 1e-3:
            continue
        ours = blender_camera_to_quaternion(pos[None])
        # reference formula (blender_camera_quaternions.py:16-56)
        x, y, z = pos / np.linalg.norm(pos)
        d2 = math.sqrt(x * x + y * y)
        yaw = math.acos(np.clip(x / d2, -1, 1))
        if y / d2 > 0:
            yaw = 2 * math.pi - yaw
        pitch = math.asin(np.clip(z, -1, 1))
        quat = R.from_euler("yzx", [yaw + math.pi, pitch, 0.0]).as_quat()
        expected = np.r_[quat[-1], quat[:-1]].astype(np.float32)
        sign = np.sign(np.dot(ours, expected)) or 1.0
        np.testing.assert_allclose(ours, sign * expected, atol=1e-5)


def test_qmul_jit_and_grad():
    f = jax.jit(lambda a, b: jnp.sum(qmul(a, b) ** 2))
    g = jax.grad(f)(jnp.ones((2, 4)), jnp.ones((2, 4)))
    assert g.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(g)))


def test_qadd_qsub_qsquare():
    from im23d_tpu.ops import qadd, qsquare, qsub

    rng = np.random.RandomState(7)
    q1 = rng.randn(4, 4).astype(np.float32)
    q2 = rng.randn(4, 4).astype(np.float32)
    np.testing.assert_allclose(qadd(jnp.array(q1), jnp.array(q2)), q1 + q2)
    np.testing.assert_allclose(qsub(jnp.array(q1), jnp.array(q2)), q1 - q2)
    # square == qmul(q, q)
    np.testing.assert_allclose(
        np.asarray(qsquare(jnp.array(q1))),
        np.asarray(qmul(jnp.array(q1), jnp.array(q1))),
        atol=1e-5,
    )
