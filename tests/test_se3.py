import jax
import jax.numpy as jnp
import numpy as np

from eags_slam_tpu.core import se3


def random_rotmats(rng, n):
    # QR-based uniform-ish rotations.
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q


def test_quat_roundtrip(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    R = se3.quat_to_rotmat(jnp.asarray(q))
    q2 = se3.rotmat_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=2e-3)


def test_rotmat_roundtrip(rng):
    R = random_rotmats(rng, 64)
    q = se3.rotmat_to_quat(jnp.asarray(R))
    R2 = se3.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=2e-3)


def test_quat_multiply_matches_rotmat(rng):
    q1 = rng.normal(size=(16, 4)).astype(np.float32)
    q2 = rng.normal(size=(16, 4)).astype(np.float32)
    q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
    q12 = se3.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
    R12 = se3.quat_to_rotmat(q12)
    R_ref = se3.quat_to_rotmat(jnp.asarray(q1)) @ se3.quat_to_rotmat(jnp.asarray(q2))
    np.testing.assert_allclose(np.asarray(R12), np.asarray(R_ref), atol=1e-2)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
    R = se3.so3_exp(jnp.asarray(w))
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-3)
    # Near-zero stability
    w0 = jnp.zeros((3,))
    np.testing.assert_allclose(np.asarray(se3.so3_exp(w0)), np.eye(3), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    tau = rng.normal(size=(32, 6)).astype(np.float32) * 0.3
    T = se3.se3_exp(jnp.asarray(tau))
    tau2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(tau2), tau, atol=1e-3)


def test_se3_exp_is_rigid(rng):
    tau = rng.normal(size=(8, 6)).astype(np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(tau)))
    R = T[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1.0], (8, 1)), atol=0)


def test_mat_inverse(rng):
    tau = rng.normal(size=(8, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(tau))
    I = np.asarray(T @ se3.mat_inverse(T))
    np.testing.assert_allclose(I, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_const_speed_extrapolate():
    # Pure translation at constant velocity.
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, 3] = [0.1, 0.0, 0.2]
    T2 = se3.const_speed_extrapolate(jnp.asarray(T0), jnp.asarray(T1))
    np.testing.assert_allclose(np.asarray(T2)[:3, 3], [0.2, 0.0, 0.4], atol=1e-6)


def test_special_procrustes(rng):
    R = random_rotmats(rng, 8)
    noisy = R + 0.05 * rng.normal(size=R.shape).astype(np.float32)
    P = np.asarray(se3.special_procrustes(jnp.asarray(noisy)))
    np.testing.assert_allclose(P @ P.transpose(0, 2, 1), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(P), np.ones(8), atol=1e-5)
    # Projection of an exact rotation is itself.
    P2 = np.asarray(se3.special_procrustes(jnp.asarray(R)))
    np.testing.assert_allclose(P2, R, atol=1e-5)


def test_rotation_average(rng):
    R = random_rotmats(rng, 1)[0]
    Rs = jnp.asarray(np.stack([R, R, R]))
    w = jnp.asarray([0.2, 0.3, 0.5])
    avg = np.asarray(se3.rotation_average(Rs, w))
    np.testing.assert_allclose(avg, R, atol=1e-5)


def test_transform_points(rng):
    tau = rng.normal(size=(6,)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(tau))
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = se3.transform_points(T, pts)
    Tn = np.asarray(T)
    ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
