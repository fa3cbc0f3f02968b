"""Batched SO(3)/SE(3)/quaternion math on device.

Covers the capabilities of the reference's scattered pose math:
  - quaternion utilities (src/utils/tracker_utils.py:8-61,
    src/utils/gaussian_model_utils.py:186-213),
  - SO3/SE3 exponential maps and pose updates (src/utils/pose_utils.py:25-97),
  - batched SE3 identity/inverse/concat/transform (src/gsr/se3/torch_se3.py),
  - `roma.special_procrustes` rotation averaging (src/gsr/solver.py:188) and
    quaternion<->matrix conversions used by submap re-anchoring
    (src/entities/submap.py:39-70).

All functions are pure jnp, batch-dim agnostic (leading dims broadcast), and
safe under `jit`/`vmap`/`grad`. Quaternions are **wxyz** (scalar first), unit
norm, matching the reference's 3DGS convention.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (wxyz)
# ---------------------------------------------------------------------------


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, batched. Reference: tracker_utils.py:8-29."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Reference formula: src/utils/gaussian_model_utils.py:186-213.
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branchless Shepperd-style: compute all four candidate quaternions and pick
    the best-conditioned one (largest pivot) with `where`, so it is safe under
    vmap/grad. Equivalent to scipy Rotation.as_quat used at
    src/utils/tracker_utils.py:31-61.
    """
    m = R
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    # Four candidates, each valid when its pivot is the largest.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw_w = _safe_sqrt(1.0 + t) / 2.0
    q_w = jnp.stack(
        [
            qw_w,
            (m[..., 2, 1] - m[..., 1, 2]) / (4 * qw_w),
            (m[..., 0, 2] - m[..., 2, 0]) / (4 * qw_w),
            (m[..., 1, 0] - m[..., 0, 1]) / (4 * qw_w),
        ],
        axis=-1,
    )
    qx_x = _safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q_x = jnp.stack(
        [
            (m[..., 2, 1] - m[..., 1, 2]) / (4 * qx_x),
            qx_x,
            (m[..., 0, 1] + m[..., 1, 0]) / (4 * qx_x),
            (m[..., 0, 2] + m[..., 2, 0]) / (4 * qx_x),
        ],
        axis=-1,
    )
    qy_y = _safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q_y = jnp.stack(
        [
            (m[..., 0, 2] - m[..., 2, 0]) / (4 * qy_y),
            (m[..., 0, 1] + m[..., 1, 0]) / (4 * qy_y),
            qy_y,
            (m[..., 1, 2] + m[..., 2, 1]) / (4 * qy_y),
        ],
        axis=-1,
    )
    qz_z = _safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q_z = jnp.stack(
        [
            (m[..., 1, 0] - m[..., 0, 1]) / (4 * qz_z),
            (m[..., 0, 2] + m[..., 2, 0]) / (4 * qz_z),
            (m[..., 1, 2] + m[..., 2, 1]) / (4 * qz_z),
            qz_z,
        ],
        axis=-1,
    )

    pivots = jnp.stack([t, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    # Canonicalize sign (w >= 0) and normalize.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    R = quat_to_rotmat(q)
    return jnp.einsum("...ij,...j->...i", R, v)


# ---------------------------------------------------------------------------
# SO(3) / SE(3) exponential & logarithm maps
# ---------------------------------------------------------------------------


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix. Reference: pose_utils.py:25-35."""
    zeros = jnp.zeros_like(w[..., 0])
    rows = [
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def so3_exp(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues formula, numerically stable near 0. Reference: pose_utils.py:38-56.

    Small-angle branches use the double-`where` pattern (safe input into the
    active branch) so reverse-mode gradients stay finite at w == 0 — the
    naive `where` overflows f32 in the untaken branch's cotangent.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 <= eps
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    W = skew(w)
    WW = W @ W
    a = jnp.sinc(jnp.sqrt(theta2 + eps * eps) / jnp.pi)  # sin(t)/t, smooth
    b = jnp.where(
        small, 0.5, (1.0 - jnp.cos(theta_safe)) / theta2_safe
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def se3_exp(tau: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Twist (..., 6) [rho(3), phi(3)] -> homogeneous (..., 4, 4).

    Matches the (translation-first) layout used by the reference's
    `update_pose` (src/utils/pose_utils.py:59-97).
    """
    rho, phi = tau[..., :3], tau[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 <= eps
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    W = skew(phi)
    WW = W @ W
    R = so3_exp(phi)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    c = jnp.where(
        small,
        1.0 / 6.0,
        (theta_safe - jnp.sin(theta_safe)) / (theta2_safe * theta_safe),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tau.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return Rt_to_mat(R, t)


def so3_log(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (..., 3).

    Differentiation-safe at the identity: cos(theta) is clipped strictly
    inside (-1, 1) (arccos' gradient is infinite at the endpoints, which
    poisons Gauss-Newton jacobians through residuals that are exactly zero)
    and theta/(2 sin theta) is computed via the smooth jnp.sinc. Near
    theta = pi the formula degrades; SLAM relative rotations stay far from pi.
    """
    cos_theta = jnp.clip(
        (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7
    )
    theta = jnp.arccos(cos_theta)
    w_hat = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta / (2 sin theta) = 0.5 / sinc(theta/pi): smooth + finite at 0.
    scale = 0.5 / jnp.sinc(theta / jnp.pi)
    return scale[..., None] * w_hat


def se3_log(T: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Homogeneous (..., 4, 4) -> twist (..., 6) [rho, phi]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R, eps)
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 <= eps
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    W = skew(phi)
    WW = W @ W
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) WW
    half = theta_safe / 2.0
    cot = jnp.where(
        small,
        1.0 / 12.0,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + eps)) / theta2_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + cot[..., None, None] * WW
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


# ---------------------------------------------------------------------------
# Homogeneous transforms
# ---------------------------------------------------------------------------


def Rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4). Reference: gsr/se3/torch_se3.py."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T


def mat_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE3 inverse (no linalg.inv): [R^T, -R^T t]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def const_speed_extrapolate(T_prev2: jnp.ndarray, T_prev1: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity pose prediction T1 @ T0^-1 @ T1.

    Reference: `interpolate_poses` / const-speed candidate,
    src/utils/tracker_utils.py:63-70.
    """
    return T_prev1 @ mat_inverse(T_prev2) @ T_prev1


# ---------------------------------------------------------------------------
# Rotation averaging (roma.special_procrustes equivalent)
# ---------------------------------------------------------------------------


def special_procrustes(M: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto SO(3) via SVD (det +1 branch).

    Used for residual-weighted rotation fusion in the LC solver
    (reference src/gsr/solver.py:181-201) and float64 quaternion re-anchoring
    (src/entities/submap.py:53-64).
    """
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros_like(M).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    return U @ D @ Vt


def rotation_average(Rs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted chordal-L2 rotation mean: procrustes of the weighted sum."""
    M = jnp.sum(Rs * weights[..., None, None], axis=-3)
    return special_procrustes(M)
