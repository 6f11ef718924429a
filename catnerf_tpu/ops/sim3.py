"""sim(3) / SE(3) pose utilities.

Pose <-> 8-vector [s, qw, qx, qy, qz, tx, ty, tz] converters matching the
reference semantics (ref: src/utils.py:368-491). Implemented for both numpy
(host-side preprocessing) and jax.numpy (in-jit transforms); the jnp variants
are pure functions safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# numpy (host-side; used by registration preprocessing and checkpoint IO)
# ---------------------------------------------------------------------------

def rotation_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion [w, x, y, z] (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z], dtype=np.float64)
    return q / np.linalg.norm(q)


def quat_to_rotation_np(q: np.ndarray) -> np.ndarray:
    """Quaternion [w, x, y, z] -> rotation matrix (ref: src/utils.py:468-491)."""
    qr, qi, qj, qk = q
    two_s = 2.0 / float(np.dot(q, q))
    return np.array(
        [
            [1 - two_s * (qj * qj + qk * qk), two_s * (qi * qj - qk * qr), two_s * (qi * qk + qj * qr)],
            [two_s * (qi * qj + qk * qr), 1 - two_s * (qi * qi + qk * qk), two_s * (qj * qk - qi * qr)],
            [two_s * (qi * qk - qj * qr), two_s * (qj * qk + qi * qr), 1 - two_s * (qi * qi + qj * qj)],
        ]
    )


def sim3_to_tensor_np(T: np.ndarray) -> np.ndarray:
    """4x4 sim(3) matrix -> [s, qw, qx, qy, qz, tx, ty, tz].

    Scale is det(R_s)^(1/3) (ref: src/utils.py:398-409). Does not mutate T.
    """
    T = np.asarray(T, dtype=np.float64)
    scale = np.linalg.det(T[:3, :3]) ** (1.0 / 3.0)
    R = T[:3, :3] / scale
    q = rotation_to_quat_np(R)
    return np.concatenate([[scale], q, T[:3, 3]]).astype(np.float32)


def tensor_to_sim3_np(t: np.ndarray) -> np.ndarray:
    """[s, qw..qz, t] -> 4x4 sim(3) matrix (ref: src/utils.py:432-447)."""
    t = np.asarray(t, dtype=np.float64)
    s, q, trans = t[0], t[1:5], t[5:8]
    T = np.eye(4)
    T[:3, :3] = quat_to_rotation_np(q) * s
    T[:3, 3] = trans
    return T.astype(np.float32)


def tensor_to_se3_np(t: np.ndarray) -> np.ndarray:
    """[qw..qz, t] (7-vector) -> 4x4 rigid transform (ref: src/utils.py:411-430)."""
    t = np.asarray(t, dtype=np.float64)
    q, trans = t[:4], t[4:7]
    T = np.eye(4)
    T[:3, :3] = quat_to_rotation_np(q)
    T[:3, 3] = trans
    return T.astype(np.float32)


def transform_pointcloud_np(points: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Apply homogeneous transform to (N, 3) points (ref: src/utils.py:361-366)."""
    return points @ T[:3, :3].T + T[:3, 3]


# ---------------------------------------------------------------------------
# jax.numpy (in-jit)
# ---------------------------------------------------------------------------

def quat_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Batched quaternion [..., 4] (wxyz) -> rotation [..., 3, 3]."""
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    r00 = 1 - two_s * (qj**2 + qk**2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi**2 + qk**2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi**2 + qj**2)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def tensor_to_sim3(t: jnp.ndarray) -> jnp.ndarray:
    """Batched [..., 8] sim(3) tensor -> [..., 4, 4] matrix."""
    s = t[..., 0]
    R = quat_to_rotation(t[..., 1:5]) * s[..., None, None]
    trans = t[..., 5:8]
    top = jnp.concatenate([R, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=t.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a batched rigid transform [..., 4, 4]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def origin_dirs_world(T_WC: jnp.ndarray, dirs_C: jnp.ndarray):
    """Camera-frame ray dirs -> world frame (ref: src/scene_cateogries.py:37-47).

    T_WC: (N, 4, 4), dirs_C: (N, 3) -> origins (N, 3), dirs (N, 3).
    """
    dirs_W = jnp.einsum("nij,nj->ni", T_WC[:, :3, :3], dirs_C)
    origins = T_WC[:, :3, 3]
    return origins, dirs_W


def origin_dirs_object(T_CO: jnp.ndarray, dirs_C: jnp.ndarray):
    """Camera-frame ray dirs -> canonical object frame via inv(T_CO)
    (ref: src/scene_cateogries.py:24-35). T_CO carries a sim(3) scale, so the
    generic matrix inverse (not the rigid closed form) is required: the
    resulting 1/s factor normalizes object-frame geometry.
    """
    T_OC = jnp.linalg.inv(T_CO)
    dirs_O = jnp.einsum("nij,nj->ni", T_OC[:, :3, :3], dirs_C)
    origins = T_OC[:, :3, 3]
    return origins, dirs_O
