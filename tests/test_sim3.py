"""sim(3) converter round-trips and ray-frame transforms
(ref: src/utils.py:398-491, src/scene_cateogries.py:24-47)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from catnerf_tpu.ops import sim3


def _random_sim3(rng, scale=None):
    R = Rotation.random(random_state=rng).as_matrix()
    s = scale if scale is not None else rng.uniform(0.5, 3.0)
    t = rng.uniform(-2, 2, 3)
    T = np.eye(4)
    T[:3, :3] = R * s
    T[:3, 3] = t
    return T, s, R, t


def test_sim3_tensor_roundtrip_np():
    rng = np.random.default_rng(0)
    for _ in range(20):
        T, s, R, t = _random_sim3(rng)
        vec = sim3.sim3_to_tensor_np(T)
        assert vec.shape == (8,)
        np.testing.assert_allclose(vec[0], s, rtol=1e-5)
        T2 = sim3.tensor_to_sim3_np(vec)
        np.testing.assert_allclose(T2, T, rtol=1e-4, atol=1e-5)


def test_quat_matches_scipy():
    rng = np.random.default_rng(1)
    for _ in range(10):
        R = Rotation.random(random_state=rng).as_matrix()
        q = sim3.rotation_to_quat_np(R)  # [w, x, y, z]
        q_scipy = Rotation.from_matrix(R).as_quat()  # [x, y, z, w]
        q_scipy_wxyz = np.concatenate([[q_scipy[3]], q_scipy[:3]])
        # quaternions are sign-ambiguous
        if np.dot(q, q_scipy_wxyz) < 0:
            q_scipy_wxyz = -q_scipy_wxyz
        np.testing.assert_allclose(q, q_scipy_wxyz, atol=1e-6)


def test_tensor_to_sim3_jnp_matches_np():
    rng = np.random.default_rng(2)
    T, *_ = _random_sim3(rng)
    vec = sim3.sim3_to_tensor_np(T)
    T_j = np.asarray(sim3.tensor_to_sim3(jnp.asarray(vec)))
    np.testing.assert_allclose(T_j, T, rtol=1e-4, atol=1e-5)


def test_tensor_to_sim3_batched():
    rng = np.random.default_rng(3)
    vecs = np.stack([sim3.sim3_to_tensor_np(_random_sim3(rng)[0]) for _ in range(5)])
    Ts = np.asarray(sim3.tensor_to_sim3(jnp.asarray(vecs)))
    assert Ts.shape == (5, 4, 4)
    for i in range(5):
        np.testing.assert_allclose(
            Ts[i], np.asarray(sim3.tensor_to_sim3(jnp.asarray(vecs[i]))),
            rtol=1e-6)


def test_invert_se3():
    rng = np.random.default_rng(4)
    T, _, _, _ = _random_sim3(rng, scale=1.0)
    Ti = np.asarray(sim3.invert_se3(jnp.asarray(T, dtype=jnp.float32)))
    np.testing.assert_allclose(Ti @ T, np.eye(4), atol=1e-5)


def test_origin_dirs_world():
    rng = np.random.default_rng(5)
    T, _, R, t = _random_sim3(rng, scale=1.0)
    dirs_C = rng.standard_normal((7, 3)).astype(np.float32)
    T_b = jnp.tile(jnp.asarray(T, jnp.float32)[None], (7, 1, 1))
    origins, dirs_W = sim3.origin_dirs_world(T_b, jnp.asarray(dirs_C))
    np.testing.assert_allclose(np.asarray(origins), np.tile(t, (7, 1)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dirs_W), dirs_C @ R.T, rtol=1e-4, atol=1e-5)


def test_origin_dirs_object_sim3_scale_normalisation():
    """inv(T_CO) with sim(3) scale s must shrink object-frame geometry by 1/s
    (ref: src/scene_cateogries.py:24-35 uses a full matrix inverse)."""
    rng = np.random.default_rng(6)
    s = 2.0
    T_CO, _, R, t = _random_sim3(rng, scale=s)
    dirs_C = rng.standard_normal((4, 3)).astype(np.float32)
    T_b = jnp.tile(jnp.asarray(T_CO, jnp.float32)[None], (4, 1, 1))
    origins, dirs_O = sim3.origin_dirs_object(T_b, jnp.asarray(dirs_C))
    T_OC = np.linalg.inv(T_CO)
    np.testing.assert_allclose(
        np.asarray(origins), np.tile(T_OC[:3, 3], (4, 1)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dirs_O), dirs_C @ T_OC[:3, :3].T, rtol=1e-4, atol=1e-5)
    # dir norms scale by 1/s
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs_O), axis=-1),
        np.linalg.norm(dirs_C, axis=-1) / s, rtol=1e-4)


def test_transform_pointcloud_np():
    rng = np.random.default_rng(7)
    T, *_ = _random_sim3(rng)
    pts = rng.standard_normal((10, 3))
    out = sim3.transform_pointcloud_np(pts, T)
    hom = np.hstack([pts, np.ones((10, 1))])
    expected = (T @ hom.T).T[:, :3]
    np.testing.assert_allclose(out, expected, rtol=1e-6)
