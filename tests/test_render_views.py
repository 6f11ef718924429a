"""Novel-view renderer tests (catnerf_tpu/render_views.py)."""

import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.render_views import (
    _composite,
    look_at,
    orbit_poses,
    render_session_orbits,
    render_view,
)
from catnerf_tpu.train.loop import TrainingSession


def test_look_at_points_at_target():
    eye = np.array([2.0, -1.0, 1.5])
    target = np.array([0.2, 0.3, -0.1])
    T = look_at(eye, target)
    # center ray (camera z) points from eye to target
    z = T[:3, 2]
    want = (target - eye) / np.linalg.norm(target - eye)
    np.testing.assert_allclose(z, want, atol=1e-6)
    # rotation is orthonormal, right-handed
    R = T[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99
    np.testing.assert_allclose(T[:3, 3], eye, atol=1e-6)


def test_orbit_poses_on_circle():
    poses = orbit_poses(6, radius=3.0, center=(1.0, 0.0, 0.0))
    assert len(poses) == 6
    for T in poses:
        d = np.linalg.norm(T[:3, 3] - np.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(d, 3.0, rtol=1e-6)


def test_composite_matches_manual_cumprod():
    """Numpy compositing mirrors ops/render.py's shifted-cumprod math
    (ref: src/render_rays.py:25-50)."""
    occ = np.array([[0.3, 0.5, 1.0]])
    rgb = np.ones((1, 3, 3)) * np.array([1.0, 0.5, 0.25])[None, :, None]
    z = np.array([1.0, 2.0, 3.0])
    img, depth, alpha = _composite(occ, rgb, z)
    t0 = 0.3
    t1 = 0.5 * (1 - 0.3 + 1e-10)
    t2 = 1.0 * (1 - 0.3 + 1e-10) * (1 - 0.5 + 1e-10)
    np.testing.assert_allclose(alpha[0], t0 + t1 + t2, rtol=1e-6)
    np.testing.assert_allclose(depth[0], t0 + 2 * t1 + 3 * t2, rtol=1e-6)
    np.testing.assert_allclose(
        img[0], (t0 * 1.0 + t1 * 0.5 + t2 * 0.25) * np.ones(3), rtol=1e-6)


def test_render_session_views():
    """Render object orbits + background views off a fresh synthetic
    session: shapes, finiteness, and value ranges."""
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=3)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    for _ in range(3):
        sess.step_once()

    cam = CameraInfo(40, 30, 35.0, 35.0, 20.0, 15.0)
    cls_id = sess.cls_ids[0]
    cat = sess.categories[0]
    params = sess.category_params(cls_id)
    obj_id = cat.obj_ids[0]
    k = cat.inst_id_to_index[obj_id]
    T = look_at((1.5, 0.5, 1.0))
    img, depth, alpha = render_view(
        params, cfg, T, cam, near=0.3, far=3.0,
        shape_code=np.asarray(params["shape_codes"][k]),
        texture_code=np.asarray(params["texture_codes"][k]),
        n_bins=12, chunk=4096)
    assert img.shape == (40, 30, 3) and depth.shape == (40, 30)
    assert np.isfinite(img).all() and np.isfinite(depth).all()
    assert (img >= 0).all() and (img <= 1).all()
    assert (alpha >= 0).all() and (alpha <= 1 + 1e-5).all()
    assert (depth >= 0).all() and (depth <= 3.0 + 1e-5).all()

    bg = sess.background_params()
    T_wc = np.asarray(scene.sample_dict[sorted(scene.sample_dict)[0]]["T"],
                      np.float32)
    img_b, depth_b, alpha_b = render_view(
        bg, cfg, T_wc, cam, near=0.05, far=6.0, is_background=True,
        n_bins=12, chunk=4096)
    assert img_b.shape == (40, 30, 3)
    assert np.isfinite(img_b).all()


def test_render_session_orbits_writes_files(tmp_path):
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=1,
                       insts_per_cat=2, seed=3)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    written = render_session_orbits(sess, str(tmp_path), n_views=2,
                                    width=32, height=24, n_bins=8)
    assert written
    import os

    for name in written:
        for suffix in ("_rgb.png", "_depth.png", "_alpha.png"):
            assert os.path.exists(os.path.join(str(tmp_path),
                                               name + suffix)), name + suffix


def test_render_scene_view_composites_all_fields():
    """Whole-scene composite: multi-instance (canonical-frame eval via
    inverse sim(3)) and single-instance (world-frame OBB mask) paths both
    execute; output shapes/ranges are sane and deterministic."""
    from catnerf_tpu.render_views import render_scene_view

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    for insts in (2, 1):  # multi-instance and single-instance categories
        scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                           insts_per_cat=insts, seed=3)
        sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                               cam=scene.cam)
        cam = CameraInfo(32, 24, 28.0, 28.0, 16.0, 12.0)
        T = np.asarray(scene.sample_dict[sorted(scene.sample_dict)[0]]["T"],
                       np.float32)
        img, depth, alpha = render_scene_view(
            sess, T, cam, near=0.1, far=6.0, n_bins=10, chunk=4096)
        img2, _, _ = render_scene_view(
            sess, T, cam, near=0.1, far=6.0, n_bins=10, chunk=4096)
        assert img.shape == (32, 24, 3) and depth.shape == (32, 24)
        assert np.isfinite(img).all() and np.isfinite(depth).all()
        assert (img >= 0).all() and (img <= 1).all()
        assert (alpha >= -1e-6).all() and (alpha <= 1 + 1e-5).all()
        np.testing.assert_array_equal(img, img2)


def test_render_view_mask_box():
    """The optional OBB/extent mask: a huge box is a no-op (pixel-equal to
    unmasked), a zero box blanks the field (alpha == 0) — the rule /object
    and /edit renders use to suppress untrained-region floaters."""
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=1,
                       insts_per_cat=2, seed=3)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    cls_id = sess.cls_ids[0]
    cat = sess.categories[0]
    params = sess.category_params(cls_id)
    k = cat.inst_id_to_index[cat.obj_ids[0]]
    sc = np.asarray(params["shape_codes"][k])
    tc = np.asarray(params["texture_codes"][k])
    cam = CameraInfo(24, 18, 21.0, 21.0, 12.0, 9.0)
    T = look_at((1.5, 0.5, 1.0))
    kw = dict(near=0.3, far=3.0, shape_code=sc, texture_code=tc,
              n_bins=8, chunk=2048)

    img0, _, alpha0 = render_view(params, cfg, T, cam, **kw)
    big = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
           np.full(3, 1e9, np.float32))
    img1, _, alpha1 = render_view(params, cfg, T, cam, mask_box=big, **kw)
    np.testing.assert_array_equal(img0, img1)
    np.testing.assert_array_equal(alpha0, alpha1)

    none = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.zeros(3, np.float32))
    _, _, alpha2 = render_view(params, cfg, T, cam, mask_box=none, **kw)
    np.testing.assert_allclose(alpha2, 0.0, atol=1e-7)

    from catnerf_tpu.render_views import instance_mask_box

    mask = instance_mask_box(sess, cls_id, [cat.obj_ids[0]])
    assert mask is not None and mask[2].shape == (3,)
    img3, _, alpha3 = render_view(params, cfg, T, cam, mask_box=mask, **kw)
    assert np.isfinite(img3).all()
    # masking can only remove occupancy, never add it
    assert (alpha3 <= alpha0 + 1e-6).all()


def test_scene_staging_cache_hit_and_invalidation():
    """render_scene_view's host staging (device pulls + stacking) is cached
    on the session per state version and invalidated by training steps."""
    from catnerf_tpu.render_views import render_scene_view

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=1,
                       insts_per_cat=2, seed=3)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    cam = CameraInfo(24, 18, 21.0, 21.0, 12.0, 9.0)
    T = np.asarray(scene.sample_dict[sorted(scene.sample_dict)[0]]["T"],
                   np.float32)
    img1, _, _ = render_scene_view(sess, T, cam, near=0.1, far=6.0,
                                   n_bins=8, chunk=2048)
    ver1, staged1 = sess._scene_staging_cache
    img2, _, _ = render_scene_view(sess, T, cam, near=0.1, far=6.0,
                                   n_bins=8, chunk=2048)
    assert sess._scene_staging_cache[1] is staged1  # cache hit
    np.testing.assert_array_equal(img1, img2)

    sess.step_once()  # params changed -> version must change
    img3, _, _ = render_scene_view(sess, T, cam, near=0.1, far=6.0,
                                   n_bins=8, chunk=2048)
    ver3, staged3 = sess._scene_staging_cache
    assert ver3 != ver1 and staged3 is not staged1
    assert not np.array_equal(img1, img3)  # fresh params actually used
