"""Data-layer tests: camera rays, buffers, synthetic scene contract."""

import numpy as np

from catnerf_tpu.data.bbox import enlarge_bbox, mask_bbox
from catnerf_tpu.data.camera import CameraInfo, ray_dirs_cache
from catnerf_tpu.data.scene import CategoryScene, RayBuffer, SceneBatcher
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.data import transforms
from catnerf_tpu.config import Config


def test_ray_dirs_cache_convention():
    """Match the reference formula (ref: src/scene_cateogries.py:613-629):
    dirs[w, h] = ((w - cx)/fx, (h - cy)/fy, 1)."""
    dirs = ray_dirs_cache(8, 6, fx=2.0, fy=3.0, cx=3.5, cy=2.5)
    assert dirs.shape == (8, 6, 3)
    np.testing.assert_allclose(dirs[..., 2], 1.0)
    np.testing.assert_allclose(dirs[0, 0], [(0 - 3.5) / 2.0, (0 - 2.5) / 3.0, 1.0])
    np.testing.assert_allclose(dirs[7, 5], [(7 - 3.5) / 2.0, (5 - 2.5) / 3.0, 1.0])


def test_camera_unproject_roundtrip():
    cam = CameraInfo(8, 6, 2.0, 3.0, 3.5, 2.5)
    depth = np.zeros((8, 6), np.float32)
    depth[4, 3] = 2.0
    pts = cam.unproject_depth(depth)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [2.0 * (4 - 3.5) / 2.0, 2.0 * (3 - 2.5) / 3.0, 2.0])


def test_transforms():
    d = np.array([[1000.0, 9000.0]], np.float32)
    scaled = transforms.depth_scale(d, 1e-3)
    np.testing.assert_allclose(scaled, [[1.0, 9.0]])
    filtered = transforms.depth_filter(scaled, 8.0)
    np.testing.assert_allclose(filtered, [[1.0, 0.0]])
    img = np.arange(6).reshape(1, 2, 3)
    np.testing.assert_array_equal(transforms.bgr_to_rgb(img)[0, 0], [2, 1, 0])


def test_bbox_helpers():
    mask = np.zeros((10, 12), bool)
    mask[2:5, 3:8] = True
    assert mask_bbox(mask) == (2, 5, 3, 8)
    assert mask_bbox(np.zeros((4, 4), bool)) is None
    enl = enlarge_bbox([3, 2, 8, 5], 1.0, w=12, h=10)
    assert enl == [1, 1, 10, 6]
    assert enlarge_bbox([3, 3, 3, 5], 1.0, w=12, h=10) is None


def test_ray_buffer_epoch_semantics():
    rng = np.random.default_rng(0)
    arrays = {"depth": np.arange(100, dtype=np.float32)}
    buf = RayBuffer(dict(arrays), rng)
    seen = []
    # within one epoch (before reshuffle trips), samples don't repeat
    for _ in range(8):
        seen.extend(buf.sample(10)["depth"].tolist())
    assert len(set(seen)) == len(seen)
    # sampling more than the buffer size falls back to replacement
    big = buf.sample(300)["depth"]
    assert big.shape == (300,)


def test_synthetic_scene_contract():
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=2,
                       insts_per_cat=2)
    assert 0 in scene.inst_dict
    cat_ids = [k for k in scene.inst_dict if k != 0]
    assert sorted(cat_ids) == [80, 81]
    for cid in cat_ids:
        for iid, info in scene.inst_dict[cid].items():
            assert "T_obj" in info and "bbox3D" in info
            assert len(info["frame_info"]) >= 1
            for fi in info["frame_info"]:
                w0, w1, h0, h1 = fi["bbox"]
                assert 0 <= w0 < w1 <= 64 and 0 <= h0 < h1 <= 48
    s = scene.sample_dict[0]
    assert s["image"].shape == (64, 48, 3)
    assert s["depth"].shape == (64, 48)
    assert s["obj_mask"].shape == (64, 48)
    # depth is positive everywhere inside a closed room
    assert (s["depth"] > 0).all()
    # instance pixels exist
    assert (s["obj_mask"] > 0).any()
    # unknown band exists
    assert (s["obj_mask"] == -1).any()


def test_synthetic_depth_consistency():
    """Unprojecting instance pixels must land on the sphere surface."""
    scene = make_scene(n_frames=2, width=64, height=48, n_categories=1,
                       insts_per_cat=1, unknown_band=False)
    sphere = scene.spheres[0]
    s = scene.sample_dict[0]
    mask = s["obj_mask"] == sphere.inst_id
    assert mask.sum() > 10
    depth = np.where(mask, s["depth"], 0.0)
    pts_w = scene.cam.unproject_depth(depth, np.asarray(s["T"]))
    d = np.linalg.norm(pts_w - sphere.center, axis=-1)
    np.testing.assert_allclose(d, sphere.radius, atol=1e-4)


def _small_cfg():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    return cfg


def test_category_scene_buffers():
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2)
    cfg = _small_cfg()
    cat = CategoryScene(cfg, 80, scene.inst_dict[80], scene.sample_dict, scene.cam)
    assert cat.n_obj == 2
    assert not cat.world_frame
    n = cat.buffer.n
    assert n > 100
    s = cat.sample(32)
    assert s["origins"].shape == (32, 3)
    assert s["rgb"].dtype == np.uint8
    assert set(np.unique(s["obj_idx"])) <= {0, 1}
    # states only 0/1/2
    assert set(np.unique(s["state"])) <= {0, 1, 2}

    bg = CategoryScene(cfg, 0, scene.inst_dict[0], scene.sample_dict, scene.cam)
    assert bg.world_frame
    assert bg.buffer.n == 3 * 48 * 36


def test_object_frame_rays_hit_canonical_sphere():
    """Object-frame rays + depth must reconstruct the unit-ish canonical
    sphere: |origin + d*dir| == radius/scale for surface pixels."""
    scene = make_scene(n_frames=3, width=64, height=48, n_categories=1,
                       insts_per_cat=2, unknown_band=False)
    cfg = _small_cfg()
    cat = CategoryScene(cfg, 80, scene.inst_dict[80], scene.sample_dict, scene.cam)
    s = cat.sample(min(2000, cat.buffer.n))
    this = s["state"] == 1
    assert this.sum() > 50
    pts = s["origins"][this] + s["dirs"][this] * s["depth"][this][:, None]
    r = np.linalg.norm(pts, axis=-1)
    # canonical frame normalizes by sim(3) scale = radius -> |p| ~= 1
    np.testing.assert_allclose(r, 1.0, atol=2e-3)


def test_scene_batcher_shapes():
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2)
    cfg = _small_cfg()
    cats = [CategoryScene(cfg, c, scene.inst_dict[c], scene.sample_dict, scene.cam)
            for c in [80, 81]]
    bg = CategoryScene(cfg, 0, scene.inst_dict[0], scene.sample_dict, scene.cam)
    batcher = SceneBatcher(cats, bg)
    assert batcher.rays_per_category(120) == 4 * 120 // 2
    cat_b, bg_b = batcher.next_batch(16, 64)
    assert cat_b["rgbs"].shape == (2, 16, 3)
    assert cat_b["rgbs"].max() <= 1.0
    assert cat_b["obj_indices"].shape == (2, 16)
    assert bg_b["depth"].shape == (64,)


def test_ray_store_caps():
    """config.max_store_rays_per_cat / _bg bound the ray buffers (0 = all);
    large-scene HBM safety valve (scripts/stress_scale.py measured an
    uncapped room_0-scale store OOMing the 16 GB v5e)."""
    from catnerf_tpu.config import Config
    from catnerf_tpu.data.scene import CategoryScene
    from catnerf_tpu.data.synthetic import make_scene

    sc = make_scene(n_frames=3, width=80, height=60, n_categories=2,
                    insts_per_cat=2, seed=0)
    cfg = Config()
    cfg.max_store_rays_per_cat, cfg.max_store_rays_bg = 400, 900
    cls_ids = sorted(c for c in sc.inst_dict if c != 0)
    cats = [CategoryScene(cfg, c, sc.inst_dict[c], sc.sample_dict, sc.cam)
            for c in cls_ids]
    bg = CategoryScene(cfg, 0, sc.inst_dict[0], sc.sample_dict, sc.cam)
    assert all(c.buffer.n == 400 for c in cats)
    assert bg.buffer.n == 900
    # subsample keeps every instance represented and field shapes intact
    for c in cats:
        assert set(np.unique(c.buffer.arrays["obj_idx"])) == set(
            range(c.n_obj))
        assert c.buffer.arrays["origins"].shape == (400, 3)

    # uncapped default keeps everything
    cfg0 = Config()
    c0 = CategoryScene(cfg0, cls_ids[0], sc.inst_dict[cls_ids[0]],
                       sc.sample_dict, sc.cam)
    assert c0.buffer.n > 400

    # a VERY tight cap still keeps every instance represented: the
    # subsample is stratified per obj_idx with a floor of 1 (a uniform
    # draw over the concatenated buffer could silently drop a small
    # instance, leaving its object untrained)
    cfg_tight = Config()
    cfg_tight.max_store_rays_per_cat = 5
    for cid in cls_ids:
        ct = CategoryScene(cfg_tight, cid, sc.inst_dict[cid],
                           sc.sample_dict, sc.cam)
        assert ct.buffer.n == 5
        assert set(np.unique(ct.buffer.arrays["obj_idx"])) == set(
            range(ct.n_obj))
