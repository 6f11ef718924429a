"""End-to-end ScanNet-layout integration: serialize a synthetic scene to the
ScanNet on-disk format (color jpgs, depth pngs, instance-filt/label-filt
pngs, per-frame pose txts, intrinsic_depth.txt), load it through the real
`ScanNet` loader — edge crop, geometric-segmentation mask refinement with
caching, TSDF point-cloud accumulation, full registration with
self-pretrained uncertainty fields — and train on the result.
"""

from __future__ import annotations

import os

import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene

CLS_OFFSET = 50  # keep synthetic cls ids clear of ScanNet's background list


def write_scannet_layout(scene, out_dir: str, depth_scale: float) -> None:
    import cv2

    for sub in ("color", "depth", "instance-filt", "label-filt", "pose",
                "intrinsic"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for idx in sorted(scene.sample_dict.keys()):
        s = scene.sample_dict[idx]
        image_hw = s["image"].transpose(1, 0, 2)
        depth_hw = s["depth"].transpose(1, 0)
        inst_hw = s["obj_mask"].transpose(1, 0).copy()
        inst_hw[inst_hw < 0] = 0
        sem_hw = np.zeros_like(inst_hw)  # 0 = ScanNet background class
        for sp in scene.spheres:
            sem_hw[inst_hw == sp.inst_id] = sp.cls_id + CLS_OFFSET

        cv2.imwrite(os.path.join(out_dir, "color", f"{idx}.jpg"),
                    cv2.cvtColor(image_hw, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{idx}.png"),
                    np.round(depth_hw / depth_scale).astype(np.uint16))
        # raw instances are 0-based on disk; the loader shifts by +1
        cv2.imwrite(os.path.join(out_dir, "instance-filt", f"{idx}.png"),
                    inst_hw.astype(np.uint16))
        cv2.imwrite(os.path.join(out_dir, "label-filt", f"{idx}.png"),
                    sem_hw.astype(np.uint16))
        np.savetxt(os.path.join(out_dir, "pose", f"{idx}.txt"),
                   np.asarray(s["T"]))
    K = np.eye(4)
    K[0, 0], K[1, 1] = scene.cam.fx, scene.cam.fy
    K[0, 2], K[1, 2] = scene.cam.cx, scene.cam.cy
    np.savetxt(os.path.join(out_dir, "intrinsic", "intrinsic_depth.txt"), K)


def test_scannet_loader_full_pipeline(tmp_path):
    from catnerf_tpu.data.scannet import ScanNet
    from catnerf_tpu.train.loop import TrainingSession

    scene = make_scene(n_frames=5, width=96, height=72, n_categories=2,
                       insts_per_cat=2, seed=2)

    cfg = Config()
    cfg.dataset_format = "ScanNet"
    cfg.dataset_dir = str(tmp_path)
    cfg.width, cfg.height = 96, 72
    cfg.fx = cfg.fy = scene.cam.fx
    cfg.cx, cfg.cy = scene.cam.cx, scene.cam.cy
    cfg.mw = cfg.mh = 2                 # exercise the edge crop
    cfg.depth_scale = 1.0 / 1000.0
    cfg.load_pretrained = False
    cfg.pretrain_steps = 200
    cfg.pretrain_rays = 256
    cfg.multi_init_pose = False
    cfg.use_refined_mask = True         # geometric segmentation + caching
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32

    write_scannet_layout(scene, str(tmp_path), cfg.depth_scale)
    # corrupt a MIDDLE frame's pose to inf: the loader must skip it
    # (ref: src/dataset.py:296-300) and — regression — the refined-mask
    # caches must still line up with the right frames on reload (cache
    # files used to be matched by position in a sorted listing, so one
    # skipped frame shifted every later frame onto its neighbor's mask)
    frames = sorted(scene.sample_dict.keys())
    inf_frame = frames[len(frames) // 2]
    np.savetxt(os.path.join(str(tmp_path), "pose", f"{inf_frame}.txt"),
               np.full((4, 4), np.inf))
    data = ScanNet(cfg)

    assert 0 in data.inst_dict
    cls_ids = sorted(k for k in data.inst_dict if k != 0)
    assert cls_ids, "no object categories survived loading"
    gt_cls = sorted({sp.cls_id + CLS_OFFSET for sp in scene.spheres})
    assert all(c in gt_cls or (c - 10000) in gt_cls for c in cls_ids), (
        cls_ids, gt_cls)
    for cid in cls_ids:
        for inst_id, info in data.inst_dict[cid].items():
            assert "T_obj" in info and info["T_obj"].shape == (4, 4)

    # refined masks + inst_to_cls were cached
    assert len(os.listdir(os.path.join(str(tmp_path),
                                       "instance-refined"))) > 0
    assert len(os.listdir(os.path.join(str(tmp_path), "inst_to_cls"))) > 0

    # reload via the cached refined masks
    cfg2 = Config(**{**cfg.__dict__})
    cfg2.use_refined_mask = False
    cfg2.load_refined_mask = True
    data2 = ScanNet(cfg2)
    assert sorted(data2.inst_dict.keys()) == sorted(data.inst_dict.keys())

    # The cached reload must reproduce the fresh run's supervision masks
    # exactly — including claimed-disputed pixels (refined claims the raw
    # mask contradicts), which are voided to -1 in supervision only and
    # round-trip through the instance-disputed/ sibling cache.
    assert sorted(data2.sample_dict.keys()) == sorted(data.sample_dict.keys())
    n_claimed = 0
    for fid in data.sample_dict:
        a = data.sample_dict[fid]["obj_mask"]
        b = data2.sample_dict[fid]["obj_mask"]
        np.testing.assert_array_equal(a, b)
        n_claimed += int((a == -1).sum())
    disputed_dir = os.path.join(str(tmp_path), "instance-disputed")
    if os.path.isdir(disputed_dir) and any(
            np.load(os.path.join(disputed_dir, f)).any()
            for f in os.listdir(disputed_dir)):
        assert n_claimed > 0, ("disputed pixels cached but none voided "
                               "in supervision masks")

    # A cached reload with refined_mask_unknown DISABLED must re-apply the
    # current flag, not inherit the cache's baked-in -1/disputed semantics
    # (strict-parity recipe: the reference hard-labels dropped pixels
    # background).
    cfg3 = Config(**{**cfg.__dict__})
    cfg3.use_refined_mask = False
    cfg3.load_refined_mask = True
    cfg3.refined_mask_unknown = False
    data3 = ScanNet(cfg3)
    for fid in data3.sample_dict:
        m3 = data3.sample_dict[fid]["obj_mask"]
        assert (m3 != -1).all(), "flag-off reload inherited unknown labels"

    sess = TrainingSession(cfg, data.inst_dict, data.sample_dict)
    m = None
    for _ in range(3):
        m = sess.step_once()
    assert np.isfinite(float(m.total))


def test_scannet_loader_frame_stride(tmp_path):
    """frame_stride composes with the inf-pose skip: kept frames stay
    contiguously indexed, each paired with its own pose, and the strided
    scene still registers and trains."""
    from catnerf_tpu.data.scannet import ScanNet
    from catnerf_tpu.train.loop import TrainingSession

    scene = make_scene(n_frames=6, width=96, height=72, n_categories=1,
                       insts_per_cat=2, seed=3)

    cfg = Config()
    cfg.dataset_format = "ScanNet"
    cfg.dataset_dir = str(tmp_path)
    cfg.width, cfg.height = 96, 72
    cfg.fx = cfg.fy = scene.cam.fx
    cfg.cx, cfg.cy = scene.cam.cx, scene.cam.cy
    cfg.depth_scale = 1.0 / 1000.0
    cfg.load_registration_result = False
    cfg.load_pretrained = False
    cfg.pretrain_steps = 50
    cfg.pretrain_rays = 128
    cfg.multi_init_pose = False
    cfg.use_refined_mask = False
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    cfg.frame_stride = 2

    write_scannet_layout(scene, str(tmp_path), cfg.depth_scale)
    # frame 2 is strided over (odd frames skipped, evens kept); corrupt
    # kept frame 4's pose -> loader keeps original frames 0 and 2
    np.savetxt(os.path.join(str(tmp_path), "pose", "4.txt"),
               np.full((4, 4), np.inf))
    data = ScanNet(cfg)

    assert data.n_img == 2  # frames 0, 2 (4 inf-skipped; 1, 3, 5 strided)
    assert sorted(data.sample_dict.keys()) == [0, 1]
    np.testing.assert_allclose(data.sample_dict[0]["T"],
                               scene.sample_dict[0]["T"], atol=1e-6)
    np.testing.assert_allclose(data.sample_dict[1]["T"],
                               scene.sample_dict[2]["T"], atol=1e-6)
    for cid, objs in data.inst_dict.items():
        infos = [objs] if cid == 0 else list(objs.values())
        for info in infos:
            for fi in info["frame_info"]:
                assert fi["frame"] in data.sample_dict

    sess = TrainingSession(cfg, data.inst_dict, data.sample_dict)
    m = sess.step_once()
    assert np.isfinite(float(m.total))
