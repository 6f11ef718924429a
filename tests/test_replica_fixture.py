"""End-to-end Replica-layout integration: serialize a synthetic scene to the
on-disk format the reference consumes (rgb/depth/semantic pngs +
traj_w_c.txt), load it through the real `Replica` loader with the FULL
registration pipeline (self-pretrained uncertainty fields, TEASER-style
alignment), verify the inst_dict contract and the registration cache, and
run a few training steps on the result.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene

BG_CLS = 5  # in replica.BACKGROUND_CLS_LIST


def write_replica_layout(scene, out_dir: str, depth_scale: float) -> None:
    import cv2

    for sub in ("rgb", "depth", "semantic_instance", "semantic_class"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    poses = []
    for idx in sorted(scene.sample_dict.keys()):
        s = scene.sample_dict[idx]
        # synthetic arrays use the transposed (W, H) layout; the loader
        # transposes after imread, so serialize as (H, W).
        image_hw = s["image"].transpose(1, 0, 2)  # RGB
        depth_hw = s["depth"].transpose(1, 0)
        inst_hw = s["obj_mask"].transpose(1, 0).copy()
        inst_hw[inst_hw < 0] = 0  # loader has no 'unknown' id on disk
        cls_hw = np.full_like(inst_hw, BG_CLS)
        for sp in scene.spheres:
            cls_hw[inst_hw == sp.inst_id] = sp.cls_id

        cv2.imwrite(os.path.join(out_dir, "rgb", f"rgb_{idx}.png"),
                    cv2.cvtColor(image_hw, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(out_dir, "depth", f"depth_{idx}.png"),
                    np.round(depth_hw / depth_scale).astype(np.uint16))
        cv2.imwrite(
            os.path.join(out_dir, "semantic_instance",
                         f"semantic_instance_{idx}.png"),
            inst_hw.astype(np.uint16))
        cv2.imwrite(
            os.path.join(out_dir, "semantic_class",
                         f"semantic_class_{idx}.png"),
            cls_hw.astype(np.uint16))
        poses.append(np.asarray(s["T"]).reshape(-1))
    np.savetxt(os.path.join(out_dir, "traj_w_c.txt"),
               np.stack(poses), delimiter=" ")


def test_replica_loader_full_pipeline(tmp_path):
    from catnerf_tpu.data.replica import Replica
    from catnerf_tpu.train.loop import TrainingSession

    scene = make_scene(n_frames=6, width=96, height=72, n_categories=2,
                       insts_per_cat=2, seed=1)

    cfg = Config()
    cfg.dataset_dir = str(tmp_path)
    cfg.width, cfg.height = 96, 72
    cfg.fx = cfg.fy = scene.cam.fx
    cfg.cx, cfg.cy = scene.cam.cx, scene.cam.cy
    cfg.depth_scale = 1.0 / 1000.0
    cfg.load_pretrained = False      # exercise self-pretraining
    cfg.pretrain_steps = 200
    cfg.pretrain_rays = 256
    cfg.multi_init_pose = False      # keep alignment fast on CPU
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32

    write_replica_layout(scene, str(tmp_path), cfg.depth_scale)
    data = Replica(cfg)

    # inst_dict contract: background + the synthetic categories
    assert 0 in data.inst_dict
    cls_ids = sorted(k for k in data.inst_dict if k != 0)
    gt_cls = sorted({sp.cls_id for sp in scene.spheres})
    # subcategorization may split a category (cls + 100)
    assert all(c in gt_cls or (c - 100) in gt_cls for c in cls_ids), (
        cls_ids, gt_cls)
    for cid in cls_ids:
        for inst_id, info in data.inst_dict[cid].items():
            assert "T_obj" in info and info["T_obj"].shape == (4, 4)
            assert "frame_info" in info and len(info["frame_info"]) > 0
    assert "bbox3D" in data.inst_dict[0]

    # registration result cached
    assert os.path.exists(os.path.join(str(tmp_path), "inst_dict.pkl"))

    # a second construction loads the cache (no re-registration)
    data2 = Replica(cfg)
    with open(os.path.join(str(tmp_path), "inst_dict.pkl"), "rb") as f:
        cached = pickle.load(f)
    assert sorted(cached.keys()) == sorted(data2.inst_dict.keys())

    # the loaded scene trains
    sess = TrainingSession(cfg, data.inst_dict, data.sample_dict)
    for _ in range(3):
        m = sess.step_once()
    assert np.isfinite(float(m.total))


def test_replica_loader_frame_stride(tmp_path):
    """cfg.frame_stride subsamples keyframes in-loader (the reference makes
    users pre-select 1-in-10 frames on disk by hand, ref: README.md:34):
    every k-th frame loads, poses stay aligned with their frames, and the
    strided scene still trains."""
    from catnerf_tpu.data.replica import Replica
    from catnerf_tpu.train.loop import TrainingSession

    scene = make_scene(n_frames=6, width=96, height=72, n_categories=1,
                       insts_per_cat=2, seed=1)

    cfg = Config()
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
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    cfg.frame_stride = 2

    write_replica_layout(scene, str(tmp_path), cfg.depth_scale)
    data = Replica(cfg)

    assert len(data) == 3  # 6 frames, stride 2 -> frames 0, 2, 4
    assert sorted(data.sample_dict.keys()) == [0, 2, 4]
    for idx in (0, 2, 4):
        # pose alignment: each kept frame carries ITS OWN trajectory row
        np.testing.assert_allclose(data.sample_dict[idx]["T"],
                                   scene.sample_dict[idx]["T"], atol=1e-6)
    # frame_info only references loaded frames
    for cid, objs in data.inst_dict.items():
        infos = [objs] if cid == 0 else list(objs.values())
        for info in infos:
            for fi in info["frame_info"]:
                assert fi["frame"] in data.sample_dict

    sess = TrainingSession(cfg, data.inst_dict, data.sample_dict)
    m = sess.step_once()
    assert np.isfinite(float(m.total))
