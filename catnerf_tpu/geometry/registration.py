"""Category-level registration orchestration (L2).

Parity target: `src/category_registration.py` — three stages driven from the
dataset constructor and cached to `inst_dict.pkl`:

  1. get_all_poses        — per-instance world clouds (unproject / TSDF)
  2. get_uncertainty_fields — template completeness scoring via pretrained
                             vMAP fields (runs on TPU)
  3. align_poses          — TEASER-style multi-init alignment to the
                             template + Chamfer-thresholded
                             subcategorization until fixpoint

The inst_dict contract matches the reference: per instance
{'frame_info', 'pcs', 'T_obj', 'bbox3D'}; background gets {'bbox3D'}.
"""

from __future__ import annotations

import os
import time

import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.geometry.obb import (
    get_bound,
    get_obb,
    get_pose_from_pointcloud,
    get_possible_transform_from_bbox,
)
from catnerf_tpu.geometry.pointcloud import (
    accumulate_pointcloud,
    accumulate_pointcloud_tsdf,
    chamfer_unidirectional,
)
from catnerf_tpu.geometry.teaser import teaser_fpfh_icp
from catnerf_tpu.geometry.uncertainty import spherical_ray_grid, uncertainty_score
from catnerf_tpu.ops.sim3 import transform_pointcloud_np


def get_all_poses(inst_dict: dict, sample_dict: dict, cam: CameraInfo,
                  name: str = "replica", max_depth: float = 8.0) -> None:
    """Stage 1 (ref: src/category_registration.py:18-56)."""
    t1 = time.time()
    for cls_id, inst_dict_cls in inst_dict.items():
        if cls_id == 0:
            frame_info = inst_dict_cls["frame_info"]
            if name == "replica":
                bg_pcs = accumulate_pointcloud(0, frame_info, sample_dict, cam)
            else:
                bg_pcs = accumulate_pointcloud_tsdf(
                    0, frame_info, sample_dict, cam, max_depth=max_depth)
            bbox3d = get_bound(bg_pcs)
            inst_dict_cls["bbox3D"] = bbox3d
            inst_dict_cls["pcs"] = bg_pcs
        else:
            for inst_id, info in inst_dict_cls.items():
                if name == "replica":
                    info["pcs"] = accumulate_pointcloud(
                        inst_id, info["frame_info"], sample_dict, cam)
                else:
                    if "pcs" not in info:
                        print(f"{inst_id} missing from refined segmentation")
                        info["T_obj"] = np.eye(4)
                        info["pcs"] = None
                    else:
                        from catnerf_tpu.native.lib import geomlib

                        info["pcs"] = geomlib.voxel_downsample(
                            np.asarray(info["pcs"], np.float32), 0.01)
    print(f"get_all_poses took {time.time() - t1:.1f}s")


def coverage_score(points: np.ndarray, name: str = "replica") -> int:
    """First-party fallback template score when no pretrained vMAP fields
    exist (the reference hard-requires them and raises NotImplementedError,
    ref: src/category_registration.py:93-94): count spherical directions
    (of the same 100x100 grid) whose cone contains observed surface points —
    a completeness proxy equivalent in role to the reliability count."""
    pts = np.asarray(points)
    center = ((pts.max(0) + pts.min(0)) / 2.0 if name == "replica"
              else pts.mean(0))
    rel = pts - center
    norm = np.linalg.norm(rel, axis=-1, keepdims=True) + 1e-12
    rel = rel / norm
    dirs = spherical_ray_grid()
    # direction observed if any point lies within ~2.3 deg of it
    sim = rel @ dirs.T  # (n_pts, n_dirs)
    return int((sim.max(axis=0) > np.cos(np.deg2rad(2.3))).sum())


def get_uncertainty_fields(inst_dict: dict, bbox3d_dict: dict,
                           count_dict: dict, field_dict: dict, cfg: Config,
                           name: str = "replica",
                           load_pretrained: bool = True,
                           sample_dict: dict | None = None,
                           cam=None) -> None:
    """Stage 2 (ref: src/category_registration.py:58-177). Fills
    count_dict[cls][obj] with the completeness score, bbox3d_dict with a
    per-object bound, field_dict with converted field params (if any).

    load_pretrained=False (where the reference raises NotImplementedError,
    ref: src/category_registration.py:93-94): if sample_dict+cam are given,
    per-object fields are pretrained on-the-fly (geometry/field_pretrain.py)
    and scored with the real uncertainty heuristic; otherwise the geometric
    coverage_score proxy is used."""
    import jax

    # Collect scoreable objects (stable order).
    todo = []
    for cls_id, inst_dict_cls in inst_dict.items():
        if cls_id == 0:
            continue
        count_dict.setdefault(cls_id, {})
        bbox3d_dict.setdefault(cls_id, {})
        field_dict.setdefault(cls_id, {})
        for obj_id, info in inst_dict_cls.items():
            if info.get("pcs") is None or len(info["pcs"]) == 0:
                count_dict[cls_id][obj_id] = 0
                bbox3d_dict[cls_id][obj_id] = None
            else:
                todo.append((cls_id, obj_id, info))

    pretrained_fields = None
    if (not load_pretrained and sample_dict is not None and cam is not None
            and todo):
        from catnerf_tpu.geometry.field_pretrain import pretrain_object_fields

        objects = [(obj_id, info["frame_info"], info["pcs"])
                   for cls_id, obj_id, info in todo]
        pretrained_fields = pretrain_object_fields(
            objects, sample_dict, cam, cfg, steps=cfg.pretrain_steps,
            n_rays=cfg.pretrain_rays)

    for i, (cls_id, obj_id, info) in enumerate(todo):
        if load_pretrained:
            from catnerf_tpu.train.checkpoint import load_vmap_pth

            ckpt_dir = os.path.join(cfg.weight_root, "ckpt", str(obj_id))
            ckpt_paths = sorted(os.listdir(ckpt_dir))
            field = load_vmap_pth(os.path.join(ckpt_dir, ckpt_paths[-1]))
        elif pretrained_fields is not None:
            field = pretrained_fields[i]
        else:
            bbox3d_dict[cls_id][obj_id] = None
            count_dict[cls_id][obj_id] = coverage_score(info["pcs"], name)
            continue
        field_dict[cls_id][obj_id] = field
        bbox3d_dict[cls_id][obj_id] = field.get("bbox")
        count, _, _ = uncertainty_score(
            field, info["pcs"], name=name, key=jax.random.PRNGKey(obj_id))
        count_dict[cls_id][obj_id] = count


def align_poses(inst_dict: dict, bbox3d_dict: dict, count_dict: dict,
                field_dict: dict, name: str = "replica",
                multi_init_pose: bool = True, eta1: float = 0.06,
                eta2: float = 0.15, eta3: float = 0.12) -> None:
    """Stage 3 (ref: src/category_registration.py:179-324)."""
    t1 = time.time()
    cls_id_add = 100 if name == "replica" else 10000

    while bbox3d_dict:
        for cls_id in list(bbox3d_dict.keys()):
            obj_ids = list(bbox3d_dict[cls_id].keys())
            counts = [count_dict[cls_id][o] for o in count_dict[cls_id]]
            idx_repr = int(np.argmax(counts)) if len(counts) > 1 else 0
            inst_dict_cls = inst_dict[cls_id]

            obj_id_repr = obj_ids[idx_repr]
            template_pts = inst_dict_cls[obj_id_repr]["pcs"]
            T_obj, bbox3d = get_pose_from_pointcloud(template_pts)
            if T_obj is None:
                T_obj = np.eye(4)
            inst_dict_cls[obj_id_repr]["T_obj"] = T_obj
            if bbox3d is not None:
                inst_dict_cls[obj_id_repr]["bbox3D"] = bbox3d

            other_obj_ids = [o for i, o in enumerate(obj_ids) if i != idx_repr]
            if not other_obj_ids:
                bbox3d_dict.pop(cls_id)
                continue

            T_obj_template = np.copy(T_obj)
            scale_template = np.linalg.det(T_obj_template[:3, :3]) ** (1 / 3)
            T_obj_template[:3, :3] /= scale_template
            template_np_w = np.asarray(template_pts)

            if multi_init_pose:
                transform_list = get_possible_transform_from_bbox()
            else:
                transform_list = [np.eye(4)]
            targets = [transform_pointcloud_np(template_np_w, T)
                       for T in transform_list]

            for obj_id in other_obj_ids:
                source_np_w = np.asarray(inst_dict_cls[obj_id]["pcs"])
                scale_source = np.max(
                    source_np_w.max(0) - source_np_w.min(0)) / 2.0

                # register source onto each rotated template, pick best by
                # normalized unidirectional chamfer
                # (ref: category_registration.py:241-267). The 24 init-pose
                # solves are independent and the native solver releases the
                # GIL, so they run on a thread pool (the reference runs them
                # sequentially).
                def solve_one(args):
                    T_init, target = args
                    R_rel, t_rel = teaser_fpfh_icp(
                        source_np_w, target, voxel_size=0.1, spc=True)
                    T_cand = np.eye(4)
                    T_cand[:3, :3] = R_rel
                    T_cand[:3, 3:] = t_rel
                    T_rel = np.linalg.inv(T_init) @ T_cand
                    src_tf = transform_pointcloud_np(source_np_w, T_rel)
                    cd = chamfer_unidirectional(
                        src_tf, template_np_w) / scale_source
                    return cd, T_rel, src_tf

                from concurrent.futures import ThreadPoolExecutor

                pairs = list(zip(transform_list, targets))
                workers = min(8, len(pairs), os.cpu_count() or 1)
                if workers > 1:
                    with ThreadPoolExecutor(max_workers=workers) as pool:
                        results = list(pool.map(solve_one, pairs))
                else:
                    results = [solve_one(p_) for p_ in pairs]
                chamfer_unidir, T_rel, src_tf = min(results,
                                                    key=lambda r: r[0])
                print(f"registered obj {obj_id} in cls {cls_id}: "
                      f"chamfer={chamfer_unidir:.4f}")

                if chamfer_unidir > eta2:
                    subcategorize = True
                elif chamfer_unidir < eta1:
                    subcategorize = False
                else:
                    chamfer_opp = chamfer_unidirectional(
                        template_np_w, src_tf) / scale_template
                    subcategorize = chamfer_opp > eta3

                if subcategorize:
                    cls_id_sub = cls_id + cls_id_add
                    inst_dict.setdefault(cls_id_sub, {})[obj_id] = \
                        inst_dict_cls[obj_id]
                    count_dict.setdefault(cls_id_sub, {})[obj_id] = \
                        count_dict[cls_id][obj_id]
                    bbox3d_dict.setdefault(cls_id_sub, {})[obj_id] = \
                        bbox3d_dict[cls_id][obj_id]
                    if cls_id in field_dict and obj_id in field_dict[cls_id]:
                        field_dict.setdefault(cls_id_sub, {})[obj_id] = \
                            field_dict[cls_id].pop(obj_id)
                    inst_dict_cls.pop(obj_id, None)
                    count_dict[cls_id].pop(obj_id, None)
                    bbox3d_dict[cls_id].pop(obj_id, None)
                else:
                    T_obj_new = np.linalg.inv(T_rel) @ T_obj_template
                    inst_dict_cls[obj_id]["T_obj"] = T_obj_new
                    get_obb(inst_dict_cls[obj_id])

            bbox3d_dict.pop(cls_id)
    print(f"align_poses took {time.time() - t1:.1f}s")


def run_registration(inst_dict: dict, sample_dict: dict, cam: CameraInfo,
                     cfg: Config, name: str = "replica") -> None:
    """Full preprocessing pipeline, mutating inst_dict in place
    (invoked from the dataset ctor, ref: src/dataset.py:67-88)."""
    bbox3d_dict: dict = {}
    count_dict: dict = {}
    field_dict: dict = {}
    get_all_poses(inst_dict, sample_dict, cam, name=name,
                  max_depth=cfg.max_depth)
    get_uncertainty_fields(inst_dict, bbox3d_dict, count_dict, field_dict,
                           cfg, name=name,
                           load_pretrained=cfg.load_pretrained,
                           sample_dict=sample_dict, cam=cam)
    align_poses(inst_dict, bbox3d_dict, count_dict, field_dict, name=name,
                multi_init_pose=cfg.multi_init_pose, eta1=cfg.eta1,
                eta2=cfg.eta2, eta3=cfg.eta3)
