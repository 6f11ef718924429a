"""Replica dataset loader.

Parity target: `Replica` (ref: src/dataset.py:26-186). Loads all frames
eagerly (RGB / depth / instance / class pngs + traj_w_c.txt), builds the
per-instance `inst_dict[cls][inst]['frame_info']` with enlarged 2D bboxes,
remaps undefined classes to inst_id + 1000, filters background semantic
classes, and triggers/caches the registration preprocessing.

Everything uses the reference's transposed (W, H) image convention.
"""

from __future__ import annotations

import os
import pickle
import time

import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data import transforms
from catnerf_tpu.data.bbox import enlarge_bbox, mask_bbox
from catnerf_tpu.data.camera import CameraInfo

# background semantic classes (ref: src/dataset.py:59)
BACKGROUND_CLS_LIST = [5, 12, 30, 31, 40, 60, 92, 93, 95, 97, 98, 79]
BBOX_SCALE = 0.2  # (ref: src/dataset.py:61)
CLS_ID_UNDEFINED = 1000  # (ref: src/dataset.py:98)


def registration_cache_path(root_dir: str, frame_stride: int) -> str:
    """Registration cache file, keyed by the keyframe stride it was built
    under. frame_info frame ids baked into the cache change meaning with
    `frame_stride` (Replica keeps raw ids so a strided run would miss them;
    ScanNet renumbers kept frames contiguously so a stale cache would
    silently point every bbox at the wrong physical frame) — so a cache
    from one stride must never be consumed under another. stride=1 keeps
    the reference's name (ref: src/dataset.py:87-88) for cache interop."""
    name = ("inst_dict.pkl" if frame_stride == 1
            else f"inst_dict_stride{frame_stride}.pkl")
    return os.path.join(root_dir, name)


class Replica:
    def __init__(self, cfg: Config, run_registration: bool = True):
        import cv2

        self.name = "replica"
        self.root_dir = cfg.dataset_dir
        self.cfg = cfg
        if not os.path.isdir(self.root_dir):
            raise FileNotFoundError(
                f"Replica dataset not found at {self.root_dir!r} (from the "
                "config's dataset.path, resolved against the CWD / config "
                "dir) — expected the reference layout with traj_w_c.txt, "
                "rgb/, depth/, semantic_instance/, semantic_class/; see "
                "MIGRATION.md")
        traj = np.loadtxt(os.path.join(self.root_dir, "traj_w_c.txt"),
                          delimiter=" ").reshape(-1, 4, 4)
        self.Twc = traj
        self.cam = CameraInfo.from_config(cfg)
        self.n_img = len(os.listdir(os.path.join(self.root_dir, "depth")))
        self._cv2 = cv2

        self.inst_dict: dict = {}
        self.sample_dict: dict = {}
        self.get_all_frames()

        result_file = registration_cache_path(self.root_dir, cfg.frame_stride)
        if cfg.load_registration_result and os.path.exists(result_file):
            # tolerant reader: a REFERENCE-preprocessed cache (with pickled
            # open3d OBB objects, ref: src/dataset.py:87-88) loads without
            # open3d; unrecoverable bounds are recomputed from the frames
            from catnerf_tpu.data.interop import (
                load_reference_inst_dict, repair_inst_dict)

            self.inst_dict = load_reference_inst_dict(result_file)
            n = repair_inst_dict(self.inst_dict, self.sample_dict, self.cam,
                                 name=self.name)
            if n:
                print(f"recomputed {n} bounds from reference cache")
        elif run_registration:
            from catnerf_tpu.geometry.registration import run_registration

            run_registration(self.inst_dict, self.sample_dict, self.cam, cfg,
                             name=self.name)
            for cls_id in self.inst_dict:
                if cls_id == 0:
                    self.inst_dict[0].pop("pcs", None)
                else:
                    for inst in self.inst_dict[cls_id].values():
                        inst.pop("pcs", None)
                        inst.pop("pcs_rgb", None)
            with open(result_file, "wb") as f:
                pickle.dump(self.inst_dict, f)

    def get_all_frames(self) -> None:
        cv2 = self._cv2
        t1 = time.time()
        # frame_stride: in-loader keyframe subsampling; the reference makes
        # users pre-select 1-in-10 frames on disk by hand (ref: README.md:34)
        for idx in range(0, self.n_img, self.cfg.frame_stride):
            rgb_file = os.path.join(self.root_dir, "rgb", f"rgb_{idx}.png")
            depth_file = os.path.join(self.root_dir, "depth", f"depth_{idx}.png")
            inst_file = os.path.join(self.root_dir, "semantic_instance",
                                     f"semantic_instance_{idx}.png")
            obj_file = os.path.join(self.root_dir, "semantic_class",
                                    f"semantic_class_{idx}.png")

            # transposed (W, H) layout (ref: src/dataset.py:105-109)
            depth = cv2.imread(depth_file, -1).astype(np.float32).transpose(1, 0)
            image = cv2.imread(rgb_file).astype(np.uint8)
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB).transpose(1, 0, 2)
            obj = cv2.imread(obj_file, cv2.IMREAD_UNCHANGED).astype(np.int32).transpose(1, 0)
            inst = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED).astype(np.int32).transpose(1, 0)

            obj_presence = np.zeros_like(obj)
            cls_list, inst_list, batch_masks = [], [], []
            for inst_id in np.unique(inst):
                inst_mask = inst == inst_id
                sem_cls = np.unique(obj[inst_mask])
                assert sem_cls.shape[0] == 1, (
                    f"instance {inst_id} spans semantic classes {sem_cls}"
                )
                sem_cls = int(sem_cls[0])
                if sem_cls in BACKGROUND_CLS_LIST:
                    continue
                batch_masks.append(inst_mask)
                if sem_cls == 0 and inst_id != 0:
                    # undefined class -> unique pseudo-class
                    # (ref: src/dataset.py:129-130)
                    cls_list.append(int(inst_id) + CLS_ID_UNDEFINED)
                else:
                    cls_list.append(sem_cls)
                inst_list.append(int(inst_id))

            for i, mask in enumerate(batch_masks):
                bb = mask_bbox(mask)
                if bb is None:
                    continue
                rmin, rmax, cmin, cmax = bb
                if rmax - rmin <= 10 or cmax - cmin <= 10:
                    # too small (ref: src/dataset.py:139-143)
                    continue
                enlarged = enlarge_bbox([cmin, rmin, cmax, rmax], BBOX_SCALE,
                                        w=obj.shape[1], h=obj.shape[0])
                if enlarged is None:
                    continue
                sem_cls = cls_list[i]
                inst_id = inst_list[i]
                obj_presence[mask] = 1
                bbox = np.array([enlarged[1], enlarged[3],
                                 enlarged[0], enlarged[2]])  # [w0,w1,h0,h1]
                self.inst_dict.setdefault(sem_cls, {}).setdefault(
                    inst_id, {"frame_info": []}
                )["frame_info"].append({"frame": idx, "bbox": bbox})

            inst[obj_presence == 0] = 0  # background (ref: src/dataset.py:158)

            if idx == 0:
                self.inst_dict[0] = {"frame_info": []}
            self.inst_dict[0]["frame_info"].append({
                "frame": idx,
                "bbox": np.array([0, inst.shape[0], 0, inst.shape[1]]),
            })

            depth = transforms.depth_filter(
                transforms.depth_scale(depth, self.cfg.depth_scale),
                self.cfg.max_depth)

            self.sample_dict[idx] = {
                "image": image, "depth": depth, "obj_mask": inst,
                "T": self.Twc[idx], "frame_id": idx,
            }
        print(f"get_all_frames took {time.time() - t1:.1f}s "
              f"({len(self.sample_dict)} of {self.n_img} frames, "
              f"stride {self.cfg.frame_stride})")

    def __len__(self) -> int:
        return len(self.sample_dict)

    def __getitem__(self, idx: int):
        # positional over KEPT frames: sample_dict keys stay raw frame ids
        # (frame_info references them), so under frame_stride>1 the keys
        # are sparse and `for i in range(len(data)): data[i]` would KeyError
        # on the raw-id dict
        return self.sample_dict[self.frame_ids[idx]]

    @property
    def frame_ids(self) -> list[int]:
        return sorted(self.sample_dict)


def get_dataset(cfg: Config, run_registration: bool = True):
    """(ref: src/dataset.py:16-24)."""
    if cfg.dataset_format == "Replica":
        return Replica(cfg, run_registration=run_registration)
    if cfg.dataset_format == "ScanNet":
        from catnerf_tpu.data.scannet import ScanNet

        return ScanNet(cfg, run_registration=run_registration)
    raise ValueError(f"Dataset format {cfg.dataset_format} not found")
