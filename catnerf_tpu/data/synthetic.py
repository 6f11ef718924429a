"""Synthetic RGB-D scene generator.

Analytic ray-cast scenes (colored spheres inside a box room) emitting the
same `inst_dict` / `sample_dict` contract as the real dataset loaders
(ref: src/dataset.py:93-180). Used by tests, the end-to-end smoke run, and
`bench.py` — the reference has no equivalent (it has no tests at all,
SURVEY.md §4), so shapes/conventions follow the Replica loader.

Conventions (matching the reference):
  images/depth/masks use the transposed (W, H) layout; depth is z-depth in
  meters; obj_mask holds instance ids with 0 = background, -1 = unknown.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from catnerf_tpu.data.bbox import enlarge_bbox, mask_bbox
from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.data.scene import OrientedBBox


@dataclasses.dataclass
class Sphere:
    center: np.ndarray
    radius: float
    color: np.ndarray  # (3,) in [0, 1]
    inst_id: int
    cls_id: int


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """Camera-to-world pose with +z forward (OpenCV convention)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(np.asarray(up, np.float64), fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, eye
    return T


def _ray_sphere(origins, dirs, center, radius):
    """Smallest positive t with origins + t*dirs on the sphere; inf if none.
    dirs need not be normalized (t stays in z-depth units when dir_z == 1
    only if dirs are camera rays rotated to world — we solve in world frame
    with unnormalized dirs so t is the camera z-depth)."""
    oc = origins - center
    a = np.sum(dirs * dirs, axis=-1)
    b = 2.0 * np.sum(oc * dirs, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - 4 * a * c
    hit = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    t = np.where(t0 > 1e-6, t0, t1)
    return np.where(hit & (t > 1e-6), t, np.inf)


def _ray_box_interior(origins, dirs, box_min, box_max):
    """t of the farthest plane intersection inside the box (room walls seen
    from inside)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t_min_planes = (box_min - origins) / dirs
        t_max_planes = (box_max - origins) / dirs
    t_far = np.maximum(t_min_planes, t_max_planes)
    return np.min(t_far, axis=-1)


@dataclasses.dataclass
class SyntheticScene:
    inst_dict: dict
    sample_dict: dict
    cam: CameraInfo
    spheres: list[Sphere]


def make_scene(n_frames: int = 6, width: int = 80, height: int = 60,
               n_categories: int = 2, insts_per_cat: int = 2,
               seed: int = 0, unknown_band: bool = True) -> SyntheticScene:
    """Build a synthetic scene: `n_categories` sphere categories with
    `insts_per_cat` instances each inside a 6x6x3 m room, cameras orbiting
    the center."""
    rng = np.random.default_rng(seed)
    fx = fy = 0.8 * width
    cam = CameraInfo(width, height, fx, fy, (width - 1) / 2.0, (height - 1) / 2.0)

    box_min = np.array([-3.0, -1.5, -3.0])
    box_max = np.array([3.0, 1.5, 3.0])

    spheres: list[Sphere] = []
    inst_id = 1
    # keep crowded rings non-overlapping: ring spacing is 2*pi*1.5/total, so
    # shrink radii once the default sizes would swallow neighbours
    total = n_categories * insts_per_cat
    size_factor = min(1.0, 6.0 / total)
    for c in range(n_categories):
        cls_id = 80 + c
        base_radius = (0.3 + 0.1 * c) * size_factor
        for k in range(insts_per_cat):
            # interleave categories around the ring (k-major) so instances
            # of the same category sit apart and large spheres don't occlude
            # each other from the orbiting cameras
            ang = (2 * np.pi * (k * n_categories + c)
                   / (n_categories * insts_per_cat))
            center = np.array([1.5 * np.cos(ang), 0.0, 1.5 * np.sin(ang)])
            color = rng.uniform(0.2, 1.0, 3)
            spheres.append(Sphere(center, base_radius * (1 + 0.2 * k), color,
                                  inst_id, cls_id))
            inst_id += 1

    wall_colors = rng.uniform(0.3, 0.8, (6, 3))
    light_dir = np.array([0.3, -0.8, 0.5])
    light_dir /= np.linalg.norm(light_dir)

    inst_dict: dict = {}
    sample_dict: dict = {}
    dirs_cache = cam.rays_dir_cache.reshape(-1, 3)

    for f in range(n_frames):
        ang = 2 * np.pi * f / n_frames
        # orbit with varying elevation/radius so object surfaces are seen
        # from above AND below (a single fixed-height ring leaves bottoms
        # unobserved and bounds reconstruction accuracy)
        h = 1.1 * np.sin(2.0 * ang + 0.7)
        r = 2.4 - 0.3 * np.cos(3.0 * ang)
        eye = np.array([r * np.cos(ang), h, r * np.sin(ang)])
        T_wc = look_at(eye, np.zeros(3))
        R, t = T_wc[:3, :3], T_wc[:3, 3]
        dirs_w = dirs_cache @ R.T
        origins = np.broadcast_to(t, dirs_w.shape)

        t_best = _ray_box_interior(origins, dirs_w, box_min, box_max)
        inst_map = np.zeros(dirs_w.shape[0], dtype=np.int32)
        cls_map = np.zeros(dirs_w.shape[0], dtype=np.int32)
        for s in spheres:
            ts = _ray_sphere(origins, dirs_w, s.center, s.radius)
            closer = ts < t_best
            t_best = np.where(closer, ts, t_best)
            inst_map = np.where(closer, s.inst_id, inst_map)
            cls_map = np.where(closer, s.cls_id, cls_map)

        pts = origins + t_best[:, None] * dirs_w
        rgb = np.empty((dirs_w.shape[0], 3))
        # walls: color by dominant hit axis, mild distance shading
        axis = np.argmax(
            np.stack([
                np.minimum(np.abs(pts[:, i] - box_min[i]),
                           np.abs(pts[:, i] - box_max[i]))
                for i in range(3)
            ], -1) * -1, axis=-1)
        rgb = wall_colors[axis] * (0.7 + 0.3 / (1 + 0.1 * t_best[:, None]))
        for s in spheres:
            m = inst_map == s.inst_id
            normal = (pts[m] - s.center) / s.radius
            shade = 0.4 + 0.6 * np.clip(-normal @ light_dir, 0, 1)
            rgb[m] = s.color * shade[:, None]

        image = (np.clip(rgb, 0, 1) * 255).astype(np.uint8).reshape(width, height, 3)
        depth = t_best.astype(np.float32).reshape(width, height)
        obj_mask = inst_map.reshape(width, height)

        if unknown_band:
            # thin unknown band at object silhouettes (state 2 in buffers)
            edge = np.zeros_like(obj_mask, dtype=bool)
            om = obj_mask
            edge[1:] |= om[1:] != om[:-1]
            edge[:, 1:] |= om[:, 1:] != om[:, :-1]
            obj_mask = np.where(edge & (om > 0), -1, om)

        sample_dict[f] = {"image": image, "depth": depth, "obj_mask": obj_mask,
                          "T": T_wc, "frame_id": f}

        # per-instance frame_info with enlarged 2D bboxes
        # (ref: src/dataset.py:135-156)
        for s in spheres:
            mask = inst_map.reshape(width, height) == s.inst_id
            bb = mask_bbox(mask)
            if bb is None:
                continue
            rmin, rmax, cmin, cmax = bb  # r: width axis, c: height axis
            if rmax - rmin <= 2 or cmax - cmin <= 2:
                continue
            enlarged = enlarge_bbox([cmin, rmin, cmax, rmax], 0.2,
                                    w=height, h=width)
            if enlarged is None:
                # tiny projection: keep the tight box (the reference drops
                # such crops, but synthetic tests need every instance)
                enlarged = [cmin, rmin, cmax, rmax]
            # stored as [w0, w1, h0, h1] (ref: src/dataset.py:152)
            bbox = np.array([enlarged[1], enlarged[3], enlarged[0], enlarged[2]])
            inst_dict.setdefault(s.cls_id, {}).setdefault(
                s.inst_id, {"frame_info": []}
            )["frame_info"].append({"frame": f, "bbox": bbox})

        inst_dict.setdefault(0, {"frame_info": []})["frame_info"].append(
            {"frame": f, "bbox": np.array([0, width, 0, height])}
        )

    # registration artifacts: known ground-truth object poses
    for s in spheres:
        if s.cls_id in inst_dict and s.inst_id in inst_dict[s.cls_id]:
            T_obj = np.eye(4)
            T_obj[:3, :3] *= s.radius  # sim(3) scale = max(extent)/2
            T_obj[:3, 3] = s.center
            info = inst_dict[s.cls_id][s.inst_id]
            info["T_obj"] = T_obj
            info["bbox3D"] = OrientedBBox(
                center=s.center.copy(), R=np.eye(3),
                extent=np.full(3, 2 * s.radius),
            )

    room_center = (box_min + box_max) / 2
    inst_dict[0]["bbox3D"] = OrientedBBox(
        center=room_center, R=np.eye(3), extent=(box_max - box_min)
    )

    return SyntheticScene(inst_dict=inst_dict, sample_dict=sample_dict,
                          cam=cam, spheres=spheres)
