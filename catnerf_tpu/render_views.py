"""Novel-view RGB-D rendering from trained fields.

A capability the reference does not ship (its only visual output is mesh
export, ref: src/trainer.py:62-123): ray-march the trained category /
background fields from arbitrary camera poses and emit RGB, depth, and
opacity images. Reuses the training stack end-to-end — camera ray cache
(data/camera.py), chunked field evaluation (mesher/meshing.eval_points),
and the exact UniSurf compositing math the loss trains against
(ops/render.py, ref: src/render_rays.py:25-50) — so rendered views are a
faithful readout of what the optimizer saw.

CLI: python -m catnerf_tpu.render_views --logdir <dir> [--synthetic |
--config <json>] --out <dir> [--n-views 8] [--width 320 --height 240]
Renders an orbit around every object (canonical frame for multi-instance
categories, world frame otherwise) plus the background from dataset camera
poses when available.
"""

from __future__ import annotations

import os

import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo, ray_dirs_cache
from catnerf_tpu.mesher.meshing import eval_points


def look_at(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera-to-target-frame pose: z forward (towards target), matching the
    pipeline's z-depth ray convention (data/camera.py)."""
    eye = np.asarray(eye, np.float64)
    z = np.asarray(target, np.float64) - eye
    z = z / (np.linalg.norm(z) + 1e-12)
    up = np.asarray(up, np.float64)
    if abs(np.dot(z, up)) > 0.999:  # degenerate: looking along up
        up = np.array([0.0, 1.0, 0.0]) if abs(z[2]) > 0.9 else np.array(
            [0.0, 0.0, 1.0])
    x = np.cross(z, up)
    x = x / (np.linalg.norm(x) + 1e-12)
    y = np.cross(z, x)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, eye
    return T.astype(np.float32)


def orbit_poses(n: int, radius: float, center=(0.0, 0.0, 0.0),
                elevation_deg: float = 25.0) -> list[np.ndarray]:
    """n camera poses on a circle of `radius` around `center`, looking in."""
    center = np.asarray(center, np.float64)
    el = np.deg2rad(elevation_deg)
    poses = []
    for i in range(n):
        az = 2.0 * np.pi * i / n
        eye = center + radius * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)])
        poses.append(look_at(eye, center))
    return poses


def _composite(occ: np.ndarray, rgb: np.ndarray, z: np.ndarray):
    """UniSurf occupancy -> termination -> composite (numpy mirror of
    ops/render.py, ref: src/render_rays.py:25-50). occ [..., B],
    rgb [..., B, 3], z [B]."""
    free = np.concatenate(
        [np.ones_like(occ[..., :1]), 1.0 - occ[..., :-1] + 1e-10], axis=-1)
    term = occ * np.cumprod(free, axis=-1)
    img = (term[..., None] * rgb).sum(-2)
    depth = (term * z).sum(-1)
    alpha = term.sum(-1)
    return img, depth, alpha


def render_view(params: dict, cfg: Config, T: np.ndarray, cam: CameraInfo,
                *, near: float, far: float, shape_code=None,
                texture_code=None, is_background: bool = False,
                n_bins: int = 96, chunk: int = 262144):
    """Render one view. T: camera-to-field-frame pose (field frame =
    canonical object frame, or world for background/single-instance).

    Returns (rgb [W, H, 3] in [0,1], depth [W, H], alpha [W, H]) in the
    pipeline's transposed (W, H) layout."""
    dirs_c = ray_dirs_cache(cam.width, cam.height, cam.fx, cam.fy,
                            cam.cx, cam.cy)
    R, o = T[:3, :3], T[:3, 3]
    dirs = dirs_c @ R.T  # (W, H, 3) field-frame, z-depth convention
    # bin midpoints (deterministic render: no stratified jitter)
    edges = np.linspace(near, far, n_bins + 1, dtype=np.float32)
    z = 0.5 * (edges[:-1] + edges[1:])
    pts = o + dirs[:, :, None, :] * z[None, None, :, None]  # (W, H, B, 3)
    occ, rgb = eval_points(
        pts.reshape(-1, 3), params, cfg, shape_code, texture_code,
        is_background=is_background, chunk=chunk, want_color=True)
    occ = occ.reshape(cam.width, cam.height, n_bins)
    rgb = rgb.reshape(cam.width, cam.height, n_bins, 3)
    return _composite(occ, rgb, z)


def _save(out_dir: str, name: str, img: np.ndarray, depth: np.ndarray,
          alpha: np.ndarray) -> None:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    # (W, H) layout -> standard (H, W) image, RGB -> BGR
    bgr = cv2.cvtColor(
        (np.clip(img, 0, 1).transpose(1, 0, 2) * 255).astype(np.uint8),
        cv2.COLOR_RGB2BGR)
    cv2.imwrite(os.path.join(out_dir, f"{name}_rgb.png"), bgr)
    d16 = np.clip(depth.T * 1000.0, 0, 65535).astype(np.uint16)  # mm
    cv2.imwrite(os.path.join(out_dir, f"{name}_depth.png"), d16)
    cv2.imwrite(os.path.join(out_dir, f"{name}_alpha.png"),
                (np.clip(alpha.T, 0, 1) * 255).astype(np.uint8))


def render_session_orbits(session, out_dir: str, *, n_views: int = 8,
                          width: int = 320, height: int = 240,
                          n_bins: int = 96) -> list[str]:
    """Orbit renders of every object + background views from up to
    `n_views` dataset poses. Returns written basenames."""
    cfg = session.cfg
    f = 0.9 * max(width, height)
    cam = CameraInfo(width, height, f, f, width / 2.0, height / 2.0)
    written: list[str] = []

    for cls_id in session.cls_ids:
        cat = session.categories[session.cls_ids.index(cls_id)]
        params = session.category_params(cls_id)
        multi = cat.n_obj > 1
        for obj_id in cat.obj_ids:
            k = cat.inst_id_to_index[obj_id]
            sc = np.asarray(params["shape_codes"][k])
            tc = np.asarray(params["texture_codes"][k])
            if multi:
                s = float(cat.object_tensor_dict[obj_id][0])
                extent = np.asarray(cat.extent_dict[obj_id]) / max(s, 1e-9)
                center = np.zeros(3)
            else:
                bound = cat.bound_dict.get(obj_id)
                if bound is None:
                    continue
                extent = np.asarray(bound.extent)
                center = np.asarray(bound.center)
            half_diag = 0.5 * float(np.linalg.norm(extent))
            radius = 2.2 * half_diag
            near = max(0.05 * radius, radius - 1.3 * half_diag)
            far = radius + 1.3 * half_diag
            for v, T in enumerate(orbit_poses(n_views, radius, center)):
                img, depth, alpha = render_view(
                    params, cfg, T, cam, near=near, far=far, shape_code=sc,
                    texture_code=tc, n_bins=n_bins)
                name = f"obj{obj_id}_view{v:02d}"
                _save(out_dir, name, img, depth, alpha)
                written.append(name)

    bg_params = session.background_params()
    if bg_params is not None and getattr(session, "sample_dict", None):
        frames = sorted(session.sample_dict.keys())
        step = max(1, len(frames) // max(1, n_views))
        bound = (session.background.bound if session.background is not None
                 else None)
        far = (1.2 * float(np.linalg.norm(np.asarray(bound.extent)))
               if bound is not None else 8.0)
        for v, fr in enumerate(frames[::step][:n_views]):
            T = np.asarray(session.sample_dict[fr]["T"], np.float32)
            img, depth, alpha = render_view(
                bg_params, cfg, T, cam, near=0.05, far=far,
                is_background=True, n_bins=n_bins)
            name = f"bg_frame{fr}_view{v:02d}"
            _save(out_dir, name, img, depth, alpha)
            written.append(name)
    return written


def _obb_mask(pts: np.ndarray, center, R, extent, margin: float) -> np.ndarray:
    local = (pts - np.asarray(center, np.float32)) @ np.asarray(R, np.float32)
    half = 0.5 * margin * np.asarray(extent, np.float32)
    return (np.abs(local) <= half).all(-1)


def render_scene_view(session, T: np.ndarray, cam: CameraInfo, *,
                      near: float, far: float, n_bins: int = 64,
                      margin: float = 1.3, chunk: int = 262144):
    """Composite ALL trained fields (every object + background) along shared
    world-frame rays into one RGB-D image.

    Per bin the fields merge as independent occupancies — union
    occ = 1 - prod(1 - occ_f), color = sum(occ_f * rgb_f) / sum(occ_f) —
    then composite along the ray with the training's shifted-cumprod math.
    Object fields are evaluated in their own frame (canonical via the
    inverse sim(3) for multi-instance categories, world otherwise) and
    masked to their OBB/extent box (fields are untrained garbage outside
    the region the mesh grid would evaluate).
    """
    cfg = session.cfg
    dirs_c = ray_dirs_cache(cam.width, cam.height, cam.fx, cam.fy,
                            cam.cx, cam.cy)
    R_wc, o_w = T[:3, :3], T[:3, 3]
    dirs = dirs_c @ R_wc.T
    edges = np.linspace(near, far, n_bins + 1, dtype=np.float32)
    z = 0.5 * (edges[:-1] + edges[1:])
    pts_w = (o_w + dirs[:, :, None, :] * z[None, None, :, None]).reshape(-1, 3)
    n = len(pts_w)

    one_minus = np.ones(n, np.float32)
    color_sum = np.zeros((n, 3), np.float32)
    w_sum = np.zeros(n, np.float32)

    def accumulate(occ, rgb, mask=None):
        nonlocal one_minus, color_sum, w_sum
        if mask is not None:
            occ = occ * mask
        one_minus *= 1.0 - occ
        color_sum += occ[:, None] * rgb
        w_sum += occ

    from catnerf_tpu.ops.sim3 import tensor_to_se3_np

    for cls_id in session.cls_ids:
        cat = session.categories[session.cls_ids.index(cls_id)]
        params = session.category_params(cls_id)
        multi = cat.n_obj > 1
        for obj_id in cat.obj_ids:
            k = cat.inst_id_to_index[obj_id]
            sc = np.asarray(params["shape_codes"][k])
            tc = np.asarray(params["texture_codes"][k])
            if multi:
                obj_tensor = cat.object_tensor_dict[obj_id]
                s = float(obj_tensor[0])
                T_ow = tensor_to_se3_np(obj_tensor[1:])  # canonical->world
                x_c = ((pts_w - T_ow[:3, 3]) @ T_ow[:3, :3]) / max(s, 1e-9)
                half_c = np.asarray(cat.extent_dict[obj_id]) / (2 * max(s, 1e-9))
                mask = (np.abs(x_c) <= margin * half_c).all(-1)
                eval_pts = x_c
            else:
                bound = cat.bound_dict.get(obj_id)
                if bound is None:
                    continue
                mask = _obb_mask(pts_w, bound.center, bound.R, bound.extent,
                                 margin)
                eval_pts = pts_w
            if not mask.any():
                continue
            occ, rgb = eval_points(eval_pts, params, cfg, sc, tc,
                                   is_background=False, chunk=chunk)
            accumulate(occ.astype(np.float32), rgb.astype(np.float32),
                       mask.astype(np.float32))

    bg_params = session.background_params()
    if bg_params is not None:
        occ, rgb = eval_points(pts_w, bg_params, cfg, is_background=True,
                               chunk=chunk)
        accumulate(occ.astype(np.float32), rgb.astype(np.float32))

    occ_u = (1.0 - one_minus).reshape(cam.width, cam.height, n_bins)
    rgb_u = (color_sum / np.maximum(w_sum[:, None], 1e-8)).reshape(
        cam.width, cam.height, n_bins, 3)
    return _composite(occ_u, rgb_u, z)


def render_scene_views(session, out_dir: str, *, n_views: int = 4,
                       width: int = 320, height: int = 240,
                       n_bins: int = 64) -> list[str]:
    """Composited whole-scene renders from up to n_views dataset poses."""
    if not getattr(session, "sample_dict", None):
        return []
    cfg = session.cfg
    f = 0.9 * max(width, height)
    cam = CameraInfo(width, height, f, f, width / 2.0, height / 2.0)
    bound = (session.background.bound if session.background is not None
             else None)
    far = (1.2 * float(np.linalg.norm(np.asarray(bound.extent)))
           if bound is not None else 8.0)
    frames = sorted(session.sample_dict.keys())
    step = max(1, len(frames) // max(1, n_views))
    written = []
    for v, fr in enumerate(frames[::step][:n_views]):
        T = np.asarray(session.sample_dict[fr]["T"], np.float32)
        img, depth, alpha = render_scene_view(
            session, T, cam, near=0.05, far=far, n_bins=n_bins)
        name = f"scene_frame{fr}_view{v:02d}"
        _save(out_dir, name, img, depth, alpha)
        written.append(name)
    return written


def main() -> None:
    import argparse

    from catnerf_tpu.utils import enable_compilation_cache

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--logdir", required=True,
                        help="training logdir containing ckpt/")
    parser.add_argument("--config", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out", default=None,
                        help="output dir (default <logdir>/renders)")
    parser.add_argument("--n-views", type=int, default=8)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--n-bins", type=int, default=96)
    parser.add_argument("--scene", action="store_true",
                        help="also render composited whole-scene views "
                             "(all objects + background) from dataset poses")
    args = parser.parse_args()

    enable_compilation_cache()
    from train import load_scene  # reuses the training CLI's loaders

    cfg, inst_dict, sample_dict, cam = load_scene(args.config,
                                                  synthetic=args.synthetic)
    from catnerf_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from catnerf_tpu.train.loop import TrainingSession

    session = TrainingSession(cfg, inst_dict, sample_dict, cam=cam)
    ckpt = latest_checkpoint(os.path.join(args.logdir, "ckpt"))
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.logdir}/ckpt")
    session.state = load_checkpoint(ckpt, session.state)
    out = args.out or os.path.join(args.logdir, "renders")
    written = render_session_orbits(
        session, out, n_views=args.n_views, width=args.width,
        height=args.height, n_bins=args.n_bins)
    if args.scene:
        written += render_scene_views(
            session, out, n_views=args.n_views, width=args.width,
            height=args.height, n_bins=min(args.n_bins, 64))
    print(f"wrote {len(written)} views to {out}")


if __name__ == "__main__":
    main()
