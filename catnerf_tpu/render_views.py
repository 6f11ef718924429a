"""Novel-view RGB-D rendering from trained fields.

A capability the reference does not ship (its only visual output is mesh
export, ref: src/trainer.py:62-123): ray-march the trained category /
background fields from arbitrary camera poses and emit RGB, depth, and
opacity images, using the exact UniSurf compositing math the loss trains
against (ops/render.py, ref: src/render_rays.py:25-50) — so rendered views
are a faithful readout of what the optimizer saw.

The entire render is ONE jitted device program per (camera, bins) shape:
ray generation, chunked field evaluation (lax.map tiles), termination and
compositing all stay on device; the host uploads a 4x4 pose and downloads
one image. This matters doubly on the axon tunnel (~134 MB/s): the naive
host-staged pipeline moved ~140 MB of points/occupancies per 320x240x64
view (~6.5 s/view measured); the device program moves ~1 MB.

CLI: python -m catnerf_tpu.render_views --logdir <dir> [--synthetic |
--config <json>] --out <dir> [--n-views 8] [--width 320 --height 240]
Renders an orbit around every object (canonical frame for multi-instance
categories, world frame otherwise) plus the background from dataset camera
poses when available; --scene adds composited whole-scene views.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo, ray_dirs_cache
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.ops import render as render_ops


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


def orbit_eye(az_rad: float, el_rad: float, radius: float,
              center=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Camera position on a sphere around `center` (single definition of
    the azimuth/elevation convention for the CLI and the HTTP server)."""
    return np.asarray(center, np.float64) + radius * np.array(
        [np.cos(az_rad) * np.cos(el_rad),
         np.sin(az_rad) * np.cos(el_rad),
         np.sin(el_rad)])


def orbit_frame(extent, radius: float | None = None):
    """(radius, near, far) framing an object of `extent` from an orbit
    camera — one copy of the 2.2x/1.3x framing recipe."""
    half_diag = 0.5 * float(np.linalg.norm(np.asarray(extent)))
    r = radius if radius is not None else 2.2 * half_diag
    near = max(0.05 * r, r - 1.3 * half_diag)
    far = r + 1.3 * half_diag
    return r, near, far


def orbit_poses(n: int, radius: float, center=(0.0, 0.0, 0.0),
                elevation_deg: float = 25.0) -> list[np.ndarray]:
    """n camera poses on a circle of `radius` around `center`, looking in."""
    el = np.deg2rad(elevation_deg)
    return [look_at(orbit_eye(2.0 * np.pi * i / n, el, radius, center),
                    center) for i in range(n)]


def default_orbit_cam(width: int, height: int) -> CameraInfo:
    """The synthetic orbit camera: f = 0.9*max(w, h), centered principal
    point — the single copy of the recipe for the render CLIs, the edit
    CLI, and the HTTP server."""
    f = 0.9 * max(width, height)
    return CameraInfo(width, height, f, f, width / 2.0, height / 2.0)


def scene_far(session) -> float:
    """Far plane covering the whole scene: 1.2x the background OBB
    diagonal, or 8 m when there is no background bound (single copy of the
    heuristic for the CLIs and the server)."""
    bound = (session.background.bound if session.background is not None
             else None)
    if bound is None:
        return 8.0
    return 1.2 * float(np.linalg.norm(np.asarray(bound.extent)))


def spread_frames(frames: list, n: int) -> list:
    """Up to n frames spread evenly over a sorted frame list."""
    step = max(1, len(frames) // max(1, n))
    return frames[::step][:n]


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


# ---------------------------------------------------------------------------
# On-device render programs, cached per (camera, bins, field kind) shape.
# ---------------------------------------------------------------------------

_PROGRAM_CACHE: dict = {}


def _chunked_field(chunk_fn, flat_pts: jnp.ndarray, chunk: int):
    """lax.map a field evaluator over fixed-size tiles of [N, 3] points
    (same tiling discipline as mesher/meshing.eval_points), on device."""
    n = flat_pts.shape[0]
    pad = (-n) % chunk
    if pad:
        flat_pts = jnp.concatenate(
            [flat_pts, jnp.zeros((pad, 3), flat_pts.dtype)])
    occ, rgb = jax.lax.map(chunk_fn, flat_pts.reshape(-1, chunk, 3))
    return occ.reshape(-1)[:n], rgb.reshape(-1, 3)[:n]


def _ray_grid(dirs_c: jnp.ndarray, T: jnp.ndarray, near, far, n_bins: int):
    dirs = dirs_c @ T[:3, :3].T
    edges = near + (far - near) * jnp.linspace(0.0, 1.0, n_bins + 1)
    z = 0.5 * (edges[:-1] + edges[1:])
    pts = T[:3, 3] + dirs[:, :, None, :] * z[None, None, :, None]
    return pts, z


def _composite_device(occ: jnp.ndarray, rgb: jnp.ndarray, z: jnp.ndarray):
    term = render_ops.occupancy_to_termination(occ)
    img = (term[..., None] * rgb).sum(-2)
    depth = (term * z).sum(-1)
    return img, depth, term.sum(-1)


def _field_render_program(cam_key, cfg: Config, is_background: bool,
                          n_bins: int, chunk: int):
    """jitted (pe, fc, sc, tc, T, near, far) -> (img, depth, alpha), fully
    on device: the host uploads a pose and downloads one image."""
    key = ("field", cam_key, is_background, n_bins, chunk,
           cfg.obj_scale, cfg.bg_scale, cfg.n_unidir_funcs)
    if key in _PROGRAM_CACHE:
        return _PROGRAM_CACHE[key]
    width, height, fx, fy, cx, cy = cam_key
    # jit ARGUMENT, not a closure: a closed-over device array is embedded
    # as an MLIR constant, pulled device->host during lowering — ruinous
    # over the axon tunnel for a full-camera dirs grid (~10 MB). See
    # device_buffer.make_superstep.
    dirs_c = jnp.asarray(ray_dirs_cache(width, height, fx, fy, cx, cy))
    scale = cfg.bg_scale if is_background else cfg.obj_scale
    max_deg = cfg.n_unidir_funcs

    @jax.jit
    def run_jit(dirs_c, pe, fc, sc, tc, T, near, far,
                mask_A, mask_b, mask_half):
        pts, z = _ray_grid(dirs_c, T, near, far, n_bins)

        def chunk_fn(p):
            emb = embedding.apply(pe, p, scale=scale, max_deg=max_deg)
            if is_background:
                sigma, rgb = occupancy.apply(fc, emb)
            else:
                sigma, rgb = codenerf.apply(fc, emb, sc, tc)
            occ = render_ops.occupancy_activation(sigma[..., 0])
            # OBB/extent mask (same rule as the scene composite and the
            # mesh grid): object fields are untrained garbage outside
            # their box; unmasked callers pass half=+big
            x_m = p @ mask_A.T + mask_b
            occ = occ * (jnp.abs(x_m) <= mask_half).all(-1)
            return occ, rgb

        occ, rgb = _chunked_field(chunk_fn, pts.reshape(-1, 3), chunk)
        occ = occ.reshape(width, height, n_bins)
        rgb = rgb.reshape(width, height, n_bins, 3)
        return _composite_device(occ, rgb, z)

    def run(*args):
        return run_jit(dirs_c, *args)

    _PROGRAM_CACHE[key] = run
    return run


def render_view(params: dict, cfg: Config, T: np.ndarray, cam: CameraInfo,
                *, near: float, far: float, shape_code=None,
                texture_code=None, is_background: bool = False,
                n_bins: int = 96, chunk: int = 262144, mask_box=None):
    """Render one view. T: camera-to-field-frame pose (field frame =
    canonical object frame, or world for background/single-instance).

    mask_box: optional (A_m [3,3], b_m [3], half [3]) — occupancy is
    zeroed where |A_m x + b_m| > half in the FIELD frame (the same
    OBB/extent rule the scene composite and the mesh grid apply; object
    fields are untrained outside their box). None = no mask.

    Returns (rgb [W, H, 3] in [0,1], depth [W, H], alpha [W, H]) in the
    pipeline's transposed (W, H) layout."""
    cam_key = (cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy)
    run = _field_render_program(cam_key, cfg, is_background, n_bins, chunk)
    sc = jnp.zeros((0,)) if shape_code is None else jnp.asarray(shape_code)
    tc = jnp.zeros((0,)) if texture_code is None else jnp.asarray(texture_code)
    if mask_box is None:
        mA, mb = jnp.eye(3), jnp.zeros(3)
        mh = jnp.full(3, jnp.finfo(jnp.float32).max)
    else:
        mA, mb, mh = (jnp.asarray(v, jnp.float32) for v in mask_box)
    img, depth, alpha = run(params["pe"], params["fc"], sc, tc,
                            jnp.asarray(T, jnp.float32),
                            jnp.float32(near), jnp.float32(far),
                            mA, mb, mh)
    return np.asarray(img), np.asarray(depth), np.asarray(alpha)


def instance_mask_box(session, cls_id: int, obj_ids: list[int],
                      margin: float = 1.3):
    """(A_m, b_m, half) for render_view's field-frame OBB/extent mask,
    covering every instance in obj_ids (donors of an edit must not be
    clipped): canonical axis-aligned box for multi-instance categories,
    the world-frame OBB otherwise. None when a single-instance object has
    no bound. Mirrors the per-object mask of the scene composite
    (render_scene_view)."""
    cat = session.categories[session.cls_ids.index(cls_id)]
    eye3 = np.eye(3, dtype=np.float32)
    zero3 = np.zeros(3, np.float32)
    if cat.n_obj > 1:
        halfs = []
        for oid in obj_ids:
            s = max(float(cat.object_tensor_dict[oid][0]), 1e-9)
            halfs.append(margin * np.asarray(cat.extent_dict[oid]) / (2 * s))
        return eye3, zero3, np.max(np.stack(halfs), 0).astype(np.float32)
    bound = cat.bound_dict.get(obj_ids[0])
    if bound is None:
        return None
    Rb = np.asarray(bound.R, np.float32)
    return (Rb.T, -Rb.T @ np.asarray(bound.center, np.float32),
            (0.5 * margin * np.asarray(bound.extent)).astype(np.float32))


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


def instance_frame(session, cls_id: int, obj_ids: list[int]):
    """(extent, center) framing the given instances of one category in its
    render frame — canonical (origin-centered, extent de-scaled by the
    sim(3) s) for multi-instance categories, the world-frame OBB otherwise.
    The single copy of the framing recipe for orbits, edits, and fits; the
    extent is the per-axis max over obj_ids so jointly framed instances
    (code donors) are not clipped. Returns None when a single-instance
    object has no bound (degenerate hull at dataset build)."""
    cat = session.categories[session.cls_ids.index(cls_id)]
    if cat.n_obj > 1:
        extents = []
        for oid in obj_ids:
            s = float(cat.object_tensor_dict[oid][0])
            extents.append(np.asarray(cat.extent_dict[oid]) / max(s, 1e-9))
        return np.max(np.stack(extents), axis=0), np.zeros(3)
    bound = cat.bound_dict.get(obj_ids[0])
    if bound is None:
        return None
    return np.asarray(bound.extent), np.asarray(bound.center)


def render_session_orbits(session, out_dir: str, *, n_views: int = 8,
                          width: int = 320, height: int = 240,
                          n_bins: int = 96) -> list[str]:
    """Orbit renders of every object + background views from up to
    `n_views` dataset poses. Returns written basenames."""
    cfg = session.cfg
    cam = default_orbit_cam(width, height)
    written: list[str] = []

    for cls_id, cat in zip(session.cls_ids, session.categories):
        params = session.category_params(cls_id)
        for obj_id in cat.obj_ids:
            k = cat.inst_id_to_index[obj_id]
            sc = np.asarray(params["shape_codes"][k])
            tc = np.asarray(params["texture_codes"][k])
            fr = instance_frame(session, cls_id, [obj_id])
            if fr is None:
                continue
            extent, center = fr
            mask = instance_mask_box(session, cls_id, [obj_id])
            radius, near, far = orbit_frame(extent)
            for v, T in enumerate(orbit_poses(n_views, radius, center)):
                img, depth, alpha = render_view(
                    params, cfg, T, cam, near=near, far=far, shape_code=sc,
                    texture_code=tc, n_bins=n_bins, mask_box=mask)
                name = f"obj{obj_id}_view{v:02d}"
                _save(out_dir, name, img, depth, alpha)
                written.append(name)

    bg_params = session.background_params()
    if bg_params is not None and getattr(session, "sample_dict", None):
        far = scene_far(session)
        for v, fr in enumerate(
                spread_frames(sorted(session.sample_dict.keys()), n_views)):
            T = np.asarray(session.sample_dict[fr]["T"], np.float32)
            img, depth, alpha = render_view(
                bg_params, cfg, T, cam, near=0.05, far=far,
                is_background=True, n_bins=n_bins)
            name = f"bg_frame{fr}_view{v:02d}"
            _save(out_dir, name, img, depth, alpha)
            written.append(name)
    return written


def _scene_render_program(cfg: Config, cam_key, n_bins: int, n_obj: int,
                          with_bg: bool, chunk: int, device_mesh=None):
    """ONE jitted program for the whole-scene composite: world-frame ray
    grid from the pose, a lax.map over point tiles where every object field
    is evaluated (vmapped over the stacked object axis), union-reduced, and
    merged with the background INSIDE the tile (so no [n_obj, N] tensor is
    ever materialized), then composited. One dispatch per request; the host
    uploads a pose + stacked codes/frames, downloads one image.

    device_mesh (optional jax.sharding.Mesh): shard the tile axis over all
    its devices via shard_map — per-point work is embarrassingly parallel,
    so each device maps its own tiles and only the final (tiny) image
    assembly crosses chips. Output is identical to the single-device path
    (tests/test_parallel.py)."""
    mesh_key = (tuple(d.id for d in device_mesh.devices.flat)
                if device_mesh is not None else None)
    key = ("scene", cam_key, n_bins, n_obj, with_bg, chunk,
           cfg.obj_scale, cfg.bg_scale, cfg.n_unidir_funcs, mesh_key)
    if key in _PROGRAM_CACHE:
        return _PROGRAM_CACHE[key]
    width, height, fx, fy, cx, cy = cam_key
    # jit ARGUMENT, not a closure (constant-embedding device->host pull at
    # lowering; see _field_render_program / device_buffer.make_superstep)
    dirs_c = jnp.asarray(ray_dirs_cache(width, height, fx, fy, cx, cy))
    max_deg = cfg.n_unidir_funcs
    n_dev = device_mesh.devices.size if device_mesh is not None else 1

    @jax.jit
    def run_jit(dirs_c, pe_s, fc_s, sc_s, tc_s, A_s, b_s, Am_s, bm_s,
                half_s, bg_pe, bg_fc, T, near, far):
        pts, z = _ray_grid(dirs_c, T, near, far, n_bins)
        flat = pts.reshape(-1, 3)
        n = flat.shape[0]
        pad = (-n) % (chunk * n_dev)
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad, 3), flat.dtype)])

        def tile_fn(p):  # [chunk, 3] world-frame points
            def one_field(pe, fc, sc, tc, A, b, Am, bm, half):
                x_e = p @ A.T + b
                x_m = p @ Am.T + bm
                mask = (jnp.abs(x_m) <= half).all(-1).astype(jnp.float32)
                emb = embedding.apply(pe, x_e, scale=cfg.obj_scale,
                                      max_deg=max_deg)
                sigma, rgb = codenerf.apply(fc, emb, sc, tc)
                occ = render_ops.occupancy_activation(sigma[..., 0]) * mask
                return occ, rgb

            occs, rgbs = jax.vmap(one_field)(
                pe_s, fc_s, sc_s, tc_s, A_s, b_s, Am_s, bm_s, half_s)
            one_minus = jnp.prod(1.0 - occs, axis=0)
            csum = (occs[..., None] * rgbs).sum(0)
            wsum = occs.sum(0)
            if with_bg:
                emb = embedding.apply(bg_pe, p, scale=cfg.bg_scale,
                                      max_deg=max_deg)
                sigma, rgb = occupancy.apply(bg_fc, emb)
                occb = render_ops.occupancy_activation(sigma[..., 0])
                one_minus = one_minus * (1.0 - occb)
                csum = csum + occb[:, None] * rgb
                wsum = wsum + occb
            occ_u = 1.0 - one_minus
            rgb_u = csum / jnp.maximum(wsum[:, None], 1e-8)
            return occ_u, rgb_u

        tiles = flat.reshape(-1, chunk, 3)
        if device_mesh is None:
            occ, rgb = jax.lax.map(tile_fn, tiles)
        else:
            from jax.sharding import PartitionSpec as P

            from catnerf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            spec = P((DATA_AXIS, MODEL_AXIS))
            # tile_fn closes over the (replicated) field params; shard_map
            # only partitions the explicit tile argument
            occ, rgb = jax.shard_map(
                lambda t: jax.lax.map(tile_fn, t), mesh=device_mesh,
                in_specs=spec, out_specs=(spec, spec))(tiles)
        occ = occ.reshape(-1)[:n].reshape(width, height, n_bins)
        rgb = rgb.reshape(-1, 3)[:n].reshape(width, height, n_bins, 3)
        return _composite_device(occ, rgb, z)

    def run(*args):
        return run_jit(dirs_c, *args)

    _PROGRAM_CACHE[key] = run
    return run


def render_scene_view(session, T: np.ndarray, cam: CameraInfo, *,
                      near: float, far: float, n_bins: int = 64,
                      margin: float = 1.3, chunk: int = 131072,
                      device_mesh=None):
    """Composite ALL trained fields (every object + background) along shared
    world-frame rays into one RGB-D image.

    Per bin the fields merge as independent occupancies — union
    occ = 1 - prod(1 - occ_f), color = sum(occ_f * rgb_f) / sum(occ_f) —
    then composite along the ray with the training's shifted-cumprod math.
    Object fields are evaluated in their own frame (canonical via the
    inverse sim(3) for multi-instance categories, world otherwise) and
    masked to their OBB/extent box (fields are untrained garbage outside
    the region the mesh grid would evaluate). The whole composite is ONE
    device dispatch (see _scene_render_program).
    """
    cfg = session.cfg
    staged = _stage_scene_fields(session, margin)

    bg_params = session.background_params()
    if staged is None:  # no renderable objects: background-only view
        if bg_params is None:
            raise ValueError("nothing to render: no objects with bounds "
                             "and no background field")
        return render_view(bg_params, cfg, T, cam, near=near, far=far,
                           is_background=True, n_bins=n_bins, chunk=chunk)
    cam_key = (cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy)
    run = _scene_render_program(cfg, cam_key, n_bins, staged["n_obj"],
                                bg_params is not None, chunk,
                                device_mesh=device_mesh)
    dummy = jnp.zeros(())
    img, depth, alpha = run(
        *staged["args"],
        bg_params["pe"] if bg_params is not None else dummy,
        bg_params["fc"] if bg_params is not None else dummy,
        jnp.asarray(T, jnp.float32), jnp.float32(near), jnp.float32(far))
    return np.asarray(img), np.asarray(depth), np.asarray(alpha)


def _stage_scene_fields(session, margin: float):
    """Stack every object field's params/codes/frames/mask boxes onto the
    device for _scene_render_program. Cached ON the session per (state
    version, margin): the inputs only change on training steps or ingest,
    and rebuilding cost ~2 blocking device->host pulls per object over the
    axon tunnel on every /scene request. (Stored as a session attribute —
    a global id(session)-keyed dict could alias a new session allocated at
    a dead one's address and would pin dead sessions' device arrays.)
    Returns None when no object is renderable; else {"n_obj": int,
    "args": tuple of device arrays}."""
    # (step, adopted-count) covers every mutation path: training bumps
    # step, ingest/adopt grows the adopted list (same key rule as
    # serve.py's /mesh cache); object ids are never reused
    version = (int(session.state.step), margin,
               len(getattr(session, "adopted_instances", [])))
    hit = getattr(session, "_scene_staging_cache", None)
    if hit is not None and hit[0] == version:
        return hit[1]

    from catnerf_tpu.ops.sim3 import tensor_to_se3_np

    eye3 = np.eye(3, dtype=np.float32)
    zero3 = np.zeros(3, np.float32)
    pes, fcs, scs, tcs, As, bs, Ams, bms, halfs = ([] for _ in range(9))
    for cls_id, cat in zip(session.cls_ids, session.categories):
        params = session.category_params(cls_id)
        multi = cat.n_obj > 1
        for obj_id in cat.obj_ids:
            k = cat.inst_id_to_index[obj_id]
            if multi:
                obj_tensor = cat.object_tensor_dict[obj_id]
                s = max(float(obj_tensor[0]), 1e-9)
                T_ow = tensor_to_se3_np(obj_tensor[1:])  # canonical->world
                A = (T_ow[:3, :3].T / s).astype(np.float32)
                b = (-T_ow[:3, :3].T @ T_ow[:3, 3] / s).astype(np.float32)
                half = (margin * np.asarray(cat.extent_dict[obj_id])
                        / (2 * s)).astype(np.float32)
                A_m, b_m = A, b
            else:
                bound = cat.bound_dict.get(obj_id)
                if bound is None:
                    continue
                A, b = eye3, zero3
                Rb = np.asarray(bound.R, np.float32)
                A_m = Rb.T
                b_m = (-Rb.T @ np.asarray(bound.center, np.float32))
                half = (0.5 * margin
                        * np.asarray(bound.extent)).astype(np.float32)
            pes.append(params["pe"])
            fcs.append(params["fc"])
            scs.append(np.asarray(params["shape_codes"][k]))
            tcs.append(np.asarray(params["texture_codes"][k]))
            As.append(A), bs.append(b), Ams.append(A_m), bms.append(b_m)
            halfs.append(half)

    if not pes:
        staged = None
    else:
        stack = lambda xs: jax.tree_util.tree_map(  # noqa: E731
            lambda *ls: jnp.stack([jnp.asarray(x) for x in ls]), *xs)
        staged = {"n_obj": len(pes), "args": (
            stack(pes), stack(fcs), jnp.asarray(np.stack(scs)),
            jnp.asarray(np.stack(tcs)), jnp.asarray(np.stack(As)),
            jnp.asarray(np.stack(bs)), jnp.asarray(np.stack(Ams)),
            jnp.asarray(np.stack(bms)), jnp.asarray(np.stack(halfs)))}
    session._scene_staging_cache = (version, staged)
    return staged


def render_scene_views(session, out_dir: str, *, n_views: int = 4,
                       width: int = 320, height: int = 240,
                       n_bins: int = 64, device_mesh=None) -> list[str]:
    """Composited whole-scene renders from up to n_views dataset poses."""
    if not getattr(session, "sample_dict", None):
        return []
    cfg = session.cfg
    cam = default_orbit_cam(width, height)
    far = scene_far(session)
    written = []
    for v, fr in enumerate(
            spread_frames(sorted(session.sample_dict.keys()), n_views)):
        T = np.asarray(session.sample_dict[fr]["T"], np.float32)
        img, depth, alpha = render_scene_view(
            session, T, cam, near=0.05, far=far, n_bins=n_bins,
            device_mesh=device_mesh)
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
    parser.add_argument("--sharded", action="store_true",
                        help="shard --scene composite tiles over ALL "
                             "visible devices (identical pixels)")
    args = parser.parse_args()

    enable_compilation_cache()
    from catnerf_tpu.loaders import load_scene

    cfg, inst_dict, sample_dict, cam = load_scene(args.config,
                                                  synthetic=args.synthetic)
    from catnerf_tpu.train.checkpoint import (latest_checkpoint,
                                              restore_session_checkpoint)
    from catnerf_tpu.train.loop import TrainingSession

    session = TrainingSession(cfg, inst_dict, sample_dict, cam=cam)
    ckpt = latest_checkpoint(os.path.join(args.logdir, "ckpt"))
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.logdir}/ckpt")
    restore_session_checkpoint(ckpt, session)
    out = args.out or os.path.join(args.logdir, "renders")
    written = render_session_orbits(
        session, out, n_views=args.n_views, width=args.width,
        height=args.height, n_bins=args.n_bins)
    if args.scene:
        device_mesh = None
        if args.sharded:
            import jax

            from catnerf_tpu.parallel.mesh import make_mesh

            if len(jax.devices()) > 1:
                device_mesh = make_mesh(n_model=1)
        written += render_scene_views(
            session, out, n_views=args.n_views, width=args.width,
            height=args.height, n_bins=min(args.n_bins, 64),
            device_mesh=device_mesh)
    print(f"wrote {len(written)} views to {out}")


if __name__ == "__main__":
    main()
