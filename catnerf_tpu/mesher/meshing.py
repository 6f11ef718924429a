"""Grid evaluation (TPU) + iso-surface mesh extraction (CPU, C++).

Parity targets: `Trainer.meshing` / `Trainer.eval_points`
(ref: src/trainer.py:62-151) and the driver's mesh-export loop
(ref: train.py:214-243). The 500k-point Python chunk loop becomes a
`lax.map` over fixed-shape tiles inside one jitted program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.mesher.mesh import TriMesh
from catnerf_tpu.native.lib import geomlib
from catnerf_tpu.ops import render as render_ops
from catnerf_tpu.ops.sim3 import tensor_to_se3_np


# bound_extent margins (ref: src/trainer.py:31-34)
BOUND_EXTENT_BG = 0.995
BOUND_EXTENT_OBJ = 0.9


@partial(jax.jit, static_argnames=("obj_scale", "max_deg", "chunk"))
def _eval_codenerf_chunked(pe_params, fc_params, shape_code, texture_code,
                           points, *, obj_scale, max_deg, chunk):
    def eval_chunk(pts):
        emb = embedding.apply(pe_params, pts, scale=obj_scale, max_deg=max_deg)
        sigma, rgb = codenerf.apply(fc_params, emb, shape_code, texture_code)
        return render_ops.occupancy_activation(sigma[..., 0]), rgb

    tiles = points.reshape(-1, chunk, 3)
    occ, rgb = jax.lax.map(eval_chunk, tiles)
    return occ.reshape(-1), rgb.reshape(-1, 3)


@partial(jax.jit, static_argnames=("bg_scale", "max_deg", "chunk"))
def _eval_occupancy_chunked(pe_params, fc_params, points, *, bg_scale,
                            max_deg, chunk):
    def eval_chunk(pts):
        emb = embedding.apply(pe_params, pts, scale=bg_scale, max_deg=max_deg)
        alpha, rgb = occupancy.apply(fc_params, emb)
        return render_ops.occupancy_activation(alpha[..., 0]), rgb

    tiles = points.reshape(-1, chunk, 3)
    occ, rgb = jax.lax.map(eval_chunk, tiles)
    return occ.reshape(-1), rgb.reshape(-1, 3)


def _pad_to_chunks(points: np.ndarray, chunk: int):
    n = len(points)
    n_pad = (-n) % chunk
    if n_pad:
        points = np.concatenate([points, np.zeros((n_pad, 3), points.dtype)])
    return points, n


def eval_points(points: np.ndarray, params: dict, cfg: Config,
                shape_code=None, texture_code=None, *, is_background: bool,
                chunk: int = 262144):
    """(occ, color) at arbitrary 3D points, chunked on device
    (ref: src/trainer.py:125-151)."""
    pts_padded, n = _pad_to_chunks(np.asarray(points, np.float32), chunk)
    pts = jnp.asarray(pts_padded)
    if is_background:
        occ, rgb = _eval_occupancy_chunked(
            params["pe"], params["fc"], pts, bg_scale=cfg.bg_scale,
            max_deg=cfg.n_unidir_funcs, chunk=chunk)
    else:
        occ, rgb = _eval_codenerf_chunked(
            params["pe"], params["fc"], jnp.asarray(shape_code),
            jnp.asarray(texture_code), pts, obj_scale=cfg.obj_scale,
            max_deg=cfg.n_unidir_funcs, chunk=chunk)
    return np.asarray(occ[:n]), np.asarray(rgb[:n])


def adaptive_grid_dim(extent, live_voxel_size: float, grid_dim_max: int) -> int:
    """min(max_extent // live_voxel + 1, grid_dim) (ref: train.py:220,229),
    rounded UP to a multiple of 32 so objects of similar size share one
    compiled grid-eval program (per-object exact dims would trigger an XLA
    recompile per object; the extra resolution only refines the mesh)."""
    dim = int(np.minimum(np.max(extent) // live_voxel_size + 1, grid_dim_max))
    return int(min(-(-dim // 32) * 32, grid_dim_max))


def mesh_field(params: dict, cfg: Config, *, grid_dim: int,
               is_background: bool, shape_code=None, texture_code=None,
               bound=None, extent=None) -> TriMesh | None:
    """Extract one object's colored mesh (ref: src/trainer.py:62-123).

    Two layouts, as in the reference:
      * `bound` (OrientedBBox) given — background / single-instance
        categories: the grid lives in world frame via the OBB transform.
      * `extent` given — multi-instance categories: the grid lives in the
        normalized canonical object frame (extent / max(extent/2)).
    Returns the mesh in the same frame as the grid; the caller applies the
    sim(3) object->world transform for multi-instance categories
    (ref: train.py:233-243).
    """
    occ_range = (-1.0, 1.0)
    range_dist = occ_range[1] - occ_range[0]
    bound_extent = BOUND_EXTENT_BG if is_background else BOUND_EXTENT_OBJ

    if bound is not None:
        scale_np = np.asarray(bound.extent) / (range_dist * bound_extent)
        transform_np = np.eye(4, dtype=np.float32)
        transform_np[:3, 3] = bound.center
        transform_np[:3, :3] = bound.R
        grid = render_ops.make_3d_grid(
            occ_range, grid_dim, transform=jnp.asarray(transform_np),
            scale=jnp.asarray(scale_np, jnp.float32))
    else:
        assert extent is not None
        extent_n = np.asarray(extent) / np.max(np.asarray(extent) / 2.0)
        scale_np = extent_n / (range_dist * bound_extent)
        transform_np = None
        grid = render_ops.make_3d_grid(
            occ_range, grid_dim, scale=jnp.asarray(scale_np, jnp.float32))

    grid_pts = np.asarray(grid).reshape(-1, 3)
    occ, _ = eval_points(grid_pts, params, cfg, shape_code, texture_code,
                         is_background=is_background)
    if occ.max() <= 0.5 or occ.min() >= 0.5:
        return None

    occ3 = occ.reshape(grid_dim, grid_dim, grid_dim)
    if cfg.mesh_fill_interior and not is_background:
        # vMAP-style fields are supervised only in a crust around observed
        # surfaces; deep inside an object the occupancy decays below the 0.5
        # level again and marching cubes extracts a spurious INNER shell
        # (the reference has the same artifact). Raise fully enclosed empty
        # regions above the level: the outer crossing band keeps its exact
        # values (its voxels touch true outside), so subvoxel interpolation
        # is unaffected; only interior crossings disappear.
        from scipy import ndimage

        solid = occ3 > 0.5
        cavity = ndimage.binary_fill_holes(solid) & ~solid
        if cavity.any():
            occ3 = np.where(cavity, np.float32(0.51), occ3)

    out = geomlib.marching_cubes(occ3, 0.5)
    if out is None:
        return None
    verts, tris = out
    mesh = TriMesh(verts.astype(np.float64) / (grid_dim - 1), tris)

    # [0,1] -> [-1,1] -> model frame (ref: src/trainer.py:102-109)
    mesh.apply_translation([-0.5, -0.5, -0.5])
    mesh.apply_scale(2.0)
    mesh.apply_scale(scale_np)
    if transform_np is not None:
        mesh.apply_transform(transform_np)

    # vertex colors by re-query (ref: src/trainer.py:111-121)
    _, color = eval_points(mesh.vertices.astype(np.float32), params, cfg,
                           shape_code, texture_code,
                           is_background=is_background)
    mesh.vertex_colors = (np.clip(color, 0, 1) * 255).astype(np.uint8)
    return mesh


def mesh_scene(session, out_dir: str, iteration: int) -> dict[int, str]:
    """Mesh every object + background and export .obj files in scene frame
    (ref: train.py:214-243). Returns {obj_id or 0: path}."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    cfg = session.cfg
    written: dict[int, str] = {}

    if session.background is not None and session.background.bound is not None:
        bound = session.background.bound
        dim = adaptive_grid_dim(bound.extent, cfg.live_voxel_size, cfg.grid_dim)
        mesh = mesh_field(session.background_params(), cfg, grid_dim=dim,
                          is_background=True, bound=bound)
        if mesh is not None:
            path = os.path.join(out_dir, f"iteration_{iteration}_obj0.obj")
            mesh.export(path)
            written[0] = path

    for cls_id in session.cls_ids:
        cat = session.categories[session.cls_ids.index(cls_id)]
        params = session.category_params(cls_id)
        multi = cat.n_obj > 1
        for obj_id in cat.obj_ids:
            k = cat.inst_id_to_index[obj_id]
            sc = np.asarray(params["shape_codes"][k])
            tc = np.asarray(params["texture_codes"][k])
            if multi:
                extent = cat.extent_dict[obj_id]
                dim = adaptive_grid_dim(extent, cfg.live_voxel_size, cfg.grid_dim)
                mesh = mesh_field(params, cfg, grid_dim=dim,
                                  is_background=False, shape_code=sc,
                                  texture_code=tc, extent=extent)
            else:
                bound = cat.bound_dict.get(obj_id)
                if bound is None:
                    continue
                dim = adaptive_grid_dim(bound.extent, cfg.live_voxel_size,
                                        cfg.grid_dim)
                mesh = mesh_field(params, cfg, grid_dim=dim,
                                  is_background=False, shape_code=sc,
                                  texture_code=tc, bound=bound)
            if mesh is None:
                print(f"mesh failed obj {obj_id}")
                continue
            if multi:
                # canonical -> scene: sim(3) scale then rigid transform
                # (ref: train.py:233-243)
                obj_tensor = cat.object_tensor_dict[obj_id]
                mesh.apply_scale(float(obj_tensor[0]))
                mesh.apply_transform(tensor_to_se3_np(obj_tensor[1:]))
            path = os.path.join(out_dir,
                                f"iteration_{iteration}_obj{obj_id}.obj")
            mesh.export(path)
            written[obj_id] = path
    return written
