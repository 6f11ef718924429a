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

# ---------------------------------------------------------------------------
# Mesh-all phase attribution (VERDICT r3 item #3): cumulative wall time per
# phase across mesh_field/mesh_scene calls. scripts/stress_scale.py and the
# gates print this after mesh-all so the dominant phase is measured, not
# guessed.
# ---------------------------------------------------------------------------
import threading as _threading
import time as _time

MESH_TIMINGS: dict[str, float] = {}
_TIMINGS_LOCK = _threading.Lock()
#: (grid_dim, is_background, carve) program keys already dispatched once —
#: used to attribute first-call (compile-bearing) grid_eval time separately.
_GRID_PROGS_SEEN: set = set()


def _t_add(phase: str, dt: float) -> None:
    with _TIMINGS_LOCK:
        MESH_TIMINGS[phase] = MESH_TIMINGS.get(phase, 0.0) + dt


def reset_mesh_timings() -> None:
    with _TIMINGS_LOCK:
        MESH_TIMINGS.clear()
        _GRID_PROGS_SEEN.clear()


def mesh_timings() -> dict[str, float]:
    with _TIMINGS_LOCK:
        return {k: round(v, 2) for k, v in sorted(MESH_TIMINGS.items())}


def space_carve_mask(points_w: np.ndarray, depths: np.ndarray,
                     T_wc: np.ndarray, cam, margin: float,
                     stride: int = 1) -> np.ndarray:
    """Seen-empty mask over world points: a point is provably free space if
    any training view's ray through it terminates beyond it (its camera
    depth < observed depth - margin). Crust-supervised fields carry
    spurious occupancy in never-supervised space (ours; the reference's
    meshes contain the same artifacts); this removes exactly the part the
    data contradicts. depths: (n_frames, W, H) in the (W, H) layout."""
    pts = np.asarray(points_w, np.float32)
    seen = np.zeros(len(pts), bool)
    W, H = depths.shape[1], depths.shape[2]
    for i in range(0, len(depths), stride):
        T = T_wc[i]
        Rcw = T[:3, :3].T
        pc = (pts - T[:3, 3]) @ Rcw.T
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            px = (cam.fx * pc[:, 0] / z + cam.cx)
            py = (cam.fy * pc[:, 1] / z + cam.cy)
        ok = (z > 0.05) & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
        if not ok.any():
            continue
        ix = np.clip(np.round(px[ok]).astype(np.int32), 0, W - 1)
        iy = np.clip(np.round(py[ok]).astype(np.int32), 0, H - 1)
        obs = depths[i][ix, iy]
        hit = (obs > 0) & (z[ok] < obs - margin)
        idx = np.nonzero(ok)[0][hit]
        seen[idx] = True
    return seen


def _fill_unobservable_interior(occ3: np.ndarray,
                                observed_free: np.ndarray | None = None
                                ) -> np.ndarray:
    """Raise interior empty voxels above the iso level so marching cubes
    extracts only the outer surface. Two passes: binary_fill_holes for
    closed crusts, plus an axis visual-hull pass (empty voxels occluded by
    solid in >=5 of 6 axis directions) that still works when the crust has
    holes in never-observed regions — where fill_holes leaks and spurious
    inner shells survive (measured 29-34% junk vertices on the registered
    gate's partially observed objects).

    observed_free: voxels some training view directly observed as empty
    (the space-carve mask) — these are NEVER filled: a genuinely observed
    concavity (an open bowl's interior) is blocked on >=5 axes and would
    otherwise be clobbered back to solid, undoing the carve.

    The >=4 (not 5) blocked threshold: wide shallow craters in
    never-observed regions are blocked on only 4 axes and survived the
    >=5 fill (measured up to 21 cm inward artifacts on the ScanNet
    gate's blind-spot category; >=4 cut its gate accuracy 1.175 ->
    1.051 cm with the Replica gate unchanged). Safe because
    observed_free voxels are never filled.

    The mask is computed in C++ (geomlib.interior_cavity_mask — one
    border flood fill + six directional sweeps); the scipy+numpy
    original is kept as _fill_unobservable_interior_py and pinned equal
    by tests/test_mesher.py (binary_fill_holes alone was 10+ s at 256^3
    on this single-core box; the native mask is ~0.2 s)."""
    cavity = geomlib.interior_cavity_mask(occ3 > 0.5, observed_free,
                                          min_blocked=4)
    if cavity.any():
        occ3 = np.where(cavity, np.float32(0.51), occ3)
    return occ3


def _fill_unobservable_interior_py(occ3: np.ndarray,
                                   observed_free: np.ndarray | None = None
                                   ) -> np.ndarray:
    """Reference scipy/numpy implementation of the interior fill —
    retained as the equivalence oracle for the native mask."""
    from scipy import ndimage

    solid = occ3 > 0.5
    cavity = ndimage.binary_fill_holes(solid) & ~solid
    blocked = np.zeros(solid.shape, np.int8)
    for ax in range(3):
        blocked += np.maximum.accumulate(solid, axis=ax).astype(np.int8)
        blocked += np.flip(
            np.maximum.accumulate(np.flip(solid, ax), axis=ax), ax
        ).astype(np.int8)
    cavity |= (~solid) & (blocked >= 4)
    if observed_free is not None:
        cavity &= ~observed_free
    if cavity.any():
        occ3 = np.where(cavity, np.float32(0.51), occ3)
    return occ3


def field_chunk_fn(*, is_background: bool, scale: float, max_deg: int,
                   want_color: bool):
    """THE per-tile field evaluator — (pe, fc, sc, tc, pts [chunk, 3]) ->
    occ [chunk] (+ rgb) — shared by the single-chip jitted evaluators
    below and the sharded path (parallel/grid_eval.py), so the two cannot
    silently diverge. want_color=False skips the color branch entirely —
    it would otherwise be computed AND device->host transferred (25 MB per
    2M-point grid) just to be discarded by mesh_field."""
    if is_background:
        def fn(pe, fc, sc, tc, pts):
            emb = embedding.apply(pe, pts, scale=scale, max_deg=max_deg)
            alpha, rgb = occupancy.apply(fc, emb)
            occ = render_ops.occupancy_activation(alpha[..., 0])
            return (occ, rgb) if want_color else occ
    else:
        def fn(pe, fc, sc, tc, pts):
            emb = embedding.apply(pe, pts, scale=scale, max_deg=max_deg)
            sigma, rgb = codenerf.apply(fc, emb, sc, tc)
            occ = render_ops.occupancy_activation(sigma[..., 0])
            return (occ, rgb) if want_color else occ
    return fn


def _map_chunks(fn, pe, fc, sc, tc, points, chunk, want_color):
    tiles = points.reshape(-1, chunk, 3)
    out = jax.lax.map(lambda p: fn(pe, fc, sc, tc, p), tiles)
    if want_color:
        occ, rgb = out
        return occ.reshape(-1), rgb.reshape(-1, 3)
    return out.reshape(-1), None


@partial(jax.jit, static_argnames=("obj_scale", "max_deg", "chunk",
                                   "want_color"))
def _eval_codenerf_chunked(pe_params, fc_params, shape_code, texture_code,
                           points, *, obj_scale, max_deg, chunk,
                           want_color=True):
    fn = field_chunk_fn(is_background=False, scale=obj_scale,
                        max_deg=max_deg, want_color=want_color)
    return _map_chunks(fn, pe_params, fc_params, shape_code, texture_code,
                       points, chunk, want_color)


@partial(jax.jit, static_argnames=("bg_scale", "max_deg", "chunk",
                                   "want_color"))
def _eval_occupancy_chunked(pe_params, fc_params, points, *, bg_scale,
                            max_deg, chunk, want_color=True):
    fn = field_chunk_fn(is_background=True, scale=bg_scale,
                        max_deg=max_deg, want_color=want_color)
    return _map_chunks(fn, pe_params, fc_params, None, None,
                       points, chunk, want_color)


#: On-device uint8 color quantization (one dispatch per tile; the mesh
#: stores uint8 vertex colors anyway, so quantize before the download).
_rgb_to_u8 = jax.jit(
    lambda r: jnp.round(jnp.clip(r, 0.0, 1.0) * 255.0).astype(jnp.uint8))


def _pad_to_chunks(points: np.ndarray, chunk: int):
    n = len(points)
    n_pad = (-n) % chunk
    if n_pad:
        points = np.concatenate([points, np.zeros((n_pad, 3), points.dtype)])
    return points, n


#: Tail-tile pad sizes for eval_points (ascending; the final tile of a
#: query pads to the smallest bucket that holds it, full tiles always run
#: at `chunk`). Each size is one more compiled program per field type, so
#: the set is small; without it every distinct padded length compiles a
#: fresh XLA program and a 5k-vertex color re-query pays a full
#: 262144-point one (measured r4: vertex_color 86.1 s of a 161.7 s
#: mesh-all at stress scale).
_TAIL_BUCKETS = (4096, 16384, 65536)


def _tile_plan(n: int, chunk: int) -> list[tuple[int, int]]:
    """[(n_valid, padded_size), ...] covering n points: full `chunk` tiles
    plus one bucket-padded tail, so the number of DISTINCT program shapes
    is bounded by the bucket set rather than by the number of distinct
    query lengths."""
    plan = []
    off = 0
    while n - off >= chunk:
        plan.append((chunk, chunk))
        off += chunk
    tail = n - off
    if tail or not plan:
        size = next((b for b in _TAIL_BUCKETS if b >= tail and b < chunk),
                    chunk)
        plan.append((tail, size))
    return plan


# ---------------------------------------------------------------------------
# Device-resident grid evaluation (r4 mesh-all optimization).
#
# The r3 stress gate spent 319.5 s meshing 40 objects: per object the host
# built a grid_dim^3 x 3 float32 grid (200 MB at 256^3), shipped it over
# the ~134 MB/s tunnel, evaluated, pulled occupancy back, then ran a
# per-frame numpy space-carve loop over millions of points. Here the UNIT
# grid lives on device (cached per grid_dim) and each attempt ships only
# the 12-float affine; space carving runs inside the same jitted program
# (a lax.scan over carve views per tile), so the only per-attempt
# transfers are occupancy + seen-mask downloads.
# ---------------------------------------------------------------------------

_UNIT_GRID_CACHE: dict[tuple[int, int], tuple[jnp.ndarray, int]] = {}
_GRID_LOCK = _threading.Lock()


def _unit_grid(dim: int, chunk: int):
    """[-1, 1]^3 grid (ij-order, matching the host meshgrid layout) padded
    to a chunk multiple, resident on device. Returns (grid [n_pad, 3], n)."""
    with _GRID_LOCK:
        hit = _UNIT_GRID_CACHE.get((dim, chunk))
        if hit is not None:
            return hit
    t = np.linspace(-1.0, 1.0, dim, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    pts, n = _pad_to_chunks(pts, chunk)
    g = jnp.asarray(pts)
    with _GRID_LOCK:
        _UNIT_GRID_CACHE[(dim, chunk)] = (g, n)
    return g, n


def _carve_tile(pts_w, depths, T_wc, K, margin):
    """Seen-empty mask for one tile of world points, scanning over carve
    views in-graph (same rules as the host space_carve_mask)."""
    W, H = depths.shape[1], depths.shape[2]
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]

    def frame(seen, inp):
        T, depth = inp
        pc = (pts_w - T[:3, 3]) @ T[:3, :3]  # (p - t) @ Rcw.T, Rcw = R.T
        z = pc[:, 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1.0)
        px = fx * pc[:, 0] / safe_z + cx
        py = fy * pc[:, 1] / safe_z + cy
        ok = (z > 0.05) & (px >= 0) & (px <= W - 1) & \
             (py >= 0) & (py <= H - 1)
        ix = jnp.clip(jnp.round(jnp.where(ok, px, 0.0)).astype(jnp.int32),
                      0, W - 1)
        iy = jnp.clip(jnp.round(jnp.where(ok, py, 0.0)).astype(jnp.int32),
                      0, H - 1)
        obs = depth[ix, iy]
        hit = ok & (obs > 0) & (z < obs - margin)
        return seen | hit, None

    seen0 = jnp.zeros(pts_w.shape[0], bool)
    seen, _ = jax.lax.scan(frame, seen0, (T_wc, depths))
    return seen


@partial(jax.jit, static_argnames=("is_background", "scale", "max_deg",
                                   "carve"))
def _eval_grid_slab(pe, fc, sc, tc, slab, scale3, Tg_R, Tg_t,
                    Tw_R, Tw_t, depths, T_wc, K, margin, *,
                    is_background, scale, max_deg, carve):
    """(occ_u8, seen_empty) for ONE fixed-size slab of the affine-placed
    unit grid. pts = (slab * scale3) @ Tg_R.T + Tg_t; carve projects pts
    through Tw (grid->world) into every view.

    One slab-shaped program serves EVERY grid dim (the host loops over
    slabs): the former whole-grid program had a distinct tile count per
    dim bucket, and its per-dim trace/compile-load cost ~50 s of every
    stress-scale mesh-all even with a warm persistent cache
    (mesh_phase_s grid_eval.dim*.first).

    Occupancy ships uint8: the grid download is the dominant per-attempt
    transfer (67 MB f32 at 256^3 over the ~134 MB/s tunnel) and marching
    cubes only interpolates the 0.5 crossing — half a quantum (1/510) of
    iso-position error vs a 4x smaller transfer."""
    fn = field_chunk_fn(is_background=is_background, scale=scale,
                        max_deg=max_deg, want_color=False)
    pts = (slab * scale3) @ Tg_R.T + Tg_t
    occ = fn(pe, fc, sc, tc, pts)
    if carve:
        pts_w = pts @ Tw_R.T + Tw_t
        seen = _carve_tile(pts_w, depths, T_wc, K, margin)
        occ = jnp.where(seen, jnp.float32(0.0), occ)
    else:
        seen = jnp.zeros(pts.shape[0], bool)
    occ_u8 = jnp.round(jnp.clip(occ, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return occ_u8, seen


def host_grid_points(grid_dim: int, scale_np: np.ndarray,
                     transform_np: np.ndarray) -> np.ndarray:
    """Host mirror of the device grid placement (ij-order [-1,1]^3 cube,
    per-axis scale, then the 4x4 affine) — used by the sharded fallback
    and by tests stubbing `_grid_occ_seen` with analytic fields."""
    t = np.linspace(-1.0, 1.0, grid_dim, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    pts = (np.stack([gx, gy, gz], -1).reshape(-1, 3)
           * np.asarray(scale_np, np.float32))
    return (pts @ transform_np[:3, :3].T
            + transform_np[:3, 3]).astype(np.float32)


def _grid_occ_seen(params, cfg, shape_code, texture_code, *, grid_dim,
                   scale_np, transform_np, world_transform, carve,
                   is_background, voxel_w, device_mesh, chunk):
    """THE grid-evaluation seam of mesh_field: (occ [dim^3],
    seen_empty [dim^3] | None) for one affine grid placement. Module-level
    so tests can stub the whole evaluation with an analytic field
    (tests/test_mesher.py adaptive-bounds tests)."""
    if device_mesh is None:
        # Device-resident grid path: only the 12-float affine (and, on
        # carve, the margin scalar) ships per attempt; occupancy and the
        # seen-mask come back. The 200 MB host grid build + upload of the
        # old path was the dominant mesh-all transfer cost at 256^3.
        t0 = _time.time()
        grid_unit, n_valid = _unit_grid(grid_dim, chunk)
        if carve is not None:
            depths, T_wc, cam = carve
            depths_j = jnp.asarray(np.asarray(depths, np.float32))
            twc_j = jnp.asarray(np.asarray(T_wc, np.float32))
            K = jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
            Tw = (np.asarray(world_transform, np.float32)
                  if world_transform is not None
                  else np.eye(4, dtype=np.float32))
        else:
            depths_j = jnp.zeros((1, 1, 1), jnp.float32)
            twc_j = jnp.zeros((1, 4, 4), jnp.float32)
            K = jnp.zeros((4,), jnp.float32)
            Tw = np.eye(4, dtype=np.float32)
        sc_j = (jnp.asarray(shape_code) if shape_code is not None
                else jnp.zeros((0,), jnp.float32))
        tc_j = (jnp.asarray(texture_code) if texture_code is not None
                else jnp.zeros((0,), jnp.float32))
        args = (jnp.asarray(scale_np, jnp.float32),
                jnp.asarray(transform_np[:3, :3]),
                jnp.asarray(transform_np[:3, 3]),
                jnp.asarray(Tw[:3, :3]), jnp.asarray(Tw[:3, 3]),
                depths_j, twc_j, K, jnp.float32(3.0 * voxel_w))
        # host loop over fixed-shape slabs: every dim bucket reuses the
        # SAME compiled program; all slabs are dispatched (async) before
        # any result is pulled so compute and downloads overlap
        slabs = grid_unit.reshape(-1, chunk, 3)
        outs = [
            _eval_grid_slab(
                params["pe"], params["fc"], sc_j, tc_j, slabs[i], *args,
                is_background=is_background,
                scale=cfg.bg_scale if is_background else cfg.obj_scale,
                max_deg=cfg.n_unidir_funcs, carve=carve is not None)
            for i in range(slabs.shape[0])
        ]
        occ = np.concatenate(
            [np.asarray(o) for o, _ in outs])[:n_valid].astype(
            np.float32) / 255.0
        seen_empty = (np.concatenate(
            [np.asarray(s) for _, s in outs])[:n_valid]
            if carve is not None else None)
        dt = _time.time() - t0
        _t_add("grid_eval", dt)
        # Per-program-shape attribution: the first call for a (dim,
        # field-type, carve) key pays the XLA compile (or the persistent-
        # cache load); later same-bucket objects reuse it. Splitting the
        # two answers "how much of grid_eval is compile?" directly in the
        # stress gate's mesh_phase_s (VERDICT r4 item #3b).
        prog_key = (grid_dim, is_background, carve is not None)
        with _TIMINGS_LOCK:
            first = prog_key not in _GRID_PROGS_SEEN
            _GRID_PROGS_SEEN.add(prog_key)
        _t_add(f"grid_eval.dim{grid_dim}" + (".first" if first else ""), dt)
        return occ, seen_empty

    # host-grid fallback: the sharded (multi-chip) grid path consumes host
    # points (parallel/grid_eval.py)
    t0 = _time.time()
    grid_pts = host_grid_points(grid_dim, scale_np, transform_np)
    occ, _ = eval_points(grid_pts, params, cfg, shape_code, texture_code,
                         is_background=is_background, want_color=False,
                         device_mesh=device_mesh)
    # mirror the device path's uint8 occupancy quantization (same f32
    # clip*255+round) so sharded and single-device meshes stay
    # byte-identical
    occ = np.round(np.clip(occ.astype(np.float32), np.float32(0),
                           np.float32(1)) * np.float32(255)
                   ).astype(np.uint8).astype(np.float32) / 255.0
    _t_add("grid_eval", _time.time() - t0)
    seen_empty = None
    if carve is not None:
        t0 = _time.time()
        if world_transform is not None:
            pts_w = (grid_pts @ world_transform[:3, :3].T
                     + world_transform[:3, 3])
        else:
            pts_w = grid_pts
        depths, T_wc, cam = carve
        seen_empty = space_carve_mask(pts_w, depths, T_wc, cam,
                                      margin=3.0 * voxel_w)
        _t_add("carve_host", _time.time() - t0)
    return occ, seen_empty


def eval_points(points: np.ndarray, params: dict, cfg: Config,
                shape_code=None, texture_code=None, *, is_background: bool,
                chunk: int = 262144, want_color: bool = True,
                want_occ: bool = True, color_u8: bool = False,
                device_mesh=None):
    """(occ, color) at arbitrary 3D points, chunked on device
    (ref: src/trainer.py:125-151). want_color=False skips the color branch
    and its device->host transfer (grid passes only need occupancy);
    want_occ=False computes occupancy in-graph but skips its download
    (the vertex-color re-query discards it — 4 MB per 262k tile over the
    tunnel); color_u8 quantizes colors to uint8 ON DEVICE (the mesh wants
    uint8 anyway — a 4x smaller transfer).
    device_mesh: a jax.sharding.Mesh routes the evaluation data-parallel
    over all its devices (parallel/grid_eval.py; bitwise-identical output,
    zero collectives)."""
    if device_mesh is not None and device_mesh.devices.size > 1:
        from catnerf_tpu.parallel.grid_eval import eval_points_sharded

        return eval_points_sharded(
            points, params, cfg, device_mesh, shape_code, texture_code,
            is_background=is_background, chunk=chunk, want_color=want_color)
    pts_np = np.asarray(points, np.float32)
    n = len(pts_np)
    if not is_background:
        sc, tc = jnp.asarray(shape_code), jnp.asarray(texture_code)
    # Host loop over fixed-shape tiles: every full tile reuses ONE compiled
    # program and the tail pads to a _TAIL_BUCKETS size, instead of jitting
    # the whole padded query (one XLA compile per distinct length). All
    # tiles are dispatched before any result is pulled, so device compute
    # and the device->host transfers overlap across tiles.
    parts, off = [], 0
    for n_valid, size in _tile_plan(n, chunk):
        tile, _ = _pad_to_chunks(pts_np[off:off + n_valid], size)
        pts = jnp.asarray(tile)
        if is_background:
            occ, rgb = _eval_occupancy_chunked(
                params["pe"], params["fc"], pts, bg_scale=cfg.bg_scale,
                max_deg=cfg.n_unidir_funcs, chunk=size,
                want_color=want_color)
        else:
            occ, rgb = _eval_codenerf_chunked(
                params["pe"], params["fc"], sc, tc, pts,
                obj_scale=cfg.obj_scale, max_deg=cfg.n_unidir_funcs,
                chunk=size, want_color=want_color)
        if color_u8 and rgb is not None:
            rgb = _rgb_to_u8(rgb)
        parts.append((n_valid, occ, rgb))
        off += n_valid
    occ = (np.concatenate([np.asarray(o[:m]) for m, o, _ in parts])[:n]
           if want_occ else None)
    rgb = (np.concatenate([np.asarray(r[:m]) for m, _, r in parts])[:n]
           if want_color else None)
    return occ, rgb


def adaptive_grid_dim(extent, live_voxel_size: float, grid_dim_max: int) -> int:
    """min(max_extent // live_voxel + 1, grid_dim) (ref: train.py:220,229),
    rounded UP to a multiple of 32 so objects of similar size share one
    compiled grid-eval program (per-object exact dims would trigger an XLA
    recompile per object; the extra resolution only refines the mesh)."""
    dim = int(np.minimum(np.max(extent) // live_voxel_size + 1, grid_dim_max))
    return int(min(-(-dim // 32) * 32, grid_dim_max))


def mesh_field(params: dict, cfg: Config, *, grid_dim: int,
               is_background: bool, shape_code=None, texture_code=None,
               bound=None, extent=None, extent_canon=None, carve=None,
               world_transform=None, device_mesh=None) -> TriMesh | None:
    """Extract one object's colored mesh (ref: src/trainer.py:62-123).

    Two layouts, as in the reference:
      * `bound` (OrientedBBox) given — background / single-instance
        categories: the grid lives in world frame via the OBB transform.
      * `extent` given — multi-instance categories: the grid lives in the
        normalized canonical object frame (extent / max(extent/2)).
    Returns the mesh in the same frame as the grid; the caller applies the
    sim(3) object->world transform for multi-instance categories
    (ref: train.py:233-243).

    Adaptive bounds (cfg.mesh_adaptive_bounds, ours — the reference clips):
    OBB extents come from *observed* point clouds, so unobserved parts of an
    object can fall outside the eval grid and get clipped from the mesh
    (measured 9-24% surface loss on the registered synthetic gate,
    scripts/diag_registration.py). When the extracted iso-surface touches a
    grid boundary face, that side's bound grows 30% and the grid re-evaluates
    (up to 3 times) until the surface is enclosed.

    Space carving (cfg.mesh_space_carving, ours): `carve` =
    (depths (n, W, H), T_wc (n, 4, 4), cam) marks grid voxels that any
    training view observed to be free space and zeroes their occupancy —
    removing spurious never-supervised occupancy before extraction.
    `world_transform` (sim(3)) maps the grid frame to world for carving
    when the grid is canonical (multi-instance categories).
    """
    occ_range = (-1.0, 1.0)
    range_dist = occ_range[1] - occ_range[0]
    bound_extent = BOUND_EXTENT_BG if is_background else BOUND_EXTENT_OBJ

    if bound is not None:
        base_extent = np.asarray(bound.extent, np.float64)
        R = np.asarray(bound.R, np.float64)
        center = np.asarray(bound.center, np.float64)
    elif extent_canon is not None:
        # category-union canonical box (cfg.mesh_category_extent): RAW
        # canonical units, deliberately NOT re-normalized — a member whose
        # canonical cloud extends past the instance's own unit-normalized
        # box (blind-spot coverage by a better-observed member) must grow
        # the grid, which extent / max(extent/2) would undo.
        base_extent = np.asarray(extent_canon, np.float64)
        R = None
        center = np.zeros(3)
    else:
        assert extent is not None
        base_extent = (np.asarray(extent, np.float64)
                       / np.max(np.asarray(extent) / 2.0))
        R = None
        center = np.zeros(3)

    lo = -base_extent / (range_dist * bound_extent)  # per-axis box bounds in
    hi = -lo                                         # the grid's local frame
    max_grow = 3 if (cfg.mesh_adaptive_bounds and not is_background) else 0

    chunk = 262144
    do_carve = carve is not None and not is_background
    if world_transform is not None:
        ws = abs(np.linalg.det(world_transform[:3, :3])) ** (1 / 3)
    else:
        ws = 1.0

    for attempt in range(max_grow + 1):
        scale_np = (hi - lo) / 2.0
        offset = (hi + lo) / 2.0
        transform_np = np.eye(4, dtype=np.float32)
        transform_np[:3, :3] = R if R is not None else np.eye(3)
        transform_np[:3, 3] = center + (R @ offset if R is not None else offset)
        voxel_w = float(np.max(scale_np)) * 2.0 / (grid_dim - 1) * ws
        occ, seen_empty = _grid_occ_seen(
            params, cfg, shape_code, texture_code, grid_dim=grid_dim,
            scale_np=scale_np, transform_np=transform_np,
            world_transform=world_transform,
            carve=carve if do_carve else None,
            is_background=is_background, voxel_w=voxel_w,
            device_mesh=device_mesh, chunk=chunk)
        if seen_empty is not None:
            occ = np.where(seen_empty, np.float32(0.0), occ)
        if occ.max() <= 0.5:  # nothing to extract anywhere in the grid
            return None
        if occ.min() >= 0.5:
            # grid lies entirely INSIDE the object (OBB from sparse
            # observed points can under-bound badly): this is exactly the
            # case adaptive growth exists for — grow every side instead of
            # giving up before the boundary-face check can run
            if attempt == max_grow:
                return None
            pad = 0.3 * (hi - lo)
            lo -= pad
            hi += pad
            continue
        occ3 = occ.reshape(grid_dim, grid_dim, grid_dim)
        seen_empty3 = (seen_empty.reshape(occ3.shape)
                       if seen_empty is not None else None)
        if attempt == max_grow:
            break
        # boundary-face occupancy -> grow that side by 30%
        faces = [(0, 0, occ3[0]), (0, 1, occ3[-1]),
                 (1, 0, occ3[:, 0]), (1, 1, occ3[:, -1]),
                 (2, 0, occ3[:, :, 0]), (2, 1, occ3[:, :, -1])]
        grew = False
        for axis, side, face in faces:
            if (face > 0.5).any():
                pad = 0.3 * (hi[axis] - lo[axis])
                if side == 0:
                    lo[axis] -= pad
                else:
                    hi[axis] += pad
                grew = True
        if not grew:
            break

    if R is None:
        # canonical-frame path: keep transform only if the box moved
        if np.allclose((hi + lo), 0.0):
            transform_np = None
    if cfg.mesh_fill_interior and not is_background:
        # vMAP-style fields are supervised only in a crust around observed
        # surfaces; deep inside an object the occupancy decays below the 0.5
        # level again and marching cubes extracts a spurious INNER shell
        # (the reference has the same artifact). Raise interior empty
        # regions above the level; the outer crossing band keeps its exact
        # values, so subvoxel interpolation is unaffected.
        t0 = _time.time()
        occ3 = _fill_unobservable_interior(occ3, observed_free=seen_empty3)
        _t_add("fill_interior", _time.time() - t0)

    t0 = _time.time()
    out = geomlib.marching_cubes(occ3, 0.5,
                                 method=getattr(cfg, "mesh_method", "mc"))
    _t_add("marching_cubes", _time.time() - t0)
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

    # vertex colors by re-query (ref: src/trainer.py:111-121); occupancy
    # is computed but not downloaded, colors come back uint8 (the mesh
    # stores uint8) — 16x less transfer than f32 occ+rgb
    t0 = _time.time()
    _, color = eval_points(mesh.vertices.astype(np.float32), params, cfg,
                           shape_code, texture_code,
                           is_background=is_background,
                           want_occ=False, color_u8=device_mesh is None,
                           device_mesh=device_mesh)
    # the f32 (sharded) branch ROUNDS like the device uint8 path so both
    # produce byte-identical vertex colors
    mesh.vertex_colors = (color if color.dtype == np.uint8
                          else np.round(
                              np.clip(color.astype(np.float32), np.float32(0),
                                      np.float32(1)) * np.float32(255)
                          ).astype(np.uint8))
    _t_add("vertex_color", _time.time() - t0)
    return mesh


def build_carve_views(session):
    """Carve-view tuple (depths, T_wc, cam) from the session's training
    views, or None when cfg.mesh_space_carving is off / no views exist."""
    cfg = session.cfg
    if not (cfg.mesh_space_carving and getattr(session, "sample_dict", None)):
        return None
    frames = sorted(session.sample_dict.keys())
    # subsample views: carving converges quickly with a handful
    frames = frames[:: max(1, len(frames) // 12)]
    depths = np.stack(
        [np.asarray(session.sample_dict[f]["depth"]) for f in frames])
    T_wc = np.stack(
        [np.asarray(session.sample_dict[f]["T"]) for f in frames])
    return (depths, T_wc, session.cam)


def mesh_object(session, obj_id: int, *, carve="auto",
                device_mesh=None):
    """Mesh ONE object (obj_id 0 = background) in SCENE frame — the
    per-object body of mesh_scene, exposed so serving (/mesh) can extract
    a single object without meshing the whole scene. Returns a TriMesh or
    None (marching failure / missing bound). carve='auto' derives the
    space-carving views from the session; pass a prebuilt tuple (or None)
    when meshing many objects."""
    cfg = session.cfg
    if carve == "auto":
        carve = build_carve_views(session)

    if obj_id == 0:
        if session.background is None or session.background.bound is None:
            return None
        bound = session.background.bound
        dim = adaptive_grid_dim(bound.extent, cfg.live_voxel_size,
                                cfg.grid_dim)
        return mesh_field(session.background_params(), cfg, grid_dim=dim,
                          is_background=True, bound=bound,
                          device_mesh=device_mesh)

    for cls_id, cat in zip(session.cls_ids, session.categories):
        if obj_id in cat.inst_id_to_index:
            break
    else:
        raise KeyError(f"unknown object id {obj_id}")
    params = session.category_params(cls_id)
    multi = cat.n_obj > 1
    k = cat.inst_id_to_index[obj_id]
    sc = np.asarray(params["shape_codes"][k])
    tc = np.asarray(params["texture_codes"][k])
    if multi:
        extent = cat.extent_dict[obj_id]
        extent_canon = None
        if getattr(cfg, "mesh_category_extent", False):
            # category-union canonical extent: members share the canonical
            # frame, so a better-observed member's canonical box covers a
            # rim-eroded member's blind spots (up to 34% of GT surface
            # outside the per-instance grid, diag_registration)
            exts = []
            for oid in cat.obj_ids:
                e = cat.extent_dict.get(oid)
                t = cat.object_tensor_dict.get(oid)
                if e is not None and t is not None and float(t[0]) > 0:
                    exts.append(np.asarray(e, np.float64) / float(t[0]))
            if len(exts) > 1:
                extent_canon = np.max(exts, axis=0)
        # the union box is larger than the instance's own normalized box
        # (max component 2.0); scale the adaptive dim by that growth so
        # the voxel size in world units is preserved (a grown box at the
        # same dim coarsens the mesh — measured -1.1 cm accuracy on the
        # asym-ScanNet gate's obj5)
        growth = (float(np.max(extent_canon)) / 2.0
                  if extent_canon is not None else 1.0)
        dim = adaptive_grid_dim(np.asarray(extent) * max(1.0, growth),
                                cfg.live_voxel_size, cfg.grid_dim)
        obj_tensor = cat.object_tensor_dict[obj_id]
        T_world = tensor_to_se3_np(obj_tensor[1:])
        T_world = T_world.copy()
        T_world[:3, :3] *= float(obj_tensor[0])  # sim(3) scale
        mesh = mesh_field(params, cfg, grid_dim=dim,
                          is_background=False, shape_code=sc,
                          texture_code=tc, extent=extent,
                          extent_canon=extent_canon,
                          carve=carve, world_transform=T_world,
                          device_mesh=device_mesh)
        if mesh is not None:
            # canonical -> scene: sim(3) scale then rigid transform
            # (ref: train.py:233-243)
            mesh.apply_scale(float(obj_tensor[0]))
            mesh.apply_transform(tensor_to_se3_np(obj_tensor[1:]))
        return mesh
    bound = cat.bound_dict.get(obj_id)
    if bound is None:
        return None
    dim = adaptive_grid_dim(bound.extent, cfg.live_voxel_size, cfg.grid_dim)
    return mesh_field(params, cfg, grid_dim=dim, is_background=False,
                      shape_code=sc, texture_code=tc, bound=bound,
                      carve=carve, device_mesh=device_mesh)


def mesh_scene(session, out_dir: str, iteration: int,
               device_mesh=None,
               only_objects: list[int] | None = None) -> dict[int, str]:
    """Mesh every object + background and export .obj files in scene frame
    (ref: train.py:214-243). Returns {obj_id or 0: path}. device_mesh
    (optional jax.sharding.Mesh) shards every grid/color evaluation
    data-parallel over its devices (parallel/grid_eval.py).
    only_objects: restrict to these obj ids (background 0 included only if
    listed)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    written: dict[int, str] = {}
    carve = build_carve_views(session)

    obj_ids = [0] + [obj_id for cat in session.categories
                     for obj_id in cat.obj_ids]
    if only_objects is not None:
        obj_ids = [o for o in obj_ids if o in set(only_objects)]

    def one(obj_id):
        mesh = mesh_object(session, obj_id, carve=carve,
                           device_mesh=device_mesh)
        if mesh is None:
            return obj_id, None
        path = os.path.join(out_dir,
                            f"iteration_{iteration}_obj{obj_id}.obj")
        t0 = _time.time()
        mesh.export(path)
        _t_add("export", _time.time() - t0)
        return obj_id, path

    # Two objects in flight: device grid-eval of object k+1 overlaps the
    # host phases (interior fill, marching cubes, export) of object k —
    # device dispatches serialize on the chip, host work runs during the
    # device wait (r4 mesh-all pipeline; the C++/numpy phases release the
    # GIL for their bulk). Sequential when sharded: the multi-chip grid
    # path shares the mesh across objects.
    if device_mesh is None and len(obj_ids) > 1:
        with ThreadPoolExecutor(max_workers=2) as pool:
            results = list(pool.map(one, obj_ids))
    else:
        results = [one(o) for o in obj_ids]
    for obj_id, path in results:
        if path is None:
            if obj_id != 0:
                print(f"mesh failed obj {obj_id}")
            continue
        written[obj_id] = path
    return written
