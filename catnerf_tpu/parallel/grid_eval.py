"""Multi-chip grid/field evaluation: data-parallel over points.

Mesh extraction and the eval CLIs push millions of grid points through the
trained fields; the reference runs this as a single-GPU 500k-point chunk
loop (ref: src/trainer.py:125-151). The computation is embarrassingly
parallel over points — no category/expert structure, no cross-point
reduction — so the multi-chip layout shards the TILE axis across every
device of the mesh (the 'data' and 'model' axes flattened together) and
each device `lax.map`s over its local tiles, exactly the single-chip tiling
discipline of `mesher/meshing.eval_points`.

`shard_map` makes the zero-collective property structural: params enter
replicated, occupancies leave tile-sharded, and nothing else can cross
chips (asserted from compiled HLO in tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from catnerf_tpu.config import Config
from catnerf_tpu.mesher.meshing import field_chunk_fn
from catnerf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# compiled programs keyed by (mesh devices, field kind, scale, max_deg,
# chunk, want_color) — same reuse discipline as the single-chip
# @jit(static_argnames) evaluators in mesher/meshing.py
_PROGRAMS: dict = {}


def _mesh_key(mesh: Mesh):
    return tuple(d.id for d in mesh.devices.flat)


def make_sharded_grid_eval(cfg: Config, mesh: Mesh, *, is_background: bool,
                           chunk: int, want_color: bool = False):
    """Compile (pe, fc, shape_code, texture_code, tiles) -> occ [, rgb]
    with the tile axis sharded over every device of `mesh`. `tiles` is
    [n_tiles, chunk, 3] with n_tiles divisible by the device count."""
    key = (_mesh_key(mesh), bool(is_background),
           float(cfg.bg_scale if is_background else cfg.obj_scale),
           int(cfg.n_unidir_funcs), int(chunk), bool(want_color))
    prog = _PROGRAMS.get(key)
    if prog is not None:
        return prog

    # the per-tile math is SHARED with the single-chip evaluators
    # (mesher/meshing.py::field_chunk_fn) so the two paths cannot diverge
    fn = field_chunk_fn(
        is_background=is_background,
        scale=cfg.bg_scale if is_background else cfg.obj_scale,
        max_deg=cfg.n_unidir_funcs, want_color=want_color)
    tile_spec = P((DATA_AXIS, MODEL_AXIS))
    repl = P()

    def local(pe, fc, sc, tc, tiles):
        # tiles here are the device-local shard: lax.map bounds per-device
        # memory to one chunk of intermediates, as on a single chip
        return jax.lax.map(lambda p: fn(pe, fc, sc, tc, p), tiles)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(repl, repl, repl, repl, tile_spec),
        out_specs=(tile_spec, tile_spec) if want_color else tile_spec,
    )
    prog = jax.jit(sharded)
    _PROGRAMS[key] = prog
    return prog


def eval_points_sharded(points: np.ndarray, params: dict, cfg: Config,
                        mesh: Mesh, shape_code=None, texture_code=None, *,
                        is_background: bool, chunk: int = 262144,
                        want_color: bool = True):
    """Drop-in sharded counterpart of `mesher.meshing.eval_points`:
    (occ, color) at arbitrary 3D points, evaluated data-parallel over all
    devices of `mesh`. Pads to a whole number of tiles per device."""
    n_dev = mesh.devices.size
    pts = np.asarray(points, np.float32)
    n = len(pts)
    # shrink the tile below the single-chip default when the input is small:
    # padding to chunk*n_dev would otherwise make an 8-device eval of a
    # 30k-point color re-query do 8x the single-chip work. Snapped to 8k
    # multiples so only a handful of programs ever compile.
    chunk = min(chunk, max(8192, -(-n // (n_dev * 8192)) * 8192))
    quantum = chunk * n_dev
    n_pad = (-n) % quantum
    if n_pad:
        pts = np.concatenate([pts, np.zeros((n_pad, 3), np.float32)])
    # device_put straight from numpy: each device pulls only its 1/n_dev
    # shard from the host (a jnp.asarray first would materialize the whole
    # grid on device 0 and reshard device-to-device)
    tiles = jax.device_put(
        pts.reshape(-1, chunk, 3),
        NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS))))

    prog = make_sharded_grid_eval(cfg, mesh, is_background=is_background,
                                  chunk=chunk, want_color=want_color)
    zero = jnp.zeros((), jnp.float32)
    sc = jnp.asarray(shape_code) if shape_code is not None else zero
    tc = jnp.asarray(texture_code) if texture_code is not None else zero
    out = prog(params["pe"], params["fc"], sc, tc, tiles)
    if want_color:
        occ, rgb = out
        return (np.asarray(occ).reshape(-1)[:n],
                np.asarray(rgb).reshape(-1, 3)[:n])
    return np.asarray(out).reshape(-1)[:n], None
