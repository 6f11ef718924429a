"""Device-resident ray buffers + in-jit batch sampling.

The production fast path: instead of host-side numpy gather + per-step
host->device transfer (the parity-mode `SceneBatcher`), the entire flattened
ray store lives in HBM as fixed-shape padded arrays and each step draws its
batch with on-device RNG inside the jitted program. Combined with the
multi-step `superstep` (lax.scan over several optimizer steps per dispatch)
this removes host round-trips from the hot loop entirely — the reference
pays a CPU->GPU copy per category per step (ref:
src/scene_cateogries.py:369-372,424-428).

Sampling is uniform-with-replacement per step (the reference's
epoch-shuffle-without-replacement cursor is statistically equivalent for
training; parity mode keeps the exact semantics).
"""

from __future__ import annotations

import time as _time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.data.scene import CategoryScene
from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch
from catnerf_tpu.utils import phase_add


_CAT_COLS = 12  # origins 0:3 | dirs 3:6 | rgb 6:9 | depth 9 | state 10 | obj 11
_BG_COLS = 11   # same minus obj_idx


class DeviceRayStore(NamedTuple):
    """Row-packed ray buffers: every per-ray field lives in one float32 row
    so a training batch is ONE gather op (column layout above; state/obj_idx
    are small ints, exact in f32).

    packed: [n_cls, max_len * 12] — rows stored FLAT per category.
    A [n_cls, max_len, 12] array gets an XLA TPU tiled layout that pads the
    minor dims to the (8, 128) tile: at room_0 scale (19 x 2M x 12) that is
    a 13.5x physical blowup, 24.6 GB HBM for a 1.8 GB logical array
    (measured RESOURCE_EXHAUSTED, scripts/stress_scale.py). Flat rows keep
    the huge axis minor, so tile padding is negligible; every access is a
    12-wide contiguous slice, so batch draws stay single-gather.

    lengths: [n_cls] valid ray counts.
    bg_packed: [(n_bg + pad) * 11] flat (optional) + scalar length.
    """

    packed: jnp.ndarray
    lengths: jnp.ndarray
    bg_packed: jnp.ndarray | None = None
    bg_length: jnp.ndarray | None = None


def _pack_rows(arrays: dict, n: int, with_obj: bool,
               out: np.ndarray | None = None) -> np.ndarray:
    """Pack a ray buffer into flat f32 rows; `out` (a view into the store)
    writes in place, skipping one full-store copy."""
    cols = _CAT_COLS if with_obj else _BG_COLS
    if out is None:
        out = np.zeros((n, cols), np.float32)
    out[:, 0:3] = arrays["origins"]
    out[:, 3:6] = arrays["dirs"]
    out[:, 6:9] = np.asarray(arrays["rgb"], np.float32) / 255.0
    out[:, 9] = arrays["depth"]
    out[:, 10] = arrays["state"]
    if with_obj:
        out[:, 11] = arrays["obj_idx"]
    return out


def _unpack_cat(rows: jnp.ndarray) -> CategoryBatch:
    return CategoryBatch(
        rgbs=rows[..., 6:9], states=rows[..., 10].astype(jnp.int32),
        depth=rows[..., 9], origins=rows[..., 0:3], dirs=rows[..., 3:6],
        obj_indices=rows[..., 11].astype(jnp.int32))


def _unpack_bg(rows: jnp.ndarray) -> BackgroundBatch:
    return BackgroundBatch(
        rgbs=rows[..., 6:9], states=rows[..., 10].astype(jnp.int32),
        depth=rows[..., 9], origins=rows[..., 0:3], dirs=rows[..., 3:6])


def build_device_store(categories: list[CategoryScene],
                       background: CategoryScene | None,
                       window_pad: int = 0,
                       bg_window_pad: int = 0) -> DeviceRayStore:
    """window_pad / bg_window_pad: extra rows per buffer holding a cyclic
    repetition of its first rows, sized to the per-step batch, so windowed
    sampling (`sample_batch(..., window=True)`) can take a dynamic_slice at
    any offset in [0, length) without wraparound logic."""
    max_len = max(c.buffer.n for c in categories) + window_pad
    # sample_batch's non-window path computes flat element indices
    # (idx + cls*max_len)*12 in int32; past 2**31 they silently wrap and
    # corrupt batches. A store that large (~8.6 GB) should have been capped
    # via cfg.max_store_rays_per_cat long before this point.
    if len(categories) * max_len * _CAT_COLS >= 2 ** 31:
        raise ValueError(
            f"device ray store too large for int32 flat indexing: "
            f"{len(categories)} cls x {max_len} rows x {_CAT_COLS} cols >= "
            f"2**31 elements; cap the store with cfg.max_store_rays_per_cat")
    t_pack = _time.time()
    packed = np.zeros((len(categories), max_len, _CAT_COLS), np.float32)
    for i, c in enumerate(categories):
        rows = _pack_rows(c.buffer.arrays, c.buffer.n, True,
                          out=packed[i, : c.buffer.n])
        if window_pad:
            packed[i, c.buffer.n : c.buffer.n + window_pad] = np.resize(
                rows, (window_pad, _CAT_COLS))
    phase_add("fast_path", "store_pack", _time.time() - t_pack)
    t_up = _time.time()
    kwargs = dict(
        packed=jnp.asarray(packed.reshape(len(categories), -1)),
        lengths=jnp.asarray([c.buffer.n for c in categories], jnp.int32),
    )
    phase_add("fast_path", "store_upload_dispatch", _time.time() - t_up)
    if background is not None:
        b = background.buffer.arrays
        n = b["depth"].shape[0]
        t_pack = _time.time()
        bg_rows = _pack_rows(b, n, False)
        if (n + bg_window_pad) * _BG_COLS >= 2 ** 31:
            raise ValueError(
                f"background ray store too large for int32 flat indexing: "
                f"{n + bg_window_pad} rows x {_BG_COLS} cols >= 2**31 "
                f"elements; cap the store with cfg.max_store_rays_bg")
        if bg_window_pad:
            bg_rows = np.concatenate(
                [bg_rows, np.resize(bg_rows, (bg_window_pad, _BG_COLS))])
        phase_add("fast_path", "store_pack", _time.time() - t_pack)
        t_up = _time.time()
        kwargs.update(
            bg_packed=jnp.asarray(bg_rows.reshape(-1)),
            bg_length=jnp.asarray(n, jnp.int32),
        )
        phase_add("fast_path", "store_upload_dispatch", _time.time() - t_up)
    return DeviceRayStore(**kwargs)


def _concrete_pad(buf, length, cols: int) -> int | None:
    """Padding rows past the longest valid buffer, or None when the store
    is traced (shape/length not readable at Python level). `buf` holds
    flat rows (cols floats per ray) on its last axis."""
    if isinstance(buf, jax.core.Tracer) or isinstance(length,
                                                      jax.core.Tracer):
        return None
    return int(buf.shape[-1]) // cols - int(np.max(np.asarray(length)))


def check_window_pad(store: DeviceRayStore, n_per_cls: int,
                     n_bg: int | None = None) -> None:
    """Validate that a store was built with enough window padding for a
    windowed draw of `n_per_cls` rays (and `n_bg` bg rays unless None).
    A short pad means the dynamic_slice clamps into the zero padding and
    training silently consumes all-zero rays (origin=dir=rgb=depth=0).
    Tolerant of traced stores (no-op when shapes/lengths aren't concrete) —
    factories that take concrete stores must call this themselves."""
    pad = _concrete_pad(store.packed, store.lengths, _CAT_COLS)
    if pad is not None and pad < n_per_cls:
        raise ValueError(
            f"window draw of {n_per_cls} rays needs a store built "
            f"with window_pad >= {n_per_cls} (store has {pad} pad "
            "rows); rows past the pad are zeros")
    if n_bg is not None and store.bg_packed is not None:
        bpad = _concrete_pad(store.bg_packed, store.bg_length, _BG_COLS)
        if bpad is not None and bpad < n_bg:
            raise ValueError(
                f"window draw of {n_bg} bg rays needs bg_window_pad "
                f">= {n_bg} (store has {bpad} pad rows)")


def sample_batch(store: DeviceRayStore, key: jax.Array, n_per_cls: int,
                 n_bg: int, *, window: bool = False,
                 per_category_gather: bool = False,
                 want_bg: bool = True):
    """Draw (CategoryBatch, BackgroundBatch|None) fully on device.

    window=False: one fused randint + ONE flat row-gather for all categories
    (uniform with replacement). window=True (requires a store built with
    matching window_pad): one random offset per buffer + a contiguous
    dynamic_slice of the build-time-shuffled rows — a uniform cyclic window,
    without replacement within the step, exactly the execution shape of the
    reference's epoch cursor over a shuffled buffer (ref:
    src/scene_cateogries.py:421-449) minus the per-epoch reshuffle. ~9 dense
    slices instead of ~3k scattered row-gathers: the gather's HBM random
    access was ~13% of the train step.

    per_category_gather: use take_along_axis per category instead of the
    flat-index gather — required on a category-sharded (EP) store, where
    the flat reshape would cross the sharded axis. The window path is
    already shard-local (vmapped per-category dynamic_slice).

    want_bg=False skips the background draw entirely (a store carrying bg
    buffers for a background-less step must not pay the per-step gather)."""
    n_cls = store.packed.shape[0]
    max_len = store.packed.shape[1] // _CAT_COLS
    k_cat, k_bg = jax.random.split(key)

    # Rows live FLAT on the last axis (12 floats per ray, see
    # DeviceRayStore); ray index i occupies [i*12, (i+1)*12). Indexing is
    # widened in flat units so no [.., max_len, 12] intermediate (whose
    # tiled layout blows up HBM) is ever formed.
    col = jnp.arange(_CAT_COLS, dtype=jnp.int32)
    if window:
        check_window_pad(store, n_per_cls, n_bg if want_bg else None)
        offs = jax.random.randint(k_cat, (n_cls,), 0, store.lengths)
        rows = jax.vmap(
            lambda p, o: jax.lax.dynamic_slice_in_dim(
                p, o * _CAT_COLS, n_per_cls * _CAT_COLS, axis=0)
        )(store.packed, offs).reshape(n_cls, n_per_cls, _CAT_COLS)
    elif per_category_gather:
        idx = jax.random.randint(k_cat, (n_cls, n_per_cls), 0,
                                 store.lengths[:, None])
        flat = idx[:, :, None] * _CAT_COLS + col[None, None, :]
        rows = jnp.take_along_axis(
            store.packed, flat.reshape(n_cls, -1), axis=1
        ).reshape(n_cls, n_per_cls, _CAT_COLS)
    else:
        idx = jax.random.randint(k_cat, (n_cls, n_per_cls), 0,
                                 store.lengths[:, None])
        base = (idx + (jnp.arange(n_cls) * max_len)[:, None])
        flat = (base[:, :, None] * _CAT_COLS + col[None, None, :]).reshape(-1)
        rows = jnp.take(store.packed.reshape(-1), flat,
                        axis=0).reshape(n_cls, n_per_cls, _CAT_COLS)
    cat = _unpack_cat(rows)

    bg = None
    if store.bg_packed is not None and want_bg:
        bcol = jnp.arange(_BG_COLS, dtype=jnp.int32)
        if window:
            boff = jax.random.randint(k_bg, (), 0, store.bg_length)
            bg_rows = jax.lax.dynamic_slice_in_dim(
                store.bg_packed, boff * _BG_COLS, n_bg * _BG_COLS, axis=0
            ).reshape(n_bg, _BG_COLS)
        else:
            bidx = jax.random.randint(k_bg, (n_bg,), 0, store.bg_length)
            bflat = (bidx[:, None] * _BG_COLS + bcol[None, :]).reshape(-1)
            bg_rows = jnp.take(store.bg_packed, bflat,
                               axis=0).reshape(n_bg, _BG_COLS)
        bg = _unpack_bg(bg_rows)
    return cat, bg


def make_superstep(step_fn_nojit, store: DeviceRayStore, n_per_cls: int,
                   n_bg: int, n_inner: int, donate: bool = True,
                   window: bool = False, unroll: int = 1):
    """One dispatch = `n_inner` optimizer steps via lax.scan, each drawing a
    fresh on-device batch. Returns jitted (state, key) -> (state, metrics of
    the last inner step). `unroll` unrolls the scan body (same numerics).

    The store is passed INTO the jitted program as an argument, never closed
    over: a closed-over device array is embedded as an MLIR constant, which
    pulls it device->host during lowering (80+ s for multi-MB buffers over
    the axon tunnel — measured on field_pretrain's identical pattern) and
    ships it back inside the compiled binary. Bench-scale stores are ~1 MB,
    real-scene stores are GBs — the argument form costs nothing and is safe
    at every scale. Window-pad validation runs HERE (the store is concrete
    in the factory; inside the trace it is not inspectable)."""
    if window:
        check_window_pad(store, n_per_cls, n_bg)

    def superstep(state, key, store):
        def body(state, k):
            k_draw, k_step = jax.random.split(k)
            cat, bg = sample_batch(store, k_draw, n_per_cls, n_bg,
                                   window=window)
            state, metrics = step_fn_nojit(state, cat, bg, k_step)
            return state, metrics

        keys = jax.random.split(key, n_inner)
        state, metrics = jax.lax.scan(body, state, keys, unroll=unroll)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    donate_argnums = (0,) if donate else ()
    jitted = jax.jit(superstep, donate_argnums=donate_argnums)

    def run(state, key):
        return jitted(state, key, store)

    # keep AOT inspection working (scripts/exp_hlo_dump.py, tests)
    run.lower = lambda state, key: jitted.lower(state, key, store)
    run.jitted = jitted
    return run
