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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.data.scene import CategoryScene
from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch


class DeviceRayStore(NamedTuple):
    """Stacked per-category buffers, padded to the max category length.

    Arrays: [n_cls, max_len, ...]; `lengths`: [n_cls] valid ray counts.
    Background (optional): flat [n_bg, ...] arrays + scalar length.
    """

    origins: jnp.ndarray
    dirs: jnp.ndarray
    rgbs: jnp.ndarray       # float32 in [0, 1]
    states: jnp.ndarray     # int32
    depth: jnp.ndarray
    obj_idx: jnp.ndarray
    lengths: jnp.ndarray

    bg_origins: jnp.ndarray | None = None
    bg_dirs: jnp.ndarray | None = None
    bg_rgbs: jnp.ndarray | None = None
    bg_states: jnp.ndarray | None = None
    bg_depth: jnp.ndarray | None = None
    bg_length: jnp.ndarray | None = None


def build_device_store(categories: list[CategoryScene],
                       background: CategoryScene | None) -> DeviceRayStore:
    def stack(key, dtype, extra=()):
        max_len = max(c.buffer.n for c in categories)
        out = np.zeros((len(categories), max_len) + extra, dtype)
        for i, c in enumerate(categories):
            a = c.buffer.arrays[key]
            out[i, : len(a)] = a
        return jnp.asarray(out)

    kwargs = dict(
        origins=stack("origins", np.float32, (3,)),
        dirs=stack("dirs", np.float32, (3,)),
        rgbs=stack("rgb", np.float32, (3,)) / 255.0,
        states=stack("state", np.int32),
        depth=stack("depth", np.float32),
        obj_idx=stack("obj_idx", np.int32),
        lengths=jnp.asarray([c.buffer.n for c in categories], jnp.int32),
    )
    if background is not None:
        b = background.buffer.arrays
        kwargs.update(
            bg_origins=jnp.asarray(b["origins"]),
            bg_dirs=jnp.asarray(b["dirs"]),
            bg_rgbs=jnp.asarray(b["rgb"], jnp.float32) / 255.0,
            bg_states=jnp.asarray(b["state"], jnp.int32),
            bg_depth=jnp.asarray(b["depth"]),
            bg_length=jnp.asarray(b["depth"].shape[0], jnp.int32),
        )
    return DeviceRayStore(**kwargs)


def sample_batch(store: DeviceRayStore, key: jax.Array, n_per_cls: int,
                 n_bg: int):
    """Draw (CategoryBatch, BackgroundBatch|None) fully on device."""
    n_cls = store.lengths.shape[0]
    k_cat, k_bg = jax.random.split(key)

    # One fused randint for every category (maxval broadcasts per row) — far
    # fewer RNG/gather ops than a vmap of per-category draws.
    idx = jax.random.randint(k_cat, (n_cls, n_per_cls), 0,
                             store.lengths[:, None])

    def gather(a):
        ix = idx[..., None] if a.ndim == 3 else idx
        return jnp.take_along_axis(a, ix, axis=1)

    origins, dirs, rgbs, states, depth, obj_idx = (
        gather(store.origins), gather(store.dirs), gather(store.rgbs),
        gather(store.states), gather(store.depth), gather(store.obj_idx))
    cat = CategoryBatch(rgbs=rgbs, states=states, depth=depth,
                        origins=origins, dirs=dirs, obj_indices=obj_idx)

    bg = None
    if store.bg_origins is not None:
        idx = jax.random.randint(k_bg, (n_bg,), 0, store.bg_length)
        bg = BackgroundBatch(
            rgbs=jnp.take(store.bg_rgbs, idx, axis=0),
            states=jnp.take(store.bg_states, idx, axis=0),
            depth=jnp.take(store.bg_depth, idx, axis=0),
            origins=jnp.take(store.bg_origins, idx, axis=0),
            dirs=jnp.take(store.bg_dirs, idx, axis=0),
        )
    return cat, bg


def make_superstep(step_fn_nojit, store: DeviceRayStore, n_per_cls: int,
                   n_bg: int, n_inner: int, donate: bool = True):
    """One dispatch = `n_inner` optimizer steps via lax.scan, each drawing a
    fresh on-device batch. Returns jitted (state, key) -> (state, metrics of
    the last inner step)."""

    def superstep(state, key):
        def body(state, k):
            cat, bg = sample_batch(store, k, n_per_cls, n_bg)
            state, metrics = step_fn_nojit(state, cat, bg, k)
            return state, metrics

        keys = jax.random.split(key, n_inner)
        state, metrics = jax.lax.scan(body, state, keys)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    donate_argnums = (0,) if donate else ()
    return jax.jit(superstep, donate_argnums=donate_argnums)
