"""One-transfer host->device batch staging for the parity path.

The reference stages each batch tensor to the device separately every
iteration (ref: train.py:98-134 — ~11 `.to(device)` moves per step). Over
this box's axon tunnel each host->device transfer pays a fixed ~0.25 ms
latency, so per-field staging costs ~2.8 ms/step — more than the step's
device time. Pack every field of the (CategoryBatch, BackgroundBatch) pair
into ONE flat float32 buffer on the host (int32 fields bitcast, not cast,
so values survive exactly), ship it in a single transfer, and unpack with
static slices + `bitcast_convert_type` inside the jitted step. The unpacked
tensors are value-identical to per-field `jnp.asarray` staging, so the
packed step is numerically identical to the plain one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch

# (name, trailing_shape, is_int) per field, in pack order. Leading dims are
# (n_cls, r) for category fields and (n_bg,) for background fields.
_CAT_FIELDS = (
    ("rgbs", (3,), False),
    ("states", (), True),
    ("depth", (), False),
    ("origins", (3,), False),
    ("dirs", (3,), False),
    ("obj_indices", (), True),
)
_BG_FIELDS = (
    ("rgbs", (3,), False),
    ("states", (), True),
    ("depth", (), False),
    ("origins", (3,), False),
    ("dirs", (3,), False),
)


class _Field(NamedTuple):
    name: str
    shape: tuple
    is_int: bool
    offset: int
    size: int


class PackSpec(NamedTuple):
    cat_fields: tuple
    bg_fields: tuple  # empty when the session has no background model
    total: int


def make_spec(n_cls: int, rays_per_cls: int, n_bg: int,
              with_background: bool) -> PackSpec:
    off = 0

    def build(defs, lead):
        nonlocal off
        out = []
        for name, trail, is_int in defs:
            shape = lead + trail
            size = int(np.prod(shape, dtype=np.int64))
            out.append(_Field(name, shape, is_int, off, size))
            off += size
        return tuple(out)

    cat = build(_CAT_FIELDS, (n_cls, rays_per_cls))
    bg = build(_BG_FIELDS, (n_bg,)) if with_background else ()
    return PackSpec(cat, bg, off)


def pack(spec: PackSpec, cat_np: dict, bg_np: dict | None) -> np.ndarray:
    """Host-side: flatten both batch dicts into one f32 buffer."""
    out = np.empty(spec.total, np.float32)

    def put(fields, src):
        for f in fields:
            a = src[f.name]
            if f.is_int:
                a = np.ascontiguousarray(a, np.int32).view(np.float32)
            else:
                a = np.asarray(a, np.float32)
            out[f.offset:f.offset + f.size] = a.reshape(-1)

    put(spec.cat_fields, cat_np)
    if spec.bg_fields:
        assert bg_np is not None, "spec was built with a background batch"
        put(spec.bg_fields, bg_np)
    return out


def unpack(spec: PackSpec, flat: jnp.ndarray):
    """In-graph: static slices + bitcasts back to (cat, bg) batches."""

    def take(fields):
        vals = {}
        for f in fields:
            x = flat[f.offset:f.offset + f.size].reshape(f.shape)
            vals[f.name] = (
                jax.lax.bitcast_convert_type(x, jnp.int32) if f.is_int else x
            )
        return vals

    cat = CategoryBatch(**take(spec.cat_fields))
    bg = BackgroundBatch(**take(spec.bg_fields)) if spec.bg_fields else None
    return cat, bg
