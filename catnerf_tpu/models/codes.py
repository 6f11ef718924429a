"""Per-instance latent codes.

Parity target: `Trainer.load_codes` (ref: src/trainer.py:52-60):
shape/texture codes are (n_obj, latent_dim) embeddings initialised
N(0, 1) / sqrt(latent_dim / 2).

Here the category axis is stacked and padded to `max_n_obj` so all categories
share one fixed-shape (n_cls, max_n_obj, latent_dim) array that vmaps/shards
cleanly; a validity mask handles ragged instance counts.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_codes(key: jax.Array, n_obj: int, latent_dim: int) -> jnp.ndarray:
    return jax.random.normal(key, (n_obj, latent_dim)) / math.sqrt(latent_dim / 2.0)


def init_stacked_codes(key: jax.Array, n_objs: list[int], latent_dim: int,
                       max_n_obj: int | None = None) -> dict:
    """Stacked shape+texture codes for all categories.

    Returns {'shape': (n_cls, max_n_obj, D), 'texture': same} — padded slots
    are initialised like real ones (they receive no gradient because no ray
    indexes them and the reg loss masks them out).
    """
    n_cls = len(n_objs)
    max_n = max_n_obj if max_n_obj is not None else max(n_objs)
    ks, kt = jax.random.split(key)
    return {
        "shape": init_codes(ks, n_cls * max_n, latent_dim).reshape(n_cls, max_n, latent_dim),
        "texture": init_codes(kt, n_cls * max_n, latent_dim).reshape(n_cls, max_n, latent_dim),
    }


def obj_validity_mask(n_objs: list[int], max_n_obj: int | None = None) -> jnp.ndarray:
    """(n_cls, max_n_obj) bool mask of real (non-padding) instance slots."""
    n_cls = len(n_objs)
    max_n = max_n_obj if max_n_obj is not None else max(n_objs)
    mask = jnp.arange(max_n)[None, :] < jnp.asarray(n_objs)[:, None]
    return mask.reshape(n_cls, max_n)


def lookup(codes: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-ray codes: codes (n_obj, D), indices (n_rays,) -> (n_rays, D)
    (ref: train.py:136-137 does this via nn.Embedding call)."""
    return jnp.take(codes, indices, axis=0)
