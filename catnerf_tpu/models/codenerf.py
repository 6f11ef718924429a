"""CodeNeRF — the conditional category-level neural field.

Parity target: `CodeNeRF` (ref: src/model.py:22-84). A W-wide MLP over the
87-dim density embedding, conditioned on per-instance shape/texture latent
codes via additive (Linear+ReLU)-projected injections; at shape block j==1
the xyz embedding is re-concatenated through `cat_layer`. The sigma head is
scaled x10 (UniSurf logit scale); the color branch consumes the high-frequency
42-dim embedding tail and ends in a sigmoid.

Implemented as a pure function over a parameter pytree so that `jax.vmap`
over a stacked leading axis trains every category's model in one XLA program
(replacing functorch combine_state_for_ensemble, ref: src/utils.py:24-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from catnerf_tpu.models.embedding import EMB_SIZE1
from catnerf_tpu.models.layers import linear, linear_relu, linear_init


def init_params(key: jax.Array, *, emb_size1: int = EMB_SIZE1, emb_size2: int = 42,
                shape_blocks: int = 2, texture_blocks: int = 1, W: int = 32,
                latent_dim: int = 256) -> dict:
    """Parameter pytree mirroring the reference layer graph
    (ref: src/model.py:30-54)."""
    keys = iter(jax.random.split(key, 16 + 4 * (shape_blocks + texture_blocks)))
    p = {
        "encoding_xyz": linear_init(next(keys), emb_size1, W),
        "cat_layer": linear_init(next(keys), W + emb_size1, W),
        "cat_latent_layer": linear_init(next(keys), latent_dim, W),
        "encoding_shape": linear_init(next(keys), W, W),
        "sigma": linear_init(next(keys), W, 1),
        "encoding_viewdir": linear_init(next(keys), W + emb_size2, W),
        "rgb_0": linear_init(next(keys), W, W // 2),
        "rgb_1": linear_init(next(keys), W // 2, 3),
        "shape_latent_layers": [
            linear_init(next(keys), latent_dim, W) for _ in range(shape_blocks)
        ],
        "shape_layers": [
            linear_init(next(keys), W, W) for _ in range(shape_blocks)
        ],
        "texture_latent_layers": [
            linear_init(next(keys), latent_dim, W) for _ in range(texture_blocks)
        ],
        "texture_layers": [
            linear_init(next(keys), W, W) for _ in range(texture_blocks)
        ],
    }
    return p


def project_codes(params: dict, shape_latent: jnp.ndarray,
                  texture_latent: jnp.ndarray, *, do_cat: bool = True,
                  act_dtype: jnp.dtype | None = None):
    """Latent-code injections for rows of codes.

    All shape-side injections (and the cat-layer one) share the same input,
    so their projections run as ONE matmul and are sliced back out in
    `apply_with_injections` — identical math to per-layer linears, ~5x fewer
    ops on the latent path. Likewise for the texture side.

    The injections depend only on the instance code, not on the ray, so the
    train step calls this on the [n_obj, latent_dim] code *tables* and
    gathers the [*, W]-dim results per ray (project-then-gather) instead of
    gathering latent_dim-wide codes per ray and projecting per ray — 8x less
    gather traffic and ~(rays/instances)x fewer latent-matmul FLOPs, with a
    correspondingly cheaper scatter in the code-gradient backward.

    act_dtype: optional bf16 STORAGE of the injections (compute stays f32)
    — halves the per-ray gather traffic on them (cfg.bf16_activations).

    Returns (shape_inj [..., (shape_blocks+do_cat)*W],
             texture_inj [..., texture_blocks*W]).
    """
    lr = (linear_relu if act_dtype is None
          else lambda p, x: linear_relu(p, x).astype(act_dtype))
    zcat_params = [params["cat_latent_layer"]] if do_cat else []
    shape_inj = lr(
        {
            "w": jnp.concatenate(
                [p["w"] for p in params["shape_latent_layers"]]
                + [p["w"] for p in zcat_params], axis=-1),
            "b": jnp.concatenate(
                [p["b"] for p in params["shape_latent_layers"]]
                + [p["b"] for p in zcat_params], axis=-1),
        },
        shape_latent,
    )
    texture_inj = lr(
        {
            "w": jnp.concatenate(
                [p["w"] for p in params["texture_latent_layers"]], axis=-1),
            "b": jnp.concatenate(
                [p["b"] for p in params["texture_latent_layers"]], axis=-1),
        },
        texture_latent,
    )
    return shape_inj, texture_inj


def apply_with_injections(params: dict, emb: jnp.ndarray,
                          shape_inj: jnp.ndarray, texture_inj: jnp.ndarray,
                          *, emb_size1: int = EMB_SIZE1, do_cat: bool = True,
                          act_dtype: jnp.dtype | None = None):
    """Forward pass given precomputed latent injections (see project_codes).

    emb: [..., 129]; shape_inj/texture_inj broadcastable against emb's
    leading axes. act_dtype: optional bf16 STORAGE of the hidden activations
    (the matmuls truncate their inputs to bf16 anyway at TPU default
    precision; the sigma/rgb heads stay f32 — cfg.bf16_activations).
    Returns (sigma [..., 1], rgb [..., 3])."""
    lr = (linear_relu if act_dtype is None
          else lambda p, x: linear_relu(p, x).astype(act_dtype))
    x1 = emb[..., :emb_size1]
    x2 = emb[..., emb_size1:]
    shape_blocks = len(params["shape_layers"])
    texture_blocks = len(params["texture_layers"])
    W = params["shape_layers"][0]["w"].shape[-1]

    y = lr(params["encoding_xyz"], x1)
    for j in range(shape_blocks):
        if do_cat and j == 1:
            y = y + shape_inj[..., shape_blocks * W:].astype(y.dtype)
            y = jnp.concatenate(
                [y, jnp.broadcast_to(x1.astype(y.dtype),
                                     y.shape[:-1] + (x1.shape[-1],))], axis=-1
            )
            y = lr(params["cat_layer"], y)
        y = y + shape_inj[..., j * W:(j + 1) * W].astype(y.dtype)
        y = lr(params["shape_layers"][j], y)

    y = linear(params["encoding_shape"], y)
    sigma = linear(params["sigma"], y) * 10.0  # UniSurf logit scale

    if act_dtype is not None:
        y = y.astype(act_dtype)  # store the 129-wide concat input compactly
    y = jnp.concatenate(
        [y, jnp.broadcast_to(x2, y.shape[:-1] + (x2.shape[-1],)).astype(y.dtype)],
        axis=-1
    )
    y = lr(params["encoding_viewdir"], y)
    for j in range(texture_blocks):
        y = y + texture_inj[..., j * W:(j + 1) * W].astype(y.dtype)
        y = lr(params["texture_layers"][j], y)
    rgb = jax.nn.sigmoid(linear(params["rgb_1"], jax.nn.relu(linear(params["rgb_0"], y))))
    return sigma, rgb


def apply(params: dict, emb: jnp.ndarray, shape_latent: jnp.ndarray,
          texture_latent: jnp.ndarray, *, emb_size1: int = EMB_SIZE1,
          do_cat: bool = True):
    """Forward pass (ref: src/model.py:56-84).

    emb: [..., 129]; shape/texture_latent: [..., latent_dim] broadcastable
    against emb's leading axes. Returns (sigma [..., 1], rgb [..., 3]).
    """
    shape_inj, texture_inj = project_codes(
        params, shape_latent, texture_latent, do_cat=do_cat)
    return apply_with_injections(
        params, emb, shape_inj, texture_inj, emb_size1=emb_size1,
        do_cat=do_cat)
