"""OccupancyMap — the unconditional iMAP/vMAP-style field.

Parity target: `OccupancyMap` (ref: src/model.py:86-155). Used for the
background model (hidden=128) and for loading pretrained per-object vMAP
fields during registration template scoring (hidden=32,
ref: src/category_registration.py:83-92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from catnerf_tpu.models.embedding import EMB_SIZE1
from catnerf_tpu.models.layers import linear, linear_relu, linear_init


def init_params(key: jax.Array, *, emb_size1: int = EMB_SIZE1, emb_size2: int = 42,
                hidden_size: int = 128, hidden_layers_block: int = 1,
                do_color: bool = True) -> dict:
    keys = iter(jax.random.split(key, 6 + 2 * hidden_layers_block))
    p = {
        "in_layer": linear_init(next(keys), emb_size1, hidden_size),
        "mid1": [
            linear_init(next(keys), hidden_size, hidden_size)
            for _ in range(hidden_layers_block)
        ],
        "cat_layer": linear_init(next(keys), hidden_size + emb_size1, hidden_size),
        "mid2": [
            linear_init(next(keys), hidden_size, hidden_size)
            for _ in range(hidden_layers_block)
        ],
        "out_alpha": linear_init(next(keys), hidden_size, 1),
    }
    if do_color:
        p["color_linear"] = linear_init(
            next(keys), emb_size2 + hidden_size, hidden_size
        )
        p["out_color"] = linear_init(next(keys), hidden_size, 3)
    return p


def apply(params: dict, emb: jnp.ndarray, *, emb_size1: int = EMB_SIZE1,
          do_alpha: bool = True, do_color: bool = True, do_cat: bool = True,
          act_dtype: jnp.dtype | None = None):
    """Forward pass (ref: src/model.py:124-155).

    emb: [..., 129]. act_dtype: optional bf16 STORAGE of hidden activations
    (cfg.bf16_activations; alpha/color heads stay f32). Returns
    (alpha [..., 1] | None, color [..., 3] | None); alpha carries the x10
    UniSurf logit scale.
    """
    lr = (linear_relu if act_dtype is None
          else lambda p, x: linear_relu(p, x).astype(act_dtype))
    x1 = emb[..., :emb_size1]
    x2 = emb[..., emb_size1:]

    fc = lr(params["in_layer"], x1)
    for lp in params["mid1"]:
        fc = lr(lp, fc)
    if do_cat:
        fc = lr(params["cat_layer"],
                jnp.concatenate([fc, x1.astype(fc.dtype)], axis=-1))
    for lp in params["mid2"]:
        fc = lr(lp, fc)

    alpha = None
    if do_alpha:
        alpha = linear(params["out_alpha"], fc) * 10.0

    color = None
    if do_color and "out_color" in params:
        h = lr(params["color_linear"],
               jnp.concatenate([fc, x2.astype(fc.dtype)], axis=-1))
        color = jax.nn.sigmoid(linear(params["out_color"], h))
    return alpha, color
