"""Minimal functional linear layers with torch-compatible initialisation.

The reference initialises Linear weights with xavier_normal_ (applied via
model.init_weights, ref: src/model.py:4-6) and leaves biases at the torch
default uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)). Matching the init
distributions keeps training dynamics statistically comparable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, in_f: int, out_f: int,
                weight_init: str = "xavier_normal") -> dict:
    kw, kb = jax.random.split(key)
    if weight_init == "xavier_normal":
        std = math.sqrt(2.0 / (in_f + out_f))
        w = jax.random.normal(kw, (in_f, out_f)) * std
    elif weight_init == "torch_default":
        bound = 1.0 / math.sqrt(in_f)
        w = jax.random.uniform(kw, (in_f, out_f), minval=-bound, maxval=bound)
    else:
        raise ValueError(weight_init)
    b_bound = 1.0 / math.sqrt(in_f)
    b = jax.random.uniform(kb, (out_f,), minval=-b_bound, maxval=b_bound)
    return {"w": w, "b": b}


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def linear_relu(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(linear(params, x))
