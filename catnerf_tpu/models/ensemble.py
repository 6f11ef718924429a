"""Category-model ensembling: stack per-category parameter pytrees along a
leading axis and vmap the forward pass.

This replaces functorch `combine_state_for_ensemble` + the per-iteration
param copy-back workaround (ref: src/utils.py:24-28, train.py:88-89,196-201).
In JAX the stacked pytree *is* the optimizer state — there is nothing to copy
back, which removes that per-step overhead entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_params(params_list: list) -> dict:
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def unstack_params(stacked, n: int) -> list:
    """Inverse of stack_params."""
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)]


def slice_params(stacked, i: int):
    """Extract category i's parameter pytree from the stacked ensemble."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)
