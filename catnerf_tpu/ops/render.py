"""Differentiable rendering math: occupancy -> termination -> composited
values, plus masked/variance-weighted loss reduction.

Parity targets (ref: src/render_rays.py). Everything here is a pure function
of arrays, shape-polymorphic over leading batch axes, and safe under
jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def occupancy_activation(alpha: jnp.ndarray) -> jnp.ndarray:
    """UniSurf-style occupancy: sigmoid of the raw head output
    (ref: src/render_rays.py:3-7)."""
    return jax.nn.sigmoid(alpha)


def occupancy_to_termination(occupancy: jnp.ndarray) -> jnp.ndarray:
    """Per-sample termination probability along each ray
    (ref: src/render_rays.py:25-44).

    occupancy: [..., n_bins]. term[i] = occ[i] * prod_{j<i}(1 - occ[j] + 1e-10).
    Works for any leading batch shape (the reference needs a separate
    `is_batch` branch; broadcasting makes that unnecessary here).
    """
    free = 1.0 - occupancy + 1e-10
    ones = jnp.ones_like(occupancy[..., :1])
    shifted = jnp.concatenate([ones, free[..., :-1]], axis=-1)
    return occupancy * jnp.cumprod(shifted, axis=-1)


def render(termination: jnp.ndarray, vals: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Composite per-sample values with termination weights
    (ref: src/render_rays.py:46-50)."""
    return jnp.sum(termination * vals, axis=axis)


def render_loss(rendered: jnp.ndarray, gt: jnp.ndarray, loss: str = "L1",
                normalise: bool = False) -> jnp.ndarray:
    """Elementwise render loss (ref: src/render_rays.py:52-64)."""
    residual = rendered - gt
    if loss == "L2":
        loss_mat = residual**2
    elif loss == "L1":
        loss_mat = jnp.abs(residual)
    else:
        raise NotImplementedError(f"loss type {loss} not implemented")
    if normalise:
        loss_mat = loss_mat / gt
    return loss_mat


def reduce_batch_loss(loss_mat: jnp.ndarray, var: jnp.ndarray | None = None,
                      mask: jnp.ndarray | None = None,
                      loss_type: str = "L1") -> jnp.ndarray:
    """Masked, optionally information-weighted mean over the ray axis
    (ref: src/render_rays.py:66-95).

    loss_mat, mask: [n_models, n_rays]. Returns per-model loss [n_models].

    Reference quirk preserved: if ANY model in the batch has an all-zero mask
    the whole batch returns zero loss (the reference early-returns zeros).
    The reference's loss-explosion `exit(-1)` guard is replaced by a finite
    computation; explosion detection belongs to the driver's metrics, not a
    process kill inside a jitted function.
    """
    if var is not None:
        eps = 1e-4
        if loss_type == "L2":
            information = 1.0 / (var + eps)
        else:
            information = 1.0 / (jnp.sqrt(var) + eps)
        loss_weighted = loss_mat * information
    else:
        loss_weighted = loss_mat

    if mask is None:
        return jnp.mean(loss_weighted, axis=-1)

    mask_f = mask.astype(loss_mat.dtype)
    mask_num = jnp.sum(mask_f, axis=-1)
    per_model = jnp.sum(loss_weighted * mask_f, axis=-1) / (mask_num + 1e-10)
    any_empty = jnp.any(mask_num == 0)
    return jnp.where(any_empty, jnp.zeros_like(per_model), per_model)


def make_3d_grid(occ_range=(-1.0, 1.0), dim: int = 256,
                 transform: jnp.ndarray | None = None,
                 scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Regular (dim, dim, dim, 3) grid in `occ_range`^3, optionally scaled
    per-axis and rigidly transformed (ref: src/render_rays.py:97-121)."""
    t = jnp.linspace(occ_range[0], occ_range[1], dim)
    gx, gy, gz = jnp.meshgrid(t, t, t, indexing="ij")
    grid = jnp.stack([gx, gy, gz], axis=-1)
    if scale is not None:
        grid = grid * scale
    if transform is not None:
        grid = jnp.einsum("ij,xyzj->xyzi", transform[:3, :3], grid) + transform[:3, 3]
    return grid
