"""Training losses.

Parity target: `step_batch_loss` / `step_batch_loss_reg`
(ref: src/loss.py:5-74). Depth L1 is information-weighted by the detached
rendered-depth variance; color L1 is channel-summed and masked to this-object
rays; opacity L1 supervises the termination sum against the object mask on
all non-unknown rays. Per-category code-norm regularisation applies only to
categories with more than one instance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from catnerf_tpu.ops import render as render_ops
from catnerf_tpu.ops.sampling import OTHER_OBJ, UNKNOWN_OBJ


class LossBreakdown(NamedTuple):
    total: jnp.ndarray        # scalar
    depth: jnp.ndarray        # [n_models]
    color: jnp.ndarray        # [n_models]
    opacity: jnp.ndarray      # [n_models]
    psnr_color: jnp.ndarray   # [n_models] raw color loss (PSNR proxy input)


def step_batch_loss(alpha: jnp.ndarray, color: jnp.ndarray, gt_depth: jnp.ndarray,
                    gt_color: jnp.ndarray, sem_labels: jnp.ndarray,
                    mask_depth: jnp.ndarray, z_vals: jnp.ndarray,
                    color_scaling: float = 5.0,
                    opacity_scaling: float = 10.0) -> LossBreakdown:
    """Batched render losses (ref: src/loss.py:18-74).

    Shapes ([m]=n_models, [r]=rays, [b]=bins):
      alpha [m, r, b] (raw logits, pre-sigmoid), color [m, r, b, 3],
      gt_depth [m, r], gt_color [m, r, 3] in [0, 1],
      sem_labels [m, r] pixel states, mask_depth [m, r] bool, z_vals [m, r, b].
    """
    # NB: the reference defines mask_obj as `sem_labels != 0`, which includes
    # *unknown* (state 2) pixels, not just this-object pixels — preserved
    # verbatim for parity (ref: src/loss.py:33-34).
    mask_obj = sem_labels != OTHER_OBJ
    mask_sem = sem_labels != UNKNOWN_OBJ

    occupancy = render_ops.occupancy_activation(alpha)
    termination = render_ops.occupancy_to_termination(occupancy)

    render_depth = render_ops.render(termination, z_vals)
    diff_sq = (z_vals - render_depth[..., None]) ** 2
    var = jax.lax.stop_gradient(render_ops.render(termination, diff_sq))
    render_color = render_ops.render(termination[..., None], color, axis=-2)
    render_opacity = jnp.sum(termination, axis=-1)

    # Depth: L1 on valid-depth this-object rays, 1/sqrt(var) weighted.
    loss_depth_raw = render_ops.render_loss(render_depth, gt_depth, "L1")
    m_depth = mask_depth & mask_obj
    loss_depth = render_ops.reduce_batch_loss(
        loss_depth_raw * m_depth, var=var, mask=m_depth)

    # Color: channel-summed L1 on this-object rays.
    loss_col_raw = render_ops.render_loss(render_color, gt_color, "L1").sum(-1)
    loss_col = render_ops.reduce_batch_loss(
        loss_col_raw * mask_obj, var=None, mask=mask_obj)

    # Opacity: |sum(term) - 1{this obj}| on all non-unknown rays.
    loss_opacity_raw = render_ops.render_loss(
        render_opacity, mask_obj.astype(render_opacity.dtype), "L1")
    loss_opacity = render_ops.reduce_batch_loss(
        loss_opacity_raw * mask_sem, var=None, mask=mask_sem)

    l_batch = loss_depth + loss_col * color_scaling + loss_opacity * opacity_scaling
    return LossBreakdown(
        total=l_batch.sum(),
        depth=loss_depth,
        color=loss_col,
        opacity=loss_opacity,
        psnr_color=loss_col,
    )


def code_reg_loss(shape_codes: jnp.ndarray, texture_codes: jnp.ndarray,
                  obj_mask: jnp.ndarray):
    """Per-category code L2-norm regularisation (ref: src/loss.py:5-15).

    shape/texture_codes: (n_cls, max_n_obj, D); obj_mask: (n_cls, max_n_obj)
    bool validity. Categories with <= 1 real instance contribute zero
    (ref: src/loss.py:12).
    """
    n_real = jnp.sum(obj_mask, axis=-1)  # (n_cls,)
    multi = (n_real > 1).astype(shape_codes.dtype)

    def norm_sum(codes):
        norms = jnp.linalg.norm(codes, axis=-1)  # (n_cls, max_n_obj)
        return jnp.sum(norms * obj_mask, axis=-1) * multi

    return norm_sum(shape_codes), norm_sum(texture_codes)


def psnr_from_l1(loss_col: jnp.ndarray) -> jnp.ndarray:
    """Monotone PSNR proxy: -10*log10(L1 color loss) (ref: src/loss.py:94-102;
    the reference computes this from L1, not MSE — preserved for parity)."""
    return -10.0 * jnp.log(loss_col) / jnp.log(10.0)
