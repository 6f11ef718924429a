"""The jitted training step.

One XLA program per iteration replaces the reference hot loop
(ref: train.py:98-201): in-jit 3D point sampling, vmapped PE + CodeNeRF over
the category axis, background forward, loss assembly, code regularisation,
and the AdamW update. The functorch param copy-back (ref: train.py:196-201)
has no equivalent here — stacked params are the single source of truth.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from catnerf_tpu.config import Config
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.ops import losses, sampling
from catnerf_tpu.train.state import TrainState, make_optimizer


class CategoryBatch(NamedTuple):
    """Fixed-shape per-step ray batch for all object categories.

    Shapes ([c]=n_cls, [r]=rays/category/step):
      rgbs [c, r, 3] float32 in [0, 1]; states [c, r] int32 pixel states;
      depth [c, r] metric depth; origins/dirs [c, r, 3] canonical-object-frame
      rays (precomputed from T_CO at buffer build — the reference recomputes
      inv(T_CO) per step, src/scene_cateogries.py:24-35, but T_obj is fixed
      during training so we hoist it); obj_indices [c, r] code-slot indices.
    """

    rgbs: jnp.ndarray
    states: jnp.ndarray
    depth: jnp.ndarray
    origins: jnp.ndarray
    dirs: jnp.ndarray
    obj_indices: jnp.ndarray


class BackgroundBatch(NamedTuple):
    """Per-step background ray batch (world-frame rays). Shapes [r, ...]."""

    rgbs: jnp.ndarray
    states: jnp.ndarray
    depth: jnp.ndarray
    origins: jnp.ndarray
    dirs: jnp.ndarray


class StepMetrics(NamedTuple):
    total: jnp.ndarray
    cat_depth: jnp.ndarray    # [n_cls]
    cat_color: jnp.ndarray    # [n_cls]
    cat_opacity: jnp.ndarray  # [n_cls]
    cat_psnr: jnp.ndarray     # [n_cls]
    reg_shape: jnp.ndarray    # [n_cls]
    reg_texture: jnp.ndarray  # [n_cls]
    bg_depth: jnp.ndarray
    bg_color: jnp.ndarray
    bg_opacity: jnp.ndarray
    bg_psnr: jnp.ndarray


def _fused_eligible(cfg: Config) -> bool:
    """The Pallas kernels are specialised for the reference's shipped
    architecture (every config in configs/ — SURVEY.md §6)."""
    nh = cfg.net_hyperparams
    return (cfg.use_fused_kernels and nh.shape_blocks == 2
            and nh.texture_blocks == 1 and nh.W == 32
            and cfg.n_unidir_funcs == 5)


def _gather_injections(inj_s_inst: jnp.ndarray, inj_t_inst: jnp.ndarray,
                       obj_indices: jnp.ndarray):
    """Per-ray injection lookup [c, max_obj, w] -> [c, r, w].

    One-hot matmul instead of jnp.take: the gather's transpose is an XLA
    scatter-add over [c*r] rows (43 us/step, traced); as a matmul the
    backward rides the MXU (~5x cheaper). Exactly one 1.0 per row and
    HIGHEST precision (no bf16 truncation of f32 operands), so forward
    values are bit-identical to the gather (obj_idx is always in-range:
    data/scene.py:211-214). Gradients accumulate in f32 inside the matmul
    (vs element-dtype scatter-adds) — slightly MORE accurate in bf16 mode.
    """
    onehot = jax.nn.one_hot(obj_indices, inj_s_inst.shape[1],
                            dtype=inj_s_inst.dtype)  # [c, r, max_obj]
    take = partial(jnp.einsum, "cro,cow->crw", onehot,
                   precision=jax.lax.Precision.HIGHEST)
    return take(inj_s_inst), take(inj_t_inst)


def category_forward(params: dict, batch: CategoryBatch, key: jax.Array,
                     cfg: Config):
    """Sample 3D points and run the vmapped category ensemble.

    Returns (alpha [c,r,b], color [c,r,b,3], ray_samples)."""
    n_cls = batch.rgbs.shape[0]
    keys = jax.random.split(key, n_cls)

    sample_fn = partial(
        sampling.sample_3d_points,
        n_bins_cam2surface=cfg.n_bins_cam2surface, n_bins=cfg.n_bins,
        min_depth=cfg.min_depth, surface_eps=cfg.surface_eps,
        stop_eps=cfg.stop_eps,
    )
    rays = jax.vmap(sample_fn)(
        keys, batch.rgbs, batch.states, batch.depth, batch.origins, batch.dirs
    )

    # bf16 STORAGE of activations/embeddings/injections: the step is
    # HBM-traffic-bound and the consuming matmuls truncate to bf16 anyway
    # (measured 7.8% step cut, scripts/exp_bf16_store.py). Compute, params,
    # heads, render math and losses stay f32.
    act_dtype = jnp.bfloat16 if cfg.bf16_activations else None

    # Project-then-gather latent injections (ref: train.py:136-137 gathers
    # latent_dim-wide codes per ray; injections depend only on the instance,
    # so project the [max_obj, latent] code tables once and gather the
    # W-dim results per ray instead — see codenerf.project_codes).
    inj_s_inst, inj_t_inst = jax.vmap(
        partial(codenerf.project_codes, do_cat=True, act_dtype=act_dtype)
    )(params["cat_fc"], params["codes"]["shape"], params["codes"]["texture"])
    inj_s, inj_t = _gather_injections(inj_s_inst, inj_t_inst,
                                      batch.obj_indices)

    if _fused_eligible(cfg):
        fc = params["cat_fc"]
        C, R, Bt, _ = rays.input_pcs.shape
        N = R * Bt
        W = cfg.net_hyperparams.W
        # Injection layout (project_codes): [shape0, shape1, cat | tex0].
        zs0, zs1 = inj_s[..., :W], inj_s[..., W:2 * W]
        zc = inj_s[..., 2 * W:]
        zt0 = inj_t[..., :W]

        def per_point(z):
            return jnp.broadcast_to(
                z[:, :, None, :], (C, R, Bt, z.shape[-1])
            ).reshape(C, N, z.shape[-1])

        from catnerf_tpu.experimental import fused_field

        pts = rays.input_pcs.reshape(C, N, 3)
        sigma, rgb = fused_field.codenerf_fused_apply(
            fc, params["cat_pe"], pts,
            per_point(zs0), per_point(zc), per_point(zs1), per_point(zt0),
            scale=cfg.obj_scale,
        )
        return sigma.reshape(C, R, Bt), rgb.reshape(C, R, Bt, 3), rays

    pe_fn = partial(embedding.apply, scale=cfg.obj_scale,
                    max_deg=cfg.n_unidir_funcs, act_dtype=act_dtype)
    emb = jax.vmap(pe_fn)(params["cat_pe"], rays.input_pcs)
    alpha, color = jax.vmap(
        partial(codenerf.apply_with_injections, act_dtype=act_dtype)
    )(params["cat_fc"], emb, inj_s[:, :, None, :], inj_t[:, :, None, :])
    return alpha[..., 0], color, rays


def background_forward(params: dict, batch: BackgroundBatch, key: jax.Array,
                       cfg: Config):
    """Background sampling + OccupancyMap forward (ref: train.py:172-178)."""
    rays = sampling.sample_3d_points(
        key, batch.rgbs, batch.states, batch.depth, batch.origins, batch.dirs,
        n_bins_cam2surface=cfg.n_bins_cam2surface_bg, n_bins=cfg.n_bins,
        min_depth=cfg.min_depth, surface_eps=cfg.surface_eps,
        stop_eps=cfg.stop_eps,
    )
    fc = params["bg_fc"]
    if _fused_eligible(cfg) and len(fc["mid1"]) == 1 and len(fc["mid2"]) == 1:
        from catnerf_tpu.experimental import fused_field

        R, Bt, _ = rays.input_pcs.shape
        alpha, color = fused_field.occupancy_fused_apply(
            fc, params["bg_pe"], rays.input_pcs.reshape(R * Bt, 3),
            scale=cfg.bg_scale,
        )
        return alpha.reshape(R, Bt), color.reshape(R, Bt, 3), rays
    act_dtype = jnp.bfloat16 if cfg.bf16_activations else None
    emb = embedding.apply(params["bg_pe"], rays.input_pcs, scale=cfg.bg_scale,
                          max_deg=cfg.n_unidir_funcs, act_dtype=act_dtype)
    alpha, color = occupancy.apply(params["bg_fc"], emb, act_dtype=act_dtype)
    return alpha[..., 0], color, rays


def make_train_step(cfg: Config, obj_mask: jnp.ndarray,
                    reg_scaling: float = 5e-4, with_background: bool = True,
                    donate: bool = True, jit: bool = True):
    """Build the jitted train step.

    obj_mask: (n_cls, max_n_obj) validity mask for code regularisation.
    reg_scaling matches the reference constant (ref: train.py:165).
    """
    tx = make_optimizer(cfg)

    def loss_fn(params, cat_batch: CategoryBatch,
                bg_batch: BackgroundBatch | None, key: jax.Array):
        k_cat, k_bg = jax.random.split(key)
        alpha, color, rays = category_forward(params, cat_batch, k_cat, cfg)
        cat_loss = losses.step_batch_loss(
            alpha, color, rays.gt_depth, rays.gt_rgb, rays.obj_labels,
            rays.valid_depth_mask, rays.z_vals,
            color_scaling=cfg.color_scaling, opacity_scaling=cfg.opacity_scaling,
        )
        reg_s, reg_t = losses.code_reg_loss(
            params["codes"]["shape"], params["codes"]["texture"], obj_mask
        )
        total = cat_loss.total + reg_scaling * (reg_s + reg_t).sum()

        if with_background and bg_batch is not None:
            bg_alpha, bg_color, bg_rays = background_forward(
                params, bg_batch, k_bg, cfg
            )
            bg_loss = losses.step_batch_loss(
                bg_alpha[None], bg_color[None], bg_rays.gt_depth[None],
                bg_rays.gt_rgb[None], bg_rays.obj_labels[None],
                bg_rays.valid_depth_mask[None], bg_rays.z_vals[None],
                color_scaling=cfg.color_scaling,
                opacity_scaling=cfg.opacity_scaling,
            )
            total = total + bg_loss.total
        else:
            z = jnp.zeros((1,))
            bg_loss = losses.LossBreakdown(jnp.zeros(()), z, z, z, z)

        metrics = StepMetrics(
            total=total,
            cat_depth=cat_loss.depth, cat_color=cat_loss.color,
            cat_opacity=cat_loss.opacity,
            cat_psnr=losses.psnr_from_l1(cat_loss.psnr_color),
            reg_shape=reg_s, reg_texture=reg_t,
            bg_depth=bg_loss.depth[0], bg_color=bg_loss.color[0],
            bg_opacity=bg_loss.opacity[0],
            bg_psnr=losses.psnr_from_l1(bg_loss.psnr_color[0]),
        )
        return total, metrics

    def train_step(state: TrainState, cat_batch: CategoryBatch,
                   bg_batch: BackgroundBatch | None, key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cat_batch, bg_batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, metrics

    if not jit:
        return train_step
    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)
